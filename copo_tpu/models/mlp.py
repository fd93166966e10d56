"""Policy/value networks as plain pytrees of params + pure functions.

Parity target (SURVEY.md §2.3 item 11): MLP 256-256 tanh with separate policy
and value towers, normc init (1.0 hidden, 0.01 output), DiagGaussian head
emitting [mean, log_std] (4 outputs for the 2-dim action; confirmed by the
reference npz `fc_out` shape (256, 4)). CoPO adds `nei` and `global` value
heads plus the LCF parameters [raw_mean, log_std] living beside the nets
(`torch_copo/algo_copo.py:120-124`).

No flax Module machinery: a dict-of-lists pytree keeps the param layout
npz-interchangeable with the reference checkpoints and minimizes trace time.
All matmuls batch over arbitrary leading dims — on TPU they map to single
MXU calls over (T*B*N, hidden).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

HIDDENS = (256, 256)


def normc_init(key, shape, std=1.0, dtype=jnp.float32):
    """RLlib's normc initializer: unit-normalize columns of a normal sample."""
    w = jax.random.normal(key, shape, dtype)
    w = w / jnp.sqrt(jnp.sum(jnp.square(w), axis=0, keepdims=True))
    return w * std


def init_mlp(key, sizes, out_std=0.01):
    """[(W, b)] stack; hidden layers normc(1.0), final layer normc(out_std)."""
    layers = []
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (d_in, d_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        std = out_std if i == len(sizes) - 2 else 1.0
        layers.append(
            {"w": normc_init(keys[i], (d_in, d_out), std), "b": jnp.zeros((d_out,))}
        )
    return layers


def mlp_forward(layers, x, activation=jnp.tanh):
    """Apply the stack; activation on all but the last layer."""
    for i, lyr in enumerate(layers):
        x = x @ lyr["w"] + lyr["b"]
        if i < len(layers) - 1:
            x = activation(x)
    return x


def init_model(key, obs_dim, act_dim=2, *, cc_obs_dim=None, num_value_heads=1,
               hiddens=HIDDENS, with_lcf=False, initial_lcf_std=0.1):
    """Build the full model pytree.

    num_value_heads: 1 = IPPO/CCPPO {vf}; 3 = CoPO {vf, nei_vf, global_vf}
    cc_obs_dim: input dim of the value towers (centralized-critic obs);
      defaults to obs_dim (fuse_mode "none", `torch_copo/algo_ccppo.py:63`).
    with_lcf: add lcf_params = [raw_mean, log(initial_std)].
    """
    cc_obs_dim = obs_dim if cc_obs_dim is None else cc_obs_dim
    k_pi, k_v, k_nei, k_glb = jax.random.split(key, 4)
    params = {
        "policy": init_mlp(k_pi, (obs_dim, *hiddens, 2 * act_dim)),
        "vf": init_mlp(k_v, (cc_obs_dim, *hiddens, 1)),
    }
    if num_value_heads == 3:
        params["nei_vf"] = init_mlp(k_nei, (cc_obs_dim, *hiddens, 1))
        params["global_vf"] = init_mlp(k_glb, (cc_obs_dim, *hiddens, 1))
    if with_lcf:
        params["lcf"] = jnp.array([0.0, np.log(initial_lcf_std)], dtype=jnp.float32)
    return params


def policy_logits(params, obs):
    """(mean, log_std) of the DiagGaussian action distribution."""
    out = mlp_forward(params["policy"], obs)
    mean, log_std = jnp.split(out, 2, axis=-1)
    return mean, log_std


def value_head(params, head, cc_obs):
    """Scalar value prediction from the named head ('vf'|'nei_vf'|'global_vf')."""
    return mlp_forward(params[head], cc_obs)[..., 0]


def lcf_mean(params):
    """tanh-squashed LCF mean in (-1, 1) (`algo_copo.py:170-173`)."""
    return jnp.clip(jnp.tanh(params["lcf"][0]), -1 + 1e-6, 1 - 1e-6)


def lcf_std(params):
    """exp of clamped raw log-std (`algo_copo.py:175-179`)."""
    return jnp.exp(jnp.clip(params["lcf"][1], -20.0, 2.0))


class DiagGaussian:
    """Stateless diagonal-Gaussian action distribution ops."""

    @staticmethod
    def sample(key, mean, log_std):
        return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)

    @staticmethod
    def logp(mean, log_std, x):
        z = (x - mean) / jnp.exp(log_std)
        return -0.5 * jnp.sum(
            jnp.square(z) + 2.0 * log_std + jnp.log(2.0 * jnp.pi), axis=-1
        )

    @staticmethod
    def entropy(log_std):
        return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)

    @staticmethod
    def kl(mean0, log_std0, mean1, log_std1):
        """KL(p0 || p1), summed over action dims (RLlib DiagGaussian.kl)."""
        var0, var1 = jnp.exp(2 * log_std0), jnp.exp(2 * log_std1)
        return jnp.sum(
            log_std1 - log_std0
            + (var0 + jnp.square(mean0 - mean1)) / (2.0 * var1)
            - 0.5,
            axis=-1,
        )
