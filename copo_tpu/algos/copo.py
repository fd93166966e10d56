"""CoPO: LCF advantage blending + the bi-level LCF meta-gradient.

Parity (SURVEY.md §2.3 items 6, 8; `torch_copo/algo_copo.py:228-309`,
TF `algo_copo/grad.py:21-144`):

  blending:  coordinated_adv = cos(step_lcf*pi/2)*adv + sin(step_lcf*pi/2)*nei_adv
             using the per-step LCF the env actually sampled; batch mean/std
             of the raw blend are saved for the meta-update, then the blend is
             standardized (`algo_copo.py:539-551`).

  meta-gradient (per minibatch):
    L1 = -mean(min(A*ratio, A*clip(ratio)))  with A = standardized global adv,
         grad wrt the NEW (post-SGD) policy params
    L2 = mean(logp_old(actions)) wrt the OLD (target-copy) policy params
    grad_value = sum of elementwise dot products of the two flat grads
    L3 = mean((cos(phi)*adv + sin(phi)*nei_adv - raw_mean)/raw_std)
         with phi = (lcf_mean + lcf_std*eps)*pi/2 sampled via the
         reparameterization trick (rsample, `algo_copo.py:155-161`)
    loss = grad_value * L3; one Adam(lcf_lr) step on lcf params.

Only the policy tower enters L1/L2: in the reference the value-net grads come
back None from autograd and are filtered out (`algo_copo.py:260-272`), so the
flat-dot runs over policy params exactly as here.
"""

from __future__ import annotations

import jax
import jax.flatten_util
import jax.numpy as jnp

from copo_tpu.algos.ppo import masked_mean
from copo_tpu.models.mlp import DiagGaussian, lcf_mean, lcf_std, policy_logits


def coordinated_adv(lcf, adv, nei_adv):
    """cos/sin blend; lcf in [-1, 1] -> phi = lcf*pi/2."""
    phi = lcf * jnp.pi / 2.0
    return jnp.cos(phi) * adv + jnp.sin(phi) * nei_adv


def meta_gradient(params, target_params, batch, clip_param, raw_adv_mean,
                  raw_adv_std, key, use_global_value: bool = True):
    """Gradient of the CoPO bi-level objective wrt the LCF parameters.

    batch: flat minibatch with obs, actions, logp_old, global_advantages
    (standardized), normalized_ego_advantages, advantages (raw native),
    nei_advantage (raw), valid. Returns (lcf_grad (2,), stats).

    `use_global_value` picks L1's advantage stream: the standardized global
    advantage (CoPO default, `train_all_copo_dist.py:49`) or the
    standardized ego advantage (published ablation axis, `grad.py:43-46`).
    """
    mask = batch["valid"].astype(jnp.float32)

    # --- L1: ego surrogate wrt new policy ---
    def new_policy_loss(policy_params):
        p = dict(params, policy=policy_params)
        mean, log_std = policy_logits(p, batch["obs"])
        logp = DiagGaussian.logp(mean, log_std, batch["actions"])
        ratio = jnp.exp(logp - batch["logp_old"])
        adv = batch["global_advantages"] if use_global_value \
            else batch["normalized_ego_advantages"]
        surr = jnp.minimum(
            adv * ratio, adv * jnp.clip(ratio, 1.0 - clip_param, 1.0 + clip_param)
        )
        return -masked_mean(surr, mask)

    l1, g_new = jax.value_and_grad(new_policy_loss)(params["policy"])

    # --- L2: mean old-policy log-prob wrt old policy ---
    def old_policy_loss(policy_params):
        p = dict(target_params, policy=policy_params)
        mean, log_std = policy_logits(p, batch["obs"])
        logp = DiagGaussian.logp(mean, log_std, batch["actions"])
        return masked_mean(logp, mask)

    l2, g_old = jax.value_and_grad(old_policy_loss)(target_params["policy"])

    # --- flat dot product (grad.py:94-113) ---
    flat_new = jax.flatten_util.ravel_pytree(g_new)[0]
    flat_old = jax.flatten_util.ravel_pytree(g_old)[0]
    grad_value = jnp.dot(flat_new, flat_old)

    # --- L3: differentiable LCF-blended advantage ---
    eps = jax.random.normal(key, batch["advantages"].shape)

    def lcf_loss(lcf_params):
        p = dict(params, lcf=lcf_params)
        lcf_sample = lcf_mean(p) + lcf_std(p) * eps      # rsample
        blended = coordinated_adv(lcf_sample, batch["advantages"], batch["nei_advantage"])
        normalized = (blended - raw_adv_mean) / raw_adv_std
        l3 = masked_mean(normalized, mask)
        return grad_value * l3, l3

    (loss_lcf, l3), lcf_grad = jax.value_and_grad(lcf_loss, has_aux=True)(params["lcf"])

    stats = {
        "meta/new_policy_ego_loss": l1,
        "meta/old_policy_logp_loss": l2,
        "meta/grad_value": grad_value,
        "meta/lcf_adv_loss": l3,
        "meta/lcf_final_loss": loss_lcf,
        # push-direction diagnostics (the reference logs coordinated_adv /
        # global_adv means, `algo_copo.py:303-305`): the early LCF drift
        # direction is -grad_value * mean(-sin(phi)*adv + cos(phi)*nei_adv)
        # — a persistently negative nei_adv mean with positive grad_value
        # drives phi toward 90 deg (the r4 tollgate runaway)
        "meta/adv_mean": masked_mean(batch["advantages"], mask),
        "meta/nei_adv_mean": masked_mean(batch["nei_advantage"], mask),
        "meta/lcf_grad_mean": lcf_grad[0],
    }
    return lcf_grad, stats
