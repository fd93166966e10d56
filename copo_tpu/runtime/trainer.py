"""PPO trainer family: rollout -> GAE -> SGD as one jit-compiled iteration.

Replaces the reference's Ray/RLlib execution plan (`algo_copo/copo.py:560-611`
ParallelRollouts -> StandardizeFields -> TrainTFMultiGPU -> UpdateSvo; torch
`training_step` `algo_copo.py:516-661`) with a single traced program per
iteration. No weight broadcast exists: params are replicated by sharding, and
"pushing LCF to envs" is writing a field of EnvParams.

IPPOTrainer here == reference IPPO (`algo_ippo/ippo.py`, `torch_copo/
algo_ippo.py`): shared policy over all agents, native reward stream, one
value head. CCPPO/CoPO subclass by widening value heads / advantage blending.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from copo_tpu.algos.gae import masked_gae
from copo_tpu.algos.ppo import PPOLossConfig, masked_mean, ppo_loss, update_kl_coeff
from copo_tpu.envs.config import EnvConfig, EnvParams
from copo_tpu.envs.engine import stagger_t_init, vec_reset
from copo_tpu.envs.scene import SceneData
from copo_tpu.models.mlp import init_model
from copo_tpu.runtime.metrics import rollout_metrics
from copo_tpu.runtime.rollout import collect_rollout, ego_cc_obs


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Static trainer config (reference defaults, SURVEY.md §2.3 item 10)."""

    num_envs: int = 8
    rollout_T: int = 100           # rollout_fragment_length analogue
    gamma: float = 0.99
    lam: float = 0.95
    lr: float = 3e-4
    # Linear lr decay to 0 over this many OPTIMIZER updates (0 = constant,
    # the reference's setting). One iteration performs
    # num_sgd_iter * (batch // sgd_minibatch_size) updates.
    lr_anneal_updates: int = 0
    num_sgd_iter: int = 5
    sgd_minibatch_size: int = 512
    kl_coeff_init: float = 0.2
    # Minibatch shuffling: "none" = sequential contiguous slices (cheapest
    # on TPU), "once" = one permutation gather shared by all epochs,
    # "epoch" = fresh permutation per epoch — RLlib's minibatch iterator
    # semantics and the default here (+2.5 pts intersection success over
    # "once" across 2 seeds; decorrelating minibatches between epochs
    # matters at minibatch 512). Costs a full-batch gather per epoch.
    shuffle: str = "epoch"
    loss: PPOLossConfig = PPOLossConfig()
    seed: int = 0
    # One fused jit dispatch per iteration instead of three phase dispatches
    # with device-fetch barriers. On the remote-attached TPU each dispatch +
    # barrier costs a ~30 ms tunnel round trip — at the reference's small
    # train batch (32x32) that overhead dominates the iteration. Fused mode
    # loses the per-phase sample/learn/meta time split (RLlib timer parity),
    # so profiling runs keep it off.
    fused: bool = False


@struct.dataclass
class TrainState:
    params: dict
    opt_state: object
    kl_coeff: jnp.ndarray
    env_states: object          # batched EnvState
    last_obs: jnp.ndarray       # (B, N, obs_dim)
    env_params: EnvParams
    key: jnp.ndarray
    iteration: jnp.ndarray      # () int32 (cumulative step counters live on
                                # host: float32 in-jit counters lose precision
                                # past 16M steps; see Trainer.train)


def standardized(x, mask):
    """Masked standardization (reference `standardized()` on the train batch)."""
    m = masked_mean(x, mask)
    var = masked_mean(jnp.square(x - m), mask)
    return (x - m) * mask / jnp.maximum(jnp.sqrt(var), 1e-4)


def shard_minibatch_layout(traj, keys):
    """(T, B, N, ...) trajectory fields -> (B, T*N, ...) + column count.

    The env axis B is the mesh-sharded dimension; minibatching slices the
    local T*N column axis so a sharded batch never crosses devices (see
    `_learn_phase` — a flat global layout forced GSPMD to all-gather and
    replicate the SGD work)."""
    T, B, N = traj["valid"].shape
    K = T * N
    data = {
        k: jnp.moveaxis(traj[k], 1, 0).reshape((B, K) + traj[k].shape[3:])
        for k in keys
    }
    return data, K


def shard_minibatch_geometry(minibatch_size, B, K):
    """Columns per minibatch (c) and minibatch count so that B*c ~= the
    configured agent-step minibatch size (exact when it divides by B)."""
    c = max(min(minibatch_size // B, K), 1)
    return c, max(K // c, 1)


class IPPOTrainer:
    """Independent PPO with one shared policy over every agent slot."""

    value_heads = ("vf",)

    def __init__(self, scene: SceneData, env_cfg: EnvConfig, cfg: TrainerConfig):
        self.scene = scene
        self.env_cfg = env_cfg
        self.cfg = cfg
        if cfg.lr_anneal_updates > 0:
            lr = optax.linear_schedule(cfg.lr, 0.0, cfg.lr_anneal_updates)
        else:
            lr = cfg.lr
        self.tx = optax.adam(lr, eps=1e-7)
        # scene is a jit ARGUMENT: closing device arrays into jit as constants
        # degrades both compile (>10x) and runtime (>40x on the axon backend).
        # The iteration is three jitted phases (rollout / SGD / extra) so the
        # harness can log the reference's sample/learn/meta time split
        # (`timers/sample_time_ms`, `learn_time_ms` in RLlib progress.csv —
        # SURVEY.md §5); trajectories stay on device between phases.
        self._jit_rollout = jax.jit(self._rollout_phase)
        self._jit_learn = jax.jit(self._learn_phase)
        self._has_extra = (
            type(self).extra_update is not IPPOTrainer.extra_update
        )
        self._jit_extra = jax.jit(self.extra_update) if self._has_extra else None
        self._jit_full = jax.jit(self._full_iter) if cfg.fused else None

    # ---- hooks for subclasses (CCPPO / CoPO) -----------------------------
    def cc_obs_fn(self) -> Callable:
        return ego_cc_obs

    def model_kwargs(self) -> dict:
        return {"num_value_heads": 1}

    def compute_advantages(self, traj, last_values):
        """Fill traj['normalized_advantages'] and per-head targets."""
        cfg = self.cfg
        adv, target = masked_gae(
            traj["reward"], traj["vf_pred"], traj["done"], traj["valid"],
            last_values["vf"], gamma=cfg.gamma, lam=cfg.lam,
        )
        mask = traj["valid"].astype(jnp.float32)
        traj["advantages"] = adv
        traj["vf_target"] = target
        traj["normalized_advantages"] = standardized(adv, mask)
        return traj

    def extra_update(self, state: TrainState, traj, stats) -> tuple:
        """Post-SGD hook (CoPO meta-update). Returns (state, extra_stats)."""
        return state, {}

    # ---- lifecycle -------------------------------------------------------
    def init_state(self, key=None) -> TrainState:
        key = jax.random.PRNGKey(self.cfg.seed) if key is None else key
        k_model, k_env, k_loop = jax.random.split(key, 3)
        env_params = self.default_env_params()
        env_keys = jax.random.split(k_env, self.cfg.num_envs)
        # staggered episode clocks: without them every env flushes its scene
        # episode in the same iteration (a ~B*N-episode metric dump) and the
        # next batch is dominated by the synchronized post-reset spawn wave
        env_states, obs = jax.jit(vec_reset, static_argnums=(1,))(
            self.scene, self.env_cfg, env_keys, env_params,
            stagger_t_init(self.cfg.num_envs, self.env_cfg.horizon),
        )
        params = init_model(
            k_model, self.env_cfg.obs_dim, self.env_cfg.action_dim,
            **self.model_kwargs(),
        )
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            kl_coeff=jnp.float32(self.cfg.kl_coeff_init),
            env_states=env_states,
            last_obs=obs,
            env_params=env_params,
            key=k_loop,
            iteration=jnp.int32(0),
        )

    def default_env_params(self) -> EnvParams:
        return EnvParams.default(self.env_cfg.num_agents)

    # ---- the jitted iteration phases --------------------------------------
    def _rollout_phase(self, scene, state: TrainState):
        """Sample phase: rollout + GAE + on-device episode metrics."""
        cfg, env_cfg = self.cfg, self.env_cfg
        key, k_roll = jax.random.split(state.key)

        env_states, obs_T, traj, last_values = collect_rollout(
            scene, env_cfg, state.params, state.env_states, state.last_obs,
            state.env_params, k_roll, cfg.rollout_T,
            value_heads=self.value_heads, cc_obs_fn=self.cc_obs_fn(),
        )
        traj = self.compute_advantages(traj, last_values)
        metrics = rollout_metrics(traj)
        state = state.replace(env_states=env_states, last_obs=obs_T, key=key)
        return state, traj, metrics

    def _learn_phase(self, scene, state: TrainState, traj):
        """Learn phase: K epochs of minibatch SGD (train_one_step analogue)."""
        cfg = self.cfg
        key, k_sgd = jax.random.split(state.key)
        flat_keys = [
            "obs", "actions", "logp_old", "dist_mean_old",
            "dist_log_std_old", "normalized_advantages", "valid",
        ] + [f"{h}_pred" for h in self.value_heads] \
          + [f"{h}_target" for h in self.value_heads]
        # cc_obs == ego obs for IPPO / fuse "none": rollout stored it once
        # (it is the largest array in the batch)
        cc_is_ego = "cc_obs" not in traj
        if not cc_is_ego:
            flat_keys.append("cc_obs")
        T, B, N = traj["valid"].shape
        # Shard-friendly layout (r5): keep the env axis B — the dimension
        # sharded over the device mesh — intact, and shuffle/minibatch along
        # the LOCAL T*N axis. A global permutation of the flat T*B*N batch
        # would make GSPMD all-gather the whole trajectory to every device
        # and replicate the SGD compute (measured 4.6x worse-than-serial on
        # the virtual 8-device mesh); with B kept whole, each device grads
        # its own shard and the only collective is the psum on grads. Every
        # minibatch still mixes all envs (a (B, c) column slice), and the
        # per-epoch reshuffle semantics (RLlib minibatch iterator) remain.
        data, K = shard_minibatch_layout(traj, flat_keys)
        c, nmb = shard_minibatch_geometry(cfg.sgd_minibatch_size, B, K)

        loss_cfg = cfg.loss
        value_heads = self.value_heads
        tx = self.tx

        if cfg.shuffle == "once":
            perm = jax.random.permutation(k_sgd, K)
            data = jax.tree_util.tree_map(lambda x: x[:, perm], data)

        def epoch_fn(carry, k):
            params, opt_state = carry
            if cfg.shuffle == "epoch":
                perm = jax.random.permutation(k, K)
                epoch_data = jax.tree_util.tree_map(lambda x: x[:, perm], data)
            else:
                epoch_data = data
            chunked = jax.tree_util.tree_map(
                lambda x: jnp.moveaxis(
                    x[:, : nmb * c].reshape(
                        (x.shape[0], nmb, c) + x.shape[2:]), 1, 0),
                epoch_data,
            )

            def mb_fn(carry, batch):
                params, opt_state = carry
                if cc_is_ego:
                    batch = dict(batch, cc_obs=batch["obs"])
                (_, stats), grads = jax.value_and_grad(ppo_loss, has_aux=True)(
                    params, batch, loss_cfg, state.kl_coeff, value_heads=value_heads
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), stats

            (params, opt_state), stats = jax.lax.scan(mb_fn, (params, opt_state), chunked)
            return (params, opt_state), jax.tree_util.tree_map(jnp.mean, stats)

        sgd_keys = jax.random.split(k_sgd, cfg.num_sgd_iter)
        (params, opt_state), sgd_stats = jax.lax.scan(
            epoch_fn, (state.params, state.opt_state), sgd_keys
        )
        sgd_stats = jax.tree_util.tree_map(lambda x: x[-1], sgd_stats)  # last epoch

        kl_coeff = update_kl_coeff(
            state.kl_coeff, sgd_stats["kl"], loss_cfg.kl_target
        )

        new_state = state.replace(
            params=params,
            opt_state=opt_state,
            kl_coeff=kl_coeff,
            key=key,
            iteration=state.iteration + 1,
        )
        sgd_stats = {
            **sgd_stats,
            "kl_coeff": kl_coeff,
            "env_steps_this_iter": jnp.float32(T * B),
            "agent_steps_this_iter": jnp.sum(traj["valid"]).astype(jnp.float32),
        }
        return new_state, sgd_stats

    def _full_iter(self, scene, state: TrainState):
        """All three phases as one traced program (cfg.fused)."""
        state, traj, metrics = self._rollout_phase(scene, state)
        state, sgd_stats = self._learn_phase(scene, state, traj)
        extra = {}
        if self._has_extra:
            state, extra = self.extra_update(state, traj, sgd_stats)
        return state, {**metrics, **sgd_stats, **extra}

    def train_iter(self, state: TrainState):
        """One training iteration (jit-cached). Returns (state, metrics).

        Phase boundaries are synced so metrics carry the reference's
        sample/learn(/meta) wall-time split (non-fused mode).
        """
        if self._jit_full is not None:
            return self._jit_full(self.scene, state)
        # Sync via a scalar device_get: on the remote-attached TPU backend
        # (axon) `block_until_ready` returns before execution finishes, so a
        # tiny fetch is the only reliable phase barrier (~1 ms round trip,
        # negligible against the phases it delimits).
        t0 = time.perf_counter()
        state, traj, metrics = self._jit_rollout(self.scene, state)
        jax.device_get(jax.tree_util.tree_leaves(metrics)[0])
        t1 = time.perf_counter()
        state, sgd_stats = self._jit_learn(self.scene, state, traj)
        jax.device_get(sgd_stats["kl"])
        t2 = time.perf_counter()
        extra = {}
        if self._has_extra:
            state, extra = self._jit_extra(state, traj, sgd_stats)
            jax.device_get(jax.tree_util.tree_leaves(extra or state.key)[0])
        t3 = time.perf_counter()
        metrics = {
            **metrics, **sgd_stats, **extra,
            "sample_time_ms": (t1 - t0) * 1e3,
            "learn_time_ms": (t2 - t1) * 1e3,
            "meta_time_ms": (t3 - t2) * 1e3,
        }
        return state, metrics

    def train(self, state: TrainState, num_iters: int, log_fn=None):
        for _ in range(num_iters):
            state, metrics = self.train_iter(state)
            if log_fn is not None:
                log_fn(state, metrics)
        return state, metrics
