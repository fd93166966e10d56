"""On-device rollout collection: lax.scan over env steps with policy inline.

Collapses the reference's three hot loops (SURVEY.md §3.1: env stepping in
remote Ray workers, per-step action inference, driver SGD) into one traced
program: T steps of the B-way vectorized engine interleaved with batched
policy forward passes, producing (T, B, N, ...) trajectory arrays that feed
GAE and SGD without leaving the device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from copo_tpu.envs.config import EnvConfig, EnvParams
from copo_tpu.envs.engine import vec_step
from copo_tpu.envs.scene import SceneData
from copo_tpu.models.mlp import DiagGaussian, policy_logits, value_head


def ego_cc_obs(scene, cfg, states, obs, actions):
    """fuse_mode "none": centralized-critic obs = ego obs
    (`torch_copo/algo_ccppo.py:63-64`)."""
    return obs


def collect_rollout(scene: SceneData, cfg: EnvConfig, params, env_states, obs0,
                    env_params: EnvParams, key, T: int, *,
                    value_heads=("vf",), cc_obs_fn=ego_cc_obs):
    """Roll the policy for T steps. Returns (env_states', obs_T, traj dict).

    traj arrays have shape (T, B, N, ...) and include per-head value
    predictions evaluated on the cc-obs of each step plus the bootstrap
    values at the post-rollout observation.
    """

    cc_is_ego = cc_obs_fn is ego_cc_obs  # fuse "none": cc_obs == obs, store once

    def step_fn(carry, k):
        env_states, obs = carry
        mean, log_std = policy_logits(params, obs)
        act = DiagGaussian.sample(k, mean, log_std)
        logp = DiagGaussian.logp(mean, log_std, act)
        cc_obs = cc_obs_fn(scene, cfg, env_states, obs, act)
        next_states, out = vec_step(scene, cfg, env_states, act, env_params)
        rec = {
            "obs": obs,
            "actions": act,
            "logp_old": logp,
            "dist_mean_old": mean,
            "dist_log_std_old": log_std,
            "reward": out.reward,
            "done": out.done,
            "valid": out.info.valid,
            "nei_reward": out.info.nei_reward,
            "global_reward": out.info.global_reward,
            "step_lcf": out.info.lcf,
            "info": out.info,
        }
        if not cc_is_ego:
            rec["cc_obs"] = cc_obs
        for head in value_heads:
            rec[f"{head}_pred"] = value_head(params, head, cc_obs)
        return (next_states, out.obs), rec

    keys = jax.random.split(key, T)
    (env_states, obs_T), traj = jax.lax.scan(step_fn, (env_states, obs0), keys)

    # bootstrap values at the final observation (truncation bootstrap,
    # `algo_copo.py:492-496`); terminal steps are cut by the done mask in GAE
    final_cc_obs = cc_obs_fn(scene, cfg, env_states, obs_T, jnp.zeros_like(traj["actions"][0]))
    last_values = {
        head: value_head(params, head, final_cc_obs) for head in value_heads
    }
    return env_states, obs_T, traj, last_values
