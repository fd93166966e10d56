#!/usr/bin/env python
"""Throughput benchmark: fused policy+env rollout on the available accelerator.

Prints ONE JSON line:
  {"metric": "agent_steps_per_s", "value": N, "unit": "steps/s", "vs_baseline": R}

Headline metric = agent-steps/s of the full hot path (policy MLP inference +
vectorized env step, B envs x N agents, jit-fused scan) — the moral
equivalent of the reference's Ray `sample_throughput` (SURVEY.md §6), whose
one recorded sample is ~15.6k obs/s on a CPU node. vs_baseline is measured
against the BASELINE.json north star of 1M env-steps/s aggregate per host.
"""

import json
import time

import jax
import jax.numpy as jnp

from copo_tpu.envs import make_scene
from copo_tpu.envs.config import EnvParams
from copo_tpu.envs.engine import vec_reset, vec_step
from copo_tpu.models.mlp import DiagGaussian, init_model, policy_logits

BASELINE_STEPS_PER_S = 1_000_000.0


def rollout_fn(scene, cfg, params, env_states, obs, env_params, key, T):
    def step_fn(carry, k):
        states, obs = carry
        mean, log_std = policy_logits(params, obs)
        act = DiagGaussian.sample(k, mean, log_std)
        states, out = vec_step(scene, cfg, states, act, env_params)
        return (states, out.obs), out.reward.sum()

    keys = jax.random.split(key, T)
    (env_states, obs), rs = jax.lax.scan(step_fn, (env_states, obs), keys)
    return env_states, obs, rs.sum()


def main():
    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    B = 512 if on_accel else 16
    T = 64 if on_accel else 8
    N = 40

    scene, cfg = make_scene("intersection", num_agents=N)
    params_env = EnvParams.default(N)
    key = jax.random.PRNGKey(0)
    k_env, k_model, k_roll = jax.random.split(key, 3)
    env_keys = jax.random.split(k_env, B)
    jit_reset = jax.jit(vec_reset, static_argnums=(1,))
    env_states, obs = jit_reset(scene, cfg, env_keys, params_env)
    params = init_model(k_model, cfg.obs_dim, cfg.action_dim)

    roll = jax.jit(rollout_fn, static_argnums=(1, 7))
    # warmup / compile
    env_states, obs, _ = roll(scene, cfg, params, env_states, obs, params_env, k_roll, T)
    jax.block_until_ready(obs)

    reps = 5 if on_accel else 2
    t0 = time.perf_counter()
    for i in range(reps):
        env_states, obs, _ = roll(
            scene, cfg, params, env_states, obs, params_env,
            jax.random.fold_in(k_roll, i), T,
        )
    jax.block_until_ready(obs)
    dt = time.perf_counter() - t0

    agent_steps = reps * T * B * N
    sps = agent_steps / dt
    print(json.dumps({
        "metric": "agent_steps_per_s",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
