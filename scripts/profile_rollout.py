#!/usr/bin/env python
"""Profile the rollout hot path + fused CoPO train iteration on the TPU.

r4 VERDICT next #4: commit a profiler artifact and a per-feature cost
bisect of the rollout step (the r3->r4 fidelity work cost 24% at B=512 and
went unmeasured). Two outputs:

  artifacts/r5/profile/           jax.profiler trace (open in XProf /
                                  tensorboard) of the B=512 rollout and the
                                  trial-shape fused CoPO iteration
  artifacts/r5/rollout_bisect.json per-feature timings at B=512 obtained by
                                  toggling env features off one at a time
                                  (upper-bound cost of each)

Run on the TPU host: `python scripts/profile_rollout.py`.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from copo_tpu.utils.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from copo_tpu.envs import make_scene  # noqa: E402
from copo_tpu.envs.config import EnvParams  # noqa: E402
from copo_tpu.envs.engine import vec_reset, vec_step  # noqa: E402
from copo_tpu.models.mlp import DiagGaussian, init_model, policy_logits  # noqa: E402

B, T, N = 512, 64, 40
REPS = 5


def build_rollout(scene, cfg):
    def rollout_fn(scene, params, env_states, obs, env_params, key):
        def step_fn(carry, k):
            states, obs = carry
            mean, log_std = policy_logits(params, obs)
            act = DiagGaussian.sample(k, mean, log_std)
            states, out = vec_step(scene, cfg, states, act, env_params)
            return (states, out.obs), jnp.sum(out.info.valid)

        keys = jax.random.split(key, T)
        (env_states, obs), live = jax.lax.scan(step_fn, (env_states, obs), keys)
        return env_states, obs, live.sum()

    return jax.jit(rollout_fn)


def time_rollout(scene_kwargs: dict, label: str) -> float:
    scene, cfg = make_scene("intersection", num_agents=N, **scene_kwargs)
    params_env = EnvParams.default(N)
    k_env, k_model, k_roll = jax.random.split(jax.random.PRNGKey(0), 3)
    params = init_model(k_model, cfg.obs_dim, cfg.action_dim)
    env_keys = jax.random.split(k_env, B)
    env_states, obs = jax.jit(vec_reset, static_argnums=(1,))(
        scene, cfg, env_keys, params_env)
    roll = build_rollout(scene, cfg)
    _, _, live = roll(scene, params, env_states, obs, params_env, k_roll)
    int(live)
    times = []
    for i in range(REPS):
        t0 = time.perf_counter()
        env_states, obs, live = roll(scene, params, env_states, obs,
                                     params_env, jax.random.fold_in(k_roll, i))
        int(live)  # sync barrier (remote-attached backend)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    sps = T * B / med
    print(f"{label:28s} {sps:10.0f} env-steps/s ({med*1e3:.1f} ms / {T}-step scan)",
          flush=True)
    return sps


def main():
    os.makedirs("artifacts/r5/profile", exist_ok=True)

    # --- feature bisect: toggle candidate costs off one at a time ---------
    results = {}
    results["baseline_b512"] = time_rollout({}, "baseline")
    # obs composition pieces (upper-bound costs; these gates exist for
    # scene-config parity, so toggling them changes obs_dim — cost-only
    # comparison, not a numerics A/B)
    results["no_navi"] = time_rollout({"navi_in_obs": False}, "navi off")
    results["lidar_36"] = time_rollout({"lidar_num_lasers": 36}, "lidar 36 beams")
    results["no_lidar"] = time_rollout({"lidar_num_lasers": 0}, "lidar off")

    # --- jax profiler traces ---------------------------------------------
    scene, cfg = make_scene("intersection", num_agents=N)
    params_env = EnvParams.default(N)
    k_env, k_model, k_roll = jax.random.split(jax.random.PRNGKey(0), 3)
    params = init_model(k_model, cfg.obs_dim, cfg.action_dim)
    env_keys = jax.random.split(k_env, B)
    env_states, obs = jax.jit(vec_reset, static_argnums=(1,))(
        scene, cfg, env_keys, params_env)
    roll = build_rollout(scene, cfg)
    _, _, live = roll(scene, params, env_states, obs, params_env, k_roll)
    int(live)
    with jax.profiler.trace("artifacts/r5/profile"):
        for i in range(3):
            env_states, obs, live = roll(scene, params, env_states, obs,
                                         params_env, jax.random.fold_in(k_roll, i))
        int(live)

    # trial-shape fused CoPO iteration
    from copo_tpu.runtime.copo import CoPOConfig, CoPOTrainer
    scene2, env_cfg2 = make_scene("intersection", num_agents=30,
                                  lcf_enabled=True)
    trainer = CoPOTrainer(scene2, env_cfg2, CoPOConfig(
        num_envs=32, rollout_T=32, sgd_minibatch_size=512, num_sgd_iter=5,
        fused=True))
    state = trainer.init_state()
    state, m = trainer.train_iter(state)
    float(m["total_loss"])
    with jax.profiler.trace("artifacts/r5/profile"):
        for _ in range(3):
            state, m = trainer.train_iter(state)
        float(m["total_loss"])

    with open("artifacts/r5/rollout_bisect.json", "w") as f:
        json.dump({k: round(v, 1) for k, v in results.items()}, f, indent=2)
    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
