#!/usr/bin/env python
"""Ablation experiments (reference `algo_svo/train_ippo_svo*.py`,
`train_ippo_maximize_{local,global}_reward.py`, SURVEY.md §2.1 item 25).

Modes:
  force-lcf:  sweep fixed LCF values (reference force-SVO sweep); the env
              blends rewards with the forced angle (return_native_reward off).
  max-local:  phi = 90 deg (pure neighbour reward), radius 10
              (`train_ippo_maximize_local_reward.py:44-47`).
  max-global: neighbour radius 10000 -> nei reward == global mean
              (`train_ippo_maximize_global_reward.py:44-46`).
  global-value: CoPO with use_global_value on/off (the published ablation
              axis of the meta-gradient's L1 advantage stream,
              `train_all_copo_dist.py:49`, `grad.py:43-46`).
"""

import argparse
import sys

sys.path.insert(0, ".")
from copo_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


import jax.numpy as jnp

from copo_tpu.envs import make_scene
from copo_tpu.runtime.harness import run_trial
from copo_tpu.runtime.trainer import IPPOTrainer, TrainerConfig

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--mode",
                   choices=("force-lcf", "max-local", "max-global",
                            "global-value"),
                   default="force-lcf")
    p.add_argument("--env", type=str, default="intersection")
    p.add_argument("--lcf-values", nargs="*", type=float,
                   default=[-1.0, -0.5, 0.0, 0.25, 0.5, 0.75, 1.0])
    p.add_argument("--num-iters", type=int, default=200)
    p.add_argument("--num-envs", type=int, default=32)
    p.add_argument("--rollout-T", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    def train_one(tag, scene_kwargs, env_param_updates):
        scene, env_cfg = make_scene(args.env, **scene_kwargs)
        trainer = IPPOTrainer(scene, env_cfg, TrainerConfig(
            num_envs=args.num_envs, rollout_T=args.rollout_T, seed=args.seed))
        state = trainer.init_state()
        state = state.replace(
            env_params=state.env_params.replace(**env_param_updates))
        out = run_trial(trainer, args.num_iters,
                        f"results/ablation_{args.mode}/{tag}",
                        checkpoint_freq=0, state=state)
        print(tag, "->", out["metrics"].get("success"))

    if args.mode == "force-lcf":
        for v in args.lcf_values:
            train_one(
                f"lcf_{v:+.2f}",
                dict(lcf_enabled=True, return_native_reward=False),
                dict(force_lcf=jnp.float32(v)),
            )
    elif args.mode == "max-local":
        train_one(
            "max_local",
            dict(lcf_enabled=True, return_native_reward=False,
                 neighbours_distance=10.0),
            dict(force_lcf=jnp.float32(1.0)),   # phi = 90 deg
        )
    elif args.mode == "max-global":
        train_one(
            "max_global",
            dict(lcf_enabled=True, return_native_reward=False,
                 neighbours_distance=10000.0),
            dict(force_lcf=jnp.float32(1.0)),
        )
    else:  # global-value: CoPO meta-gradient L1 stream on/off
        from copo_tpu.runtime.copo import CoPOConfig, CoPOTrainer

        for ugv in (True, False):
            scene, env_cfg = make_scene(args.env, lcf_enabled=True)
            trainer = CoPOTrainer(scene, env_cfg, CoPOConfig(
                num_envs=args.num_envs, rollout_T=args.rollout_T,
                seed=args.seed, use_global_value=ugv, fused=True))
            out = run_trial(
                trainer, args.num_iters,
                f"results/ablation_{args.mode}/ugv_{ugv}",
                checkpoint_freq=0)
            m = out["metrics"]
            print(f"use_global_value={ugv} -> success "
                  f"{m.get('success'):.3f} lcf_deg {m.get('lcf_deg', 0):.1f}")
