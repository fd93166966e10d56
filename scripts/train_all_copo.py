#!/usr/bin/env python
"""CoPO sweep over all six scenes x seeds (reference train_all_copo_dist.py).

The reference grid: 6 envs x 8 start_seeds, 1M env steps each
(SURVEY.md §2.1 item 26)."""

import argparse
import sys

sys.path.insert(0, ".")
from copo_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


from copo_tpu.envs import make_scene
from copo_tpu.runtime.copo import CoPOConfig, CoPOTrainer
from copo_tpu.runtime.harness import sweep

ENVS = ["intersection", "roundabout", "bottleneck", "tollgate", "parking", "pgmap"]

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--exp-name", type=str, default="copo_all")
    p.add_argument("--num-seeds", type=int, default=8)
    p.add_argument("--start-seed", type=int, default=5000)
    p.add_argument("--num-iters", type=int, default=250)
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--rollout-T", type=int, default=64)
    p.add_argument("--envs", nargs="*", default=ENVS)
    args = p.parse_args()

    def make_trainer(env_name, seed):
        scene, env_cfg = make_scene(env_name, lcf_enabled=True)
        return CoPOTrainer(scene, env_cfg, CoPOConfig(
            num_envs=args.num_envs, rollout_T=args.rollout_T, seed=seed))

    sweep(make_trainer, args.exp_name, envs=args.envs,
          num_seeds=args.num_seeds, start_seed=args.start_seed,
          num_iters=args.num_iters)
