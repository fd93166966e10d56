#!/usr/bin/env python
"""General training entry point (reference L6 CLI, SURVEY.md §1).

Examples:
  python scripts/train.py --algo copo --env intersection --num-iters 500
  python scripts/train.py --algo ippo --env roundabout --test
  python scripts/train.py --algo ccppo --fuse mf --env bottleneck
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")
from copo_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
  # repo root

from copo_tpu.algos.ccppo import FusionConfig
from copo_tpu.envs import make_scene
from copo_tpu.runtime.ccppo import CCPPOConfig, CCPPOTrainer
from copo_tpu.runtime.copo import CoPOConfig, CoPOTrainer
from copo_tpu.runtime.curriculum import CLConfig, IPPOCLTrainer
from copo_tpu.runtime.harness import run_trial
from copo_tpu.runtime.trainer import IPPOTrainer, TrainerConfig

ALGOS = ("ippo", "ccppo", "copo", "cl")
ENVS = ("intersection", "roundabout", "bottleneck", "tollgate", "parking", "pgmap")


def get_parser() -> argparse.ArgumentParser:
    """Reference parser surface (`train/utils.py:31-39`) + our knobs."""
    p = argparse.ArgumentParser()
    p.add_argument("--exp-name", type=str, default="")
    p.add_argument("--algo", choices=ALGOS, default="ippo")
    p.add_argument("--env", choices=ENVS, default="intersection")
    p.add_argument("--fuse", choices=("mf", "concat", "none"), default="mf")
    p.add_argument("--num-agents", type=int, default=None)
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--rollout-T", type=int, default=64)
    p.add_argument("--num-iters", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=3e-4)
    # reference default is 512 (SURVEY.md §2.3 item 10); larger minibatches
    # feed the MXU far better — pass e.g. 4096 for TPU runs
    p.add_argument("--minibatch", type=int, default=512)
    p.add_argument("--sgd-iters", type=int, default=5)
    p.add_argument("--checkpoint-freq", type=int, default=10)
    p.add_argument("--results-root", type=str, default="results")
    p.add_argument("--test", action="store_true", help="tiny smoke config")
    # the MetaDrive MA default terminates crashed agents (crash_done=True);
    # pass --no-crash-done to ablate non-terminating crashes
    p.add_argument("--no-crash-done", action="store_true")
    # intersection geometry A/B (VERDICT r2 weak #4): lanes per direction
    p.add_argument("--lane-num", type=int, default=None)
    return p


def make_trainer(args):
    scene_kwargs = {}
    if args.algo == "copo":
        scene_kwargs["lcf_enabled"] = True
    if getattr(args, "no_crash_done", False):
        scene_kwargs["crash_done"] = False
    if getattr(args, "lane_num", None) is not None:
        if args.env != "intersection":
            raise SystemExit(
                f"--lane-num is only consumed by the intersection scene; "
                f"env {args.env!r} would silently train default geometry"
            )
        scene_kwargs["lane_num"] = args.lane_num
    scene, env_cfg = make_scene(args.env, num_agents=args.num_agents,
                                **scene_kwargs)
    common = dict(
        num_envs=args.num_envs, rollout_T=args.rollout_T, lr=args.lr,
        seed=args.seed, sgd_minibatch_size=args.minibatch,
        num_sgd_iter=args.sgd_iters,
    )
    if args.test:
        common.update(num_envs=2, rollout_T=10, sgd_minibatch_size=32,
                      num_sgd_iter=2)
    if args.algo == "ippo":
        return IPPOTrainer(scene, env_cfg, TrainerConfig(**common))
    if args.algo == "cl":
        return IPPOCLTrainer(scene, env_cfg,
                             CLConfig(total_iters=args.num_iters, **common))
    if args.algo == "ccppo":
        return CCPPOTrainer(
            scene, env_cfg,
            CCPPOConfig(fusion=FusionConfig(fuse_mode=args.fuse), **common),
        )
    if args.algo == "copo":
        return CoPOTrainer(scene, env_cfg, CoPOConfig(**common))
    raise ValueError(args.algo)


def main():
    args = get_parser().parse_args()
    exp = args.exp_name or f"{args.algo}_{args.env}_seed{args.seed}"
    trainer = make_trainer(args)
    num_iters = 3 if args.test else args.num_iters
    out = run_trial(
        trainer, num_iters, f"{args.results_root}/{exp}",
        checkpoint_freq=0 if args.test else args.checkpoint_freq,
    )
    print("best success:", out["best_success"])


if __name__ == "__main__":
    main()
