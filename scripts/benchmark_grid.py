#!/usr/bin/env python
"""The benchmark table: 4 algorithms x 6 scenes x K seeds, 1M steps each.

Reference deliverable: `benchmarks/MetaDrive-0.2.5/README.md:17-31` — per
seed take the max of the smoothed success curve, report mean (std) over
seeds; CL trains 2M steps and discards the first 1.5M. Sequential trials on
the one chip; resumable (a trial whose final checkpoint exists is skipped,
an interrupted one resumes from its latest checkpoint via run_trial).

  python scripts/benchmark_grid.py                    # full grid
  python scripts/benchmark_grid.py --algos ippo copo --envs intersection
  python scripts/benchmark_grid.py --table            # just print the table
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")
from copo_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


from copo_tpu.algos.ccppo import FusionConfig
from copo_tpu.envs import make_scene
from copo_tpu.runtime.ccppo import CCPPOConfig, CCPPOTrainer
from copo_tpu.runtime.copo import CoPOConfig, CoPOTrainer
from copo_tpu.runtime.curriculum import CLConfig, IPPOCLTrainer
from copo_tpu.runtime.harness import run_trial
from copo_tpu.runtime.trainer import IPPOTrainer, TrainerConfig
from copo_tpu.utils.pretty import SafeFallbackEncoder

ALGOS = ("ippo", "ccppo_mf", "ccppo_concat", "cl", "copo")
ENVS = ("intersection", "roundabout", "bottleneck", "tollgate", "parking",
        "pgmap")

#: reference training batch (TF train_batch_size=1024, SURVEY.md §2.3 #10)
NUM_ENVS, ROLLOUT_T = 32, 32
STEPS = 1_000_000
CL_STEPS = 2_000_000   # train_all_cl.py stop (2M), first 1.5M discarded


def make_trainer(algo: str, env: str, seed: int):
    global STEPS, CL_STEPS
    scene_kwargs = {}
    if algo == "copo":
        scene_kwargs["lcf_enabled"] = True
    scene, env_cfg = make_scene(env, **scene_kwargs)
    common = dict(num_envs=NUM_ENVS, rollout_T=ROLLOUT_T,
                  sgd_minibatch_size=512, num_sgd_iter=5, seed=seed,
                  fused=True)
    iters = (CL_STEPS if algo == "cl" else STEPS) // (NUM_ENVS * ROLLOUT_T)
    if algo == "ippo":
        return IPPOTrainer(scene, env_cfg, TrainerConfig(**common)), iters
    if algo == "cl":
        return IPPOCLTrainer(
            scene, env_cfg, CLConfig(total_iters=iters, **common)), iters
    if algo.startswith("ccppo"):
        fuse = algo.split("_", 1)[1]
        return CCPPOTrainer(
            scene, env_cfg,
            CCPPOConfig(fusion=FusionConfig(fuse_mode=fuse), **common)), iters
    if algo == "copo":
        return CoPOTrainer(scene, env_cfg, CoPOConfig(**common)), iters
    raise KeyError(algo)


def trial_done(trial_dir: str, iters: int) -> bool:
    return os.path.isdir(
        os.path.join(trial_dir, "checkpoints", f"step_{iters}"))


def print_table(root: str):
    from copo_tpu.utils.curves import benchmark_table
    print(f"{'algo':14s} " + " ".join(f"{e[:12]:>14}" for e in ENVS))
    full = {}
    for algo in ALGOS:
        exp = os.path.join(root, algo)
        if not os.path.isdir(exp):
            continue
        tab = benchmark_table(exp, discard_frac=0.75 if algo == "cl" else 0.0)
        full[algo] = tab
        cells = []
        for e in ENVS:
            key = f"{algo}_{e}"
            if key in tab:
                t = tab[key]
                cells.append(f"{100*t['mean']:6.2f} ({100*t['std']:5.2f})")
            else:
                cells.append(" " * 14)
        print(f"{algo:14s} " + " ".join(f"{c:>14}" for c in cells))
    with open(os.path.join(root, "benchmark_table.json"), "w") as f:
        json.dump(full, f, indent=2, cls=SafeFallbackEncoder)
    print("wrote", os.path.join(root, "benchmark_table.json"))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--algos", nargs="*", default=list(ALGOS))
    p.add_argument("--envs", nargs="*", default=list(ENVS))
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--start-seed", type=int, default=5000)
    p.add_argument("--root", type=str, default="results/r3_bench")
    p.add_argument("--table", action="store_true")
    p.add_argument("--steps", type=int, default=STEPS)
    p.add_argument("--cl-steps", type=int, default=CL_STEPS)
    p.add_argument("--skip-suite-check", action="store_true",
                   help="skip the pre-grid pytest gate (use only when the "
                        "suite was just run green by hand)")
    args = p.parse_args()
    STEPS, CL_STEPS = args.steps, args.cl_steps

    if args.table:
        print_table(args.root)
        sys.exit(0)

    if not args.skip_suite_check:
        # refuse to burn hours of grid compute on a red test suite (r4
        # snapshotted red; VERDICT r4 next #5). Runs on CPU (conftest pins
        # the platform), so it does not touch the TPU the grid will use.
        import subprocess
        print("=== pre-grid suite check (tests/, -x -q) ===", flush=True)
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "tests/", "-x", "-q"])
        if rc != 0:
            sys.exit("test suite is RED - fix it (or pass "
                     "--skip-suite-check) before running the grid")

    import jax

    # Seeds OUTERMOST: one seed of every (algo, env) cell lands before second
    # seeds start, so an interrupted grid still has full breadth. Trainers
    # are cached per (algo, env) and reused across seeds — the jitted
    # iteration compiles once per cell (compiles cost minutes on the
    # remote-attached backend; run_trial varies only init_key).
    trainers: dict = {}
    for i in range(args.seeds):
        seed = i * 100 + args.start_seed       # train/train.py:56 rule
        for algo in args.algos:
            for env in args.envs:
                trial = f"{algo}_{env}_seed{seed}"
                tdir = os.path.join(args.root, algo, trial)
                if (algo, env) not in trainers:
                    trainers[(algo, env)] = make_trainer(algo, env,
                                                         args.start_seed)
                trainer, iters = trainers[(algo, env)]
                if env == "pgmap":
                    # per-seed procedural map (the reference's start_seed
                    # grid draws a different PG map per seed); scene shapes
                    # are padded to a fixed signature so the cached jit
                    # program is reused across seeds
                    kw = {"map_seed": seed}
                    if algo == "copo":
                        kw["lcf_enabled"] = True
                    new_scene, new_cfg = make_scene(env, **kw)
                    # the jitted phases closed over env_cfg at trace time:
                    # a swapped cfg may differ ONLY in the scene_kwargs
                    # metadata stamp, or the compiled program would silently
                    # ignore it (r4 advice)
                    import dataclasses as _dc
                    assert _dc.replace(
                        new_cfg, scene_kwargs=trainer.env_cfg.scene_kwargs
                    ) == trainer.env_cfg, (
                        "per-seed env_cfg diverged beyond scene_kwargs; "
                        "rebuild the trainer instead of swapping the scene")
                    trainer.scene, trainer.env_cfg = new_scene, new_cfg
                if trial_done(tdir, iters):
                    print(f"=== {trial}: done, skipping", flush=True)
                    continue
                t0 = time.time()
                out = run_trial(trainer, iters, tdir, checkpoint_freq=200,
                                keep_checkpoints=3, verbose=False,
                                init_key=jax.random.PRNGKey(seed))
                m = out["metrics"]
                print(f"=== {trial}: best={out['best_success']:.3f} "
                      f"final succ={m['success']:.3f} crash={m['crash']:.3f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
    print_table(args.root)
