"""Experiment harness: the Ray Tune replacement (train loop + sweeps).

Parity: `copo_code/copo/train/train.py:11-117` + `torch_copo/utils/train.py`
(SURVEY.md §2.1 items 14-15): per-trial progress.csv + result.json rows,
params.json, periodic checkpoints keeping the top-K by success rate, a
CLIReporter-style console table with the reference's columns
(`success/crash/out/max_step/length/cost/rc`), seed sweeps
(`seed = i*100 + start_seed`, `train/train.py:56`), and insurance pickling of
trial dataframes. Sequential trials instead of a Ray cluster — one TPU chip
runs a trial orders of magnitude faster than the reference's worker fleet.
"""

from __future__ import annotations

import csv
import dataclasses
import json
import os
import pickle
import time

import jax
import numpy as np

from copo_tpu.runtime.checkpoint import save_checkpoint
from copo_tpu.utils.pretty import SafeFallbackEncoder

REPORT_COLUMNS = [
    "iter", "env_steps", "success", "crash", "out", "max_step",
    "length", "cost", "rc", "reward", "kl", "entropy",
]


def _row_from_metrics(it, env_steps, m):
    g = lambda k: float(np.asarray(m[k])) if k in m else float("nan")
    return {
        "iter": it,
        "env_steps": env_steps,
        "success": g("success_rate"),
        "crash": g("crash_rate"),
        "out": g("out_of_road_rate"),
        "max_step": g("max_step_rate"),
        "length": g("episode_length"),
        "cost": g("episode_cost"),
        "rc": g("route_completion"),
        "reward": g("episode_reward"),
        "kl": g("kl"),
        "entropy": g("entropy"),
    }


class TrialLogger:
    """progress.csv + result.json writer for one trial directory."""

    def __init__(self, trial_dir: str, params: dict):
        os.makedirs(trial_dir, exist_ok=True)
        self.dir = trial_dir
        self.csv_path = os.path.join(trial_dir, "progress.csv")
        self.json_path = os.path.join(trial_dir, "result.json")
        self._csv_file = None
        self._writer = None
        with open(os.path.join(trial_dir, "params.json"), "w") as f:
            json.dump(params, f, indent=2, cls=SafeFallbackEncoder)

    def log(self, metrics: dict):
        flat = {k: (float(np.asarray(v)) if not isinstance(v, (int, float, str))
                    else v) for k, v in metrics.items()}
        if self._writer is None:
            self._csv_file = open(self.csv_path, "w", newline="")
            self._writer = csv.DictWriter(self._csv_file, fieldnames=sorted(flat))
            self._writer.writeheader()
        self._writer.writerow({k: flat.get(k, "") for k in self._writer.fieldnames})
        self._csv_file.flush()
        with open(self.json_path, "a") as f:
            f.write(json.dumps(flat, cls=SafeFallbackEncoder) + "\n")

    def close(self):
        if self._csv_file:
            self._csv_file.close()


def run_trial(trainer, num_iters: int, trial_dir: str, *,
              checkpoint_freq: int = 10, keep_checkpoints: int = 5,
              log_every: int = 1, verbose: bool = True, state=None) -> dict:
    """Train one trial to completion with logging + top-K checkpointing."""
    cfg_dict = dataclasses.asdict(trainer.cfg)
    env_dict = dataclasses.asdict(trainer.env_cfg)
    logger = TrialLogger(trial_dir, {"trainer": cfg_dict, "env": env_dict,
                                     "algo": type(trainer).__name__})
    state = trainer.init_state() if state is None else state
    kept: list[tuple[float, str]] = []   # (success, path)
    env_steps = 0
    t0 = time.time()
    best_success = 0.0

    if verbose:
        print(" | ".join(f"{c:>9}" for c in REPORT_COLUMNS))

    last_metrics = {}
    for it in range(1, num_iters + 1):
        if hasattr(trainer, "apply_curriculum"):
            state, _ = trainer.apply_curriculum(state, it - 1)
        state, metrics = trainer.train_iter(state)
        env_steps += int(float(np.asarray(metrics["env_steps_this_iter"])))
        row = _row_from_metrics(it, env_steps, metrics)
        last_metrics = {**row,
                        **{k: v for k, v in metrics.items() if k not in row},
                        "time_total_s": time.time() - t0}
        if it % log_every == 0:
            logger.log(last_metrics)
        if verbose and (it % log_every == 0):
            print(" | ".join(
                f"{row[c]:9.3f}" if isinstance(row[c], float) else f"{row[c]:>9}"
                for c in REPORT_COLUMNS
            ))

        if checkpoint_freq and it % checkpoint_freq == 0:
            success = row["success"] if np.isfinite(row["success"]) else 0.0
            best_success = max(best_success, success)
            path = save_checkpoint(os.path.join(trial_dir, "checkpoints"),
                                   state, it)
            kept.append((success, path))
            kept.sort(key=lambda x: -x[0])
            for _, old in kept[keep_checkpoints:]:
                import shutil
                shutil.rmtree(old, ignore_errors=True)
            kept = kept[:keep_checkpoints]

    # checkpoint_at_end (train/train.py:102)
    save_checkpoint(os.path.join(trial_dir, "checkpoints"), state, num_iters)
    logger.close()
    with open(os.path.join(trial_dir, "final_metrics.pkl"), "wb") as f:
        pickle.dump(last_metrics, f)
    return {"state": state, "metrics": last_metrics, "best_success": best_success}


def sweep(make_trainer, exp_name: str, *, envs: list, num_seeds: int = 1,
          start_seed: int = 5000, num_iters: int = 100, root: str = "results",
          **trial_kwargs):
    """Grid sweep over envs x seeds (reference: 6 envs x 8 seeds via Tune).

    make_trainer(env_name, seed) -> trainer. Seeds follow the reference rule
    seed_i = i*100 + start_seed (`train/train.py:56`).
    """
    exp_dir = os.path.join(root, exp_name)
    os.makedirs(exp_dir, exist_ok=True)
    results = {}
    for env_name in envs:
        for i in range(num_seeds):
            seed = i * 100 + start_seed
            trial = f"{exp_name}_{env_name}_seed{seed}"
            trainer = make_trainer(env_name, seed)
            print(f"=== trial {trial} ===")
            out = run_trial(trainer, num_iters,
                            os.path.join(exp_dir, trial), **trial_kwargs)
            results[trial] = out["metrics"]
    with open(os.path.join(exp_dir, "sweep_summary.json"), "w") as f:
        json.dump(results, f, indent=2, cls=SafeFallbackEncoder)
    return results
