"""Experiment harness: the Ray Tune replacement (train loop + sweeps).

Parity: `copo_code/copo/train/train.py:11-117` + `torch_copo/utils/train.py`
(SURVEY.md §2.1 items 14-15): per-trial progress.csv + result.json rows,
params.json, periodic checkpoints keeping the top-K by a windowed success
score (the reference keeps top-K by the smoother `episode_reward_mean`,
`train/train.py:97-103`), a CLIReporter-style console table with the
reference's columns (`success/crash/out/max_step/length/cost/rc`), seed
sweeps (`seed = i*100 + start_seed`, `train/train.py:56`), auto-resume from
the latest checkpoint (Tune `max_failures=1`, `train/train.py:104`), and
insurance pickling of trial dataframes. Sequential trials instead of a Ray
cluster — one TPU chip runs a trial orders of magnitude faster than the
reference's worker fleet.
"""

from __future__ import annotations

import csv
import dataclasses
import json
import os
import pickle
import shutil
import time

import jax
import numpy as np

from copo_tpu.runtime.checkpoint import (latest_checkpoint, restore_checkpoint,
                                         save_checkpoint)
from copo_tpu.utils.pretty import SafeFallbackEncoder

REPORT_COLUMNS = [
    "iter", "env_steps", "success", "crash", "out", "max_step",
    "length", "cost", "rc", "reward", "kl", "entropy",
]

#: episode window for smoothed rates. RLlib smooths every episode metric over
#: the trailing 100 episodes (`metrics_num_episodes_for_smoothing`), and the
#: published table takes the per-seed max of that smoothed success curve —
#: matching the statistic matters as much as matching the policy (a raw
#: per-iteration rate over ~25 episodes both inflates "best" and starves the
#: top-K checkpoint score).
SMOOTH_EPISODES = 100

#: per-iter episode metrics folded into the smoothing window: (sum-key, rate)
_SMOOTHED = {
    "success": "success_rate",
    "crash": "crash_rate",
    "out": "out_of_road_rate",
    "max_step": "max_step_rate",
    "length": "episode_length",
    "cost": "episode_cost",
    "rc": "route_completion",
    "reward": "episode_reward",
}


class EpisodeSmoother:
    """Trailing-window mean over the last ~SMOOTH_EPISODES finished agent
    episodes, accumulated from per-iteration (rate, episode-count) pairs."""

    def __init__(self, window: int = SMOOTH_EPISODES):
        self.window = window
        self._hist: list[tuple[float, dict]] = []   # (n_episodes, {col: (sum, w)})

    def update(self, metrics: dict) -> dict:
        n = float(np.asarray(metrics.get("episodes_this_iter", 0.0)))
        if n > 0:
            sums = {}
            for col, key in _SMOOTHED.items():
                v = float(np.asarray(metrics.get(key, np.nan)))
                # a non-finite per-iteration rate EXCLUDES this iteration
                # from that column's window (weight 0) — folding it in as
                # sum 0 / weight n would deflate the smoothed value
                sums[col] = (v * n, n) if np.isfinite(v) else (0.0, 0.0)
            self._hist.append((n, sums))
            while sum(h[0] for h in self._hist[1:]) >= self.window:
                self._hist.pop(0)
        out = {}
        for col in _SMOOTHED:
            w = sum(h[1][col][1] for h in self._hist)
            out[col] = (
                sum(h[1][col][0] for h in self._hist) / w if w > 0
                else float("nan")
            )
        return out


def _row_from_metrics(it, env_steps, m, smoothed):
    g = lambda k: float(np.asarray(m[k])) if k in m else float("nan")
    return {
        "iter": it,
        "env_steps": env_steps,
        **smoothed,
        "kl": g("kl"),
        "entropy": g("entropy"),
    }


class TrialLogger:
    """progress.csv + result.json writer for one trial directory."""

    def __init__(self, trial_dir: str, params: dict, resume: bool = False):
        os.makedirs(trial_dir, exist_ok=True)
        self.dir = trial_dir
        self.csv_path = os.path.join(trial_dir, "progress.csv")
        self.json_path = os.path.join(trial_dir, "result.json")
        self._csv_file = None
        self._writer = None
        self._resume = resume and os.path.exists(self.csv_path)
        with open(os.path.join(trial_dir, "params.json"), "w") as f:
            json.dump(params, f, indent=2, cls=SafeFallbackEncoder)

    def log(self, metrics: dict):
        flat = {k: (float(np.asarray(v)) if not isinstance(v, (int, float, str))
                    else v) for k, v in metrics.items()}
        if self._writer is None:
            if self._resume:
                with open(self.csv_path) as f:
                    fields = f.readline().strip().split(",")
                self._csv_file = open(self.csv_path, "a", newline="")
                self._writer = csv.DictWriter(self._csv_file, fieldnames=fields)
            else:
                self._csv_file = open(self.csv_path, "w", newline="")
                self._writer = csv.DictWriter(self._csv_file,
                                              fieldnames=sorted(flat))
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
              log_every: int = 1, verbose: bool = True, state=None,
              resume: bool = True, init_key=None,
              wandb_project: str | None = None) -> dict:
    """Train one trial to completion with logging + top-K checkpointing.

    With `resume` (default), a trial directory holding checkpoints continues
    from the latest one (the reference restarts crashed trials from their
    last checkpoint via Tune `max_failures=1`, `train/train.py:104`).

    `init_key` seeds the fresh initial state when no checkpoint exists —
    sweeps reuse ONE trainer instance across seeds (so the jitted iteration
    compiles once) and vary only this key.
    """
    cfg_dict = dataclasses.asdict(trainer.cfg)
    env_dict = dataclasses.asdict(trainer.env_cfg)

    start_it = 0
    if state is None and resume:
        ckpt_dir = os.path.join(trial_dir, "checkpoints")
        latest = latest_checkpoint(ckpt_dir) if os.path.isdir(ckpt_dir) else None
        if latest is not None:
            template = trainer.init_state()
            state = restore_checkpoint(latest, template)
            start_it = int(np.asarray(state.iteration))
            if verbose:
                print(f"resumed from {latest} at iteration {start_it}")
    logger = TrialLogger(trial_dir, {"trainer": cfg_dict, "env": env_dict,
                                     "algo": type(trainer).__name__},
                         resume=start_it > 0)
    wb = None
    if wandb_project:
        # reference parity: optional W&B logging of every result row
        # (`torch_copo/utils/train.py:113-176`); offline-first here —
        # see utils/wandb_log.py
        from copo_tpu.utils.wandb_log import wandb_init
        wb = wandb_init(wandb_project, os.path.basename(trial_dir),
                        {"trainer": cfg_dict, "env": env_dict},
                        root=trial_dir)
    state = trainer.init_state(init_key) if state is None else state
    kept: list[tuple[float, str]] = []   # (score, path)
    env_steps = 0
    t0 = time.time()
    best_success = 0.0
    smoother = EpisodeSmoother()

    if verbose:
        print(" | ".join(f"{c:>9}" for c in REPORT_COLUMNS))

    last_metrics = {}
    for it in range(start_it + 1, num_iters + 1):
        if hasattr(trainer, "apply_curriculum"):
            state, _ = trainer.apply_curriculum(state, it - 1)
        state, metrics = trainer.train_iter(state)
        # ONE host transfer for the whole metrics dict (per-scalar fetches
        # cost a tunnel round-trip each on remote-attached TPU)
        metrics = jax.device_get(metrics)
        env_steps += int(float(np.asarray(metrics["env_steps_this_iter"])))
        smoothed = smoother.update(metrics)
        row = _row_from_metrics(it, env_steps, metrics, smoothed)
        if np.isfinite(row["success"]):
            best_success = max(best_success, row["success"])
        last_metrics = {**row,
                        **{k: v for k, v in metrics.items() if k not in row},
                        "time_total_s": time.time() - t0}
        if it % log_every == 0:
            logger.log(last_metrics)
            if wb is not None:
                wb.log({k: v for k, v in last_metrics.items()
                        if isinstance(v, (int, float))}, step=it)
        if verbose and (it % log_every == 0):
            print(" | ".join(
                f"{row[c]:9.3f}" if isinstance(row[c], float) else f"{row[c]:>9}"
                for c in REPORT_COLUMNS
            ))

        if checkpoint_freq and it % checkpoint_freq == 0:
            # 100-episode smoothed success: robust to per-iteration noise
            score = row["success"] if np.isfinite(row["success"]) else 0.0
            path = save_checkpoint(os.path.join(trial_dir, "checkpoints"),
                                   state, it)
            kept.append((score, path))
            kept.sort(key=lambda x: -x[0])
            for _, old in kept[keep_checkpoints:]:
                shutil.rmtree(old, ignore_errors=True)
            kept = kept[:keep_checkpoints]

    # checkpoint_at_end (train/train.py:102)
    save_checkpoint(os.path.join(trial_dir, "checkpoints"), state, num_iters)
    logger.close()
    if wb is not None:
        wb.finish()
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
