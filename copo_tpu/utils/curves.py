"""Training-curve postprocessing for plotting and the benchmark table.

Parity: `preprocess_trainig_data.py:14-113` (SURVEY.md §2.1 item 23) — parse
each trial's result.json, flatten nested dicts, interpolate every numeric
column onto a common `env_steps` grid; and the benchmark-table statistic
(`benchmarks/MetaDrive-0.2.5/README.md:27-31`): per-seed max over training,
mean (std) over seeds.
"""

from __future__ import annotations

import json
import os

import numpy as np


def _flatten(d: dict, prefix="") -> dict:
    out = {}
    for k, v in d.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def parse_trial(trial_dir: str) -> dict:
    """Read result.json rows -> {column: np.array}."""
    path = os.path.join(trial_dir, "result.json")
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(_flatten(json.loads(line)))
    cols = {}
    keys = set().union(*[set(r) for r in rows]) if rows else set()
    for k in keys:
        vals = [r.get(k, np.nan) for r in rows]
        try:
            cols[k] = np.asarray(vals, dtype=np.float64)
        except (TypeError, ValueError):
            pass
    return cols


def interpolate_on_grid(trials: list[dict], x_key: str = "env_steps",
                        num_points: int = 200) -> dict:
    """Interpolate each trial's curves onto a shared x grid (parse -> smooth
    pipeline of the reference)."""
    xmax = min(t[x_key].max() for t in trials if x_key in t)
    grid = np.linspace(0, xmax, num_points)
    out = {x_key: grid}
    common = set.intersection(*[set(t) for t in trials]) - {x_key}
    for k in common:
        ys = [np.interp(grid, t[x_key], t[k]) for t in trials]
        out[k] = np.stack(ys)          # (num_trials, num_points)
    return out


def benchmark_table(exp_root: str, metric: str = "success",
                    discard_frac: float = 0.0) -> dict:
    """Per-env success statistic: per-seed max over training, mean/std over
    seeds (CL discards the first 1.5M of 2M steps -> discard_frac=0.75)."""
    table = {}
    by_env: dict[str, list[float]] = {}
    for trial in sorted(os.listdir(exp_root)):
        tdir = os.path.join(exp_root, trial)
        if not os.path.isdir(tdir) or not os.path.exists(
            os.path.join(tdir, "result.json")
        ):
            continue
        cols = parse_trial(tdir)
        if metric not in cols:
            continue
        y = cols[metric]
        y = y[int(len(y) * discard_frac):]
        y = y[np.isfinite(y)]
        if len(y) == 0:
            continue
        env = trial.split("_seed")[0]
        by_env.setdefault(env, []).append(float(y.max()))
    for env, vals in by_env.items():
        table[env] = {
            "mean": float(np.mean(vals)),
            "std": float(np.std(vals)),
            "num_seeds": len(vals),
        }
    return table
