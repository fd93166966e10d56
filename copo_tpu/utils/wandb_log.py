"""W&B-compatible experiment logger (offline-first).

Parity: the reference's torch harness wires Ray Tune to wandb through three
API generations of callback (`torch_copo/utils/train.py:113-176`,
`train/our_wandb_callbacks*.py` — SURVEY.md §2.1 item 15). This environment
has no network egress and no wandb package, so the default here is an
offline run directory with the same call surface (`init` / `log` /
`finish`); when the real `wandb` package is importable it is used directly
in its own offline mode, and `wandb sync` can upload the runs later.

Offline format: `<dir>/wandb/<run_id>/` with
  config.json           flattened run config
  history.jsonl         one JSON object per `log()` call (adds _step)
  summary.json          last logged value per key (written on finish)

Usage (mirrors wandb):
    run = wandb_init(project="copo", name=trial, config={...})
    run.log({"success": 0.7, "lcf_deg": 12.0})
    run.finish()

The harness calls this automatically when `run_trial(..., wandb_project=)`
is set; nothing is logged otherwise (the reference also gates on
`--wandb`, `torch_copo/utils/train.py:186-199`).
"""

from __future__ import annotations

import json
import os
import time

try:  # real wandb if present (offline mode; zero egress until `wandb sync`)
    import wandb as _wandb
except ImportError:  # the baked image has none — use the local writer
    _wandb = None

from copo_tpu.utils.pretty import SafeFallbackEncoder


class OfflineRun:
    """Minimal wandb.Run stand-in writing the offline format above."""

    def __init__(self, project: str, name: str, config: dict | None,
                 root: str = "."):
        run_id = f"{name}-{int(time.time())}"
        self.dir = os.path.join(root, "wandb", project, run_id)
        os.makedirs(self.dir, exist_ok=True)
        self._hist = open(os.path.join(self.dir, "history.jsonl"), "a")
        self._step = 0
        self._summary: dict = {}
        with open(os.path.join(self.dir, "config.json"), "w") as f:
            json.dump(config or {}, f, indent=2, cls=SafeFallbackEncoder)

    def log(self, metrics: dict, step: int | None = None):
        self._step = self._step + 1 if step is None else step
        row = {"_step": self._step, "_timestamp": time.time(), **metrics}
        self._hist.write(json.dumps(row, cls=SafeFallbackEncoder) + "\n")
        self._hist.flush()
        self._summary.update(metrics)

    def finish(self):
        with open(os.path.join(self.dir, "summary.json"), "w") as f:
            json.dump(self._summary, f, indent=2, cls=SafeFallbackEncoder)
        self._hist.close()


def wandb_init(project: str, name: str, config: dict | None = None,
               root: str = "."):
    """wandb.init with an offline fallback; returns a Run-like object."""
    if _wandb is not None:
        os.environ.setdefault("WANDB_MODE", "offline")
        return _wandb.init(project=project, name=name, config=config,
                           dir=root)
    return OfflineRun(project, name, config, root)
