"""Orbax checkpointing: single-artifact save/restore of full TrainState.

Parity + upgrade over the reference's three formats (SURVEY.md §5
"Checkpoint / resume"): RLlib's pickled worker state, distilled npz policies
(see eval/npz.py), and the LCF distribution recovered from progress.csv. Here
ONE checkpoint holds params + optimizer + LCF params + env states + rng, so
resume is exact; npz export stays a separate distribution artifact.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, state, step: int):
    """Save TrainState under ckpt_dir/step_<n> (overwrites that step)."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, state_template):
    """Restore a TrainState saved by save_checkpoint (template gives pytree
    structure/shapes — use trainer.init_state())."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=state_template)


def restore_params(path: str):
    """Restore only the policy params pytree from a TrainState checkpoint.

    Template-free (PyTreeCheckpointer restores the raw stored tree), so eval
    tooling can load any trial's checkpoint without knowing its num_envs /
    optimizer layout (the reference's eval likewise loads just policy weights,
    `eval.py:66-139`)."""
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    meta = ckptr.metadata(path)
    # restore as host numpy: ignores the stored device sharding, so a
    # TPU-written checkpoint loads anywhere (CPU eval, different topology)
    restore_args = jax.tree_util.tree_map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta.item_metadata
    )
    tree = ckptr.restore(path, restore_args=restore_args)
    return tree["params"]


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                pass
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps)[1])
