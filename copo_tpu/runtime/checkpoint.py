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


def _key_name(k) -> str:
    """Name of one key-path entry, independent of its pytree-key flavour.

    The stored tree (a serialized dict) flattens with DictKey entries while a
    TrainState template flattens with GetAttrKey / SequenceKey entries — their
    str() forms differ ("['iteration']" vs ".iteration"), so raw-string
    comparison matches nothing. Compare by the underlying name instead."""
    for attr in ("key", "name", "idx"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def _norm_path(kp) -> tuple:
    return tuple(_key_name(k) for k in kp)


def restore_checkpoint(path: str, state_template):
    """Restore a TrainState saved by save_checkpoint (template gives pytree
    structure/shapes — use trainer.init_state()).

    Forward-compatible: leaves present in the checkpoint overlay the template
    where path and shape match; fields added to the state after the
    checkpoint was written keep their template (init) values, so old trials
    resume across state-layout evolution."""
    import jax.numpy as jnp
    from jax.tree_util import tree_flatten_with_path, tree_unflatten

    stored = {
        _norm_path(kp): v
        for kp, v in tree_flatten_with_path(_restore_tree(path))[0]
    }
    leaves, treedef = tree_flatten_with_path(state_template)
    out = []
    n_restored = 0
    for kp, tmpl in leaves:
        v = stored.get(_norm_path(kp))
        if v is not None and tuple(v.shape) == tuple(tmpl.shape):
            out.append(jnp.asarray(v, dtype=tmpl.dtype))
            n_restored += 1
        else:
            out.append(tmpl)
    if n_restored == 0 and leaves:
        raise ValueError(
            f"restore_checkpoint({path}): 0/{len(leaves)} leaves matched the "
            "template — checkpoint/state layout mismatch, refusing to resume "
            "from an init template."
        )
    return tree_unflatten(treedef, out)


def _restore_tree(path: str):
    """Restore the raw stored pytree as host numpy (topology-independent)."""
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    meta = ckptr.metadata(path)
    restore_args = jax.tree_util.tree_map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta.item_metadata
    )
    return ckptr.restore(path, restore_args=restore_args)


def restore_params(path: str):
    """Restore only the policy params pytree from a TrainState checkpoint.

    Template-free (PyTreeCheckpointer restores the raw stored tree), so eval
    tooling can load any trial's checkpoint without knowing its num_envs /
    optimizer layout (the reference's eval likewise loads just policy weights,
    `eval.py:66-139`)."""
    return _restore_tree(path)["params"]


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
