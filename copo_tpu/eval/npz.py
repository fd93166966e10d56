"""npz policy interchange with the reference checkpoint formats.

The reference ships best-policy weights as npz in two layouts consumed by
`eval/get_policy_function.py:53-137`:
  TF:    "{policy}/fc_1{suffix}/kernel|bias", fc_2, fc_out — kernel (in, out)
  torch: "_hidden_layers.{0,1}._model.0.weight|bias", "_logits._model.0.*"
         — weight (out, in)
Our policy tower is the same 2x256-tanh MLP, so weights round-trip exactly:
`export_policy_npz` writes either layout; `load_policy_npz` reads both (and
our own), enabling cross-validation against the shipped reference agents.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def export_policy_npz(params: dict, path: str, layout: str = "tf",
                      policy_name: str = "default", suffix: str = "",
                      lcf_dist: tuple | None = None):
    """Write the policy tower to npz in a reference-compatible layout.

    `lcf_dist=(mean, std)` embeds the learned LCF distribution an
    LCF-conditioned policy was trained under (the reference loses this —
    it recovers LCF from progress.csv or a hard-coded lookup table,
    `get_policy_function_from_checkpoint.py:53-63`; storing it in the
    artifact makes the npz self-contained for re-evaluation)."""
    layers = params["policy"]
    assert len(layers) == 3, "reference npz layout is 2 hidden + output"
    out = {}
    if layout == "tf":
        names = [f"fc_1{suffix}", f"fc_2{suffix}", f"fc_out{suffix}"]
        for name, lyr in zip(names, layers):
            out[f"{policy_name}/{name}/kernel"] = np.asarray(lyr["w"])
            out[f"{policy_name}/{name}/bias"] = np.asarray(lyr["b"])
    elif layout == "torch":
        names = ["_hidden_layers.0._model.0", "_hidden_layers.1._model.0",
                 "_logits._model.0"]
        for name, lyr in zip(names, layers):
            out[f"{name}.weight"] = np.asarray(lyr["w"]).T
            out[f"{name}.bias"] = np.asarray(lyr["b"])
    else:
        raise ValueError(layout)
    if lcf_dist is not None:
        out["lcf_dist"] = np.asarray(lcf_dist, dtype=np.float32)
    np.savez(path, **out)


def load_policy_npz(path: str) -> dict:
    """Read a policy npz (either reference layout) into our params format.

    Returns {"policy": [{"w", "b"} x3]} with w in (in, out) orientation;
    plus "lcf_dist": (mean, std) when the npz embeds its LCF distribution
    (our exports do — see `export_policy_npz`).
    """
    raw = np.load(path)
    files = set(raw.files)

    def tf_keys():
        for key in files:
            if key.endswith("/kernel") and "fc_1" in key:
                prefix, mid, _ = key.split("/")
                suffix = mid[len("fc_1"):]
                return prefix, suffix
        return None

    tk = tf_keys()
    layers = []
    if tk is not None:
        prefix, suffix = tk
        for name in (f"fc_1{suffix}", f"fc_2{suffix}", f"fc_out{suffix}"):
            layers.append({
                "w": jnp.asarray(raw[f"{prefix}/{name}/kernel"]),
                "b": jnp.asarray(raw[f"{prefix}/{name}/bias"]),
            })
    else:
        for name in ("_hidden_layers.0._model.0", "_hidden_layers.1._model.0",
                     "_logits._model.0"):
            layers.append({
                "w": jnp.asarray(raw[f"{name}.weight"]).T,
                "b": jnp.asarray(raw[f"{name}.bias"]),
            })
    params = {"policy": layers}
    if "lcf_dist" in files:
        mean, std = np.asarray(raw["lcf_dist"], dtype=np.float64)
        params["lcf_dist"] = (float(mean), float(std))
    return params
