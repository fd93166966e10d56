"""Centralized-critic observation fusion (CCPPO) as batched masked gathers.

Parity (SURVEY.md §2.3 item 9, `torch_copo/algo_ccppo.py:225-311`):
  cc_obs layout [ego_obs | fused_nei_obs | fused_nei_act]
  "concat": K=num_neighbours nearest-by-distance slots, zero-padded
  "mf":     masked mean over neighbours within mf_nei_distance
  "none":   ego obs only
  counterfactual=True appends neighbour actions (never the ego action).

The reference fills cc_obs in trajectory postprocessing by matching
`batch["t"]` across RLlib agent batches (`algo_ccppo.py:244-251`); here
everything is time-aligned by construction — fusion happens inside the
rollout step on the (B, N, ...) state, one gather instead of a python loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    fuse_mode: str = "mf"            # "concat" | "mf" | "none"
    num_neighbours: int = 4
    mf_nei_distance: float = 10.0
    counterfactual: bool = True      # include neighbour actions


def cc_obs_dim(obs_dim: int, act_dim: int, fc: FusionConfig) -> int:
    """Reference formula (`algo_ccppo.py:55-71`)."""
    if fc.fuse_mode == "concat":
        k = fc.num_neighbours
    elif fc.fuse_mode == "mf":
        k = 1
    elif fc.fuse_mode == "none":
        k = 0
    else:
        raise ValueError(fc.fuse_mode)
    dim = (k + 1) * obs_dim
    if fc.counterfactual:
        dim += k * act_dim
    return dim


def make_cc_obs_fn(fc: FusionConfig, neighbours_distance: float):
    """Build the rollout-time cc-obs function (scene, cfg, states, obs, act)."""

    if fc.fuse_mode == "none":
        def fn_none(scene, cfg, states, obs, actions):
            return obs
        return fn_none

    def fn(scene, cfg, states, obs, actions):
        # obs (B, N, D), actions (B, N, A); fuse per env instance
        pos = states.pos                                  # (B, N, 2)
        valid = states.alive                              # (B, N)
        N = pos.shape[1]
        d2 = jnp.sum((pos[:, :, None, :] - pos[:, None, :, :]) ** 2, axis=-1)
        pair_ok = valid[:, :, None] & valid[:, None, :] & ~jnp.eye(N, dtype=bool)

        if fc.fuse_mode == "mf":
            mask = pair_ok & (d2 < fc.mf_nei_distance**2)  # (B, N, N)
            w = mask.astype(obs.dtype)
            denom = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
            mean_obs = jnp.einsum("bij,bjd->bid", w, obs) / denom
            parts = [obs, mean_obs]
            if fc.counterfactual:
                mean_act = jnp.einsum("bij,bja->bia", w, actions) / denom
                parts.append(mean_act)
            return jnp.concatenate(parts, axis=-1)

        # concat: K nearest within neighbours_distance, distance-sorted.
        # Layout deviation vs reference (documented): we emit
        # [ego | nei_obs x K | nei_act x K] rather than interleaving
        # (obs, act) per neighbour slot — an input permutation, equivalent
        # for the MLP critic (cc models are not part of the npz interchange).
        B, _, D = obs.shape
        K = fc.num_neighbours
        d2_masked = jnp.where(pair_ok & (d2 < neighbours_distance**2), d2, jnp.inf)
        neg, idx = jax.lax.top_k(-d2_masked, K)             # (B, N, K)
        slot_ok = jnp.isfinite(neg)                         # padded slots -> False
        flat_idx = idx.reshape(B, N * K)
        nei_obs = jnp.take_along_axis(obs, flat_idx[..., None], axis=1)
        nei_obs = nei_obs.reshape(B, N, K, D)
        nei_obs = jnp.where(slot_ok[..., None], nei_obs, 0.0)
        parts = [obs, nei_obs.reshape(B, N, K * D)]
        if fc.counterfactual:
            A = actions.shape[-1]
            nei_act = jnp.take_along_axis(actions, flat_idx[..., None], axis=1)
            nei_act = nei_act.reshape(B, N, K, A)
            nei_act = jnp.where(slot_ok[..., None], nei_act, 0.0)
            parts.append(nei_act.reshape(B, N, K * A))
        return jnp.concatenate(parts, axis=-1)

    return fn
