"""Route-following math: projection, progress, lateral offset, lookahead.

Replaces MetaDrive's per-vehicle lane localization (C++ road network queries)
with ONE row gather per agent into the precomputed window table
`SceneData.route_win` (consecutive waypoints around the tracked index, baked
at scene-compile time). Cost is O(window) per agent instead of O(route
length), the gather is a contiguous (W+1, 2) row (TPU-friendly), and monotone
progress is robust on self-intersecting routes (roundabout loops).
"""

from __future__ import annotations

import jax.numpy as jnp

from copo_tpu.envs.geometry import WAYPOINT_SPACING, WINDOW_BACK, WINDOW_SIZE
from copo_tpu.envs.scene import SceneData


def _window_rows(scene: SceneData, route_idx, anchor):
    """Gather the baked waypoint windows: (..., WINDOW_SIZE+1, 2).

    Row k holds route_xy[route, clip(anchor - WINDOW_BACK + k, 0, n_valid-1)];
    out-of-range entries are clamped duplicates (zero-length segments)."""
    P = scene.route_win.shape[1]
    flat = scene.route_win.reshape((-1,) + scene.route_win.shape[2:])
    return flat[route_idx * P + jnp.clip(anchor, 0, P - 1)]


def locate_on_route(scene: SceneData, route_idx, waypoint_idx, pos):
    """Project agent position onto its route near the tracked waypoint.

    Args (per agent slot, any leading dims):
      route_idx (...,) int32, waypoint_idx (...,) int32, pos (..., 2)
    Returns (new_waypoint_idx, s, lateral, lane_heading):
      s: arc-length progress (m); lateral: signed offset (+ = left of dir).
    """
    n_valid = scene.route_n_valid[route_idx]                        # (...,)
    win = _window_rows(scene, route_idx, waypoint_idx)              # (..., W+1, 2)
    wp_a = win[..., :-1, :]                                         # (..., W, 2)
    wp_b = win[..., 1:, :]

    offs = jnp.arange(WINDOW_SIZE)                                  # (W,)
    # global segment index of window slot k (clamped duplicates share the
    # last real segment's index; they are demoted below and never win)
    seg_i = jnp.clip(
        waypoint_idx[..., None] - WINDOW_BACK + offs, 0, n_valid[..., None] - 2
    )                                                               # (..., W)

    d = wp_b - wp_a                                                 # (..., W, 2)
    seg_len2 = jnp.sum(d * d, axis=-1)                              # (..., W)
    rel = pos[..., None, :] - wp_a                                  # (..., W, 2)
    t = jnp.sum(rel * d, axis=-1) / jnp.maximum(seg_len2, 1e-8)
    t = jnp.clip(t, 0.0, 1.0)
    proj = wp_a + t[..., None] * d
    dist2 = jnp.sum((pos[..., None, :] - proj) ** 2, axis=-1)       # (..., W)
    # Degenerate (clamped-duplicate) segments lose ties to real ones.
    dist2 = jnp.where(seg_len2 > 1e-6, dist2, dist2 + 1e6)

    best = jnp.argmin(dist2, axis=-1)                               # (...,)
    # winner selection as a one-hot contraction over the W=8 window — six
    # minor-axis take_along_axis gathers cost ~0.5 ms/step at B=512, the
    # masked sums fuse into the producers for free
    hot = (offs == best[..., None]).astype(t.dtype)                 # (..., W)
    take = lambda arr: jnp.sum(arr * hot, axis=-1)
    best_seg = jnp.sum(seg_i * hot.astype(seg_i.dtype), axis=-1)
    best_t = take(t)
    best_d = jnp.sum(d * hot[..., None], axis=-2)                   # (..., 2)
    best_rel = pos - jnp.sum(wp_a * hot[..., None], axis=-2)

    s = (best_seg.astype(jnp.float32) + best_t) * WAYPOINT_SPACING
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(best_d * best_d, axis=-1), 1e-8))
    lane_heading = jnp.arctan2(best_d[..., 1], best_d[..., 0])
    # signed lateral: cross(dir, rel) > 0 means pos is left of travel direction
    lateral = (best_d[..., 0] * best_rel[..., 1] - best_d[..., 1] * best_rel[..., 0]) * inv_len
    return best_seg, s, lateral, lane_heading


def route_point_at(scene: SceneData, route_idx, s):
    """Position, heading, and curvature on a route at arc length s (clamped).

    Gathers only the 3 points it needs — window slots WINDOW_BACK..+2 of
    the baked route_win table, sliced BEFORE the gather so the row is 6
    floats instead of 18. `s` may carry extra trailing batch dims (with
    `route_idx` broadcast against them): navi batches its 4 queries per
    agent into one call — 4 gather ops -> 1 (r5 bisect: the navi block was
    ~23% of the rollout step at B=512)."""
    n_valid = scene.route_n_valid[route_idx]
    max_seg = n_valid - 2
    raw = s / WAYPOINT_SPACING
    seg = jnp.clip(raw.astype(jnp.int32), 0, max_seg)
    t = jnp.clip(raw - seg.astype(jnp.float32), 0.0, 1.0)

    P = scene.route_win.shape[1]
    flat3 = scene.route_win[:, :, WINDOW_BACK:WINDOW_BACK + 3, :].reshape(
        (-1, 3, 2))
    win = flat3[route_idx * P + jnp.clip(seg, 0, P - 1)]   # (..., 3, 2)
    a = win[..., 0, :]
    b = win[..., 1, :]
    c = win[..., 2, :]
    point = a + t[..., None] * (b - a)
    d1 = b - a
    d2 = c - b
    heading = jnp.arctan2(d1[..., 1], d1[..., 0])
    next_heading = jnp.arctan2(d2[..., 1], d2[..., 0])
    dh = jnp.arctan2(jnp.sin(next_heading - heading), jnp.cos(next_heading - heading))
    curvature = dh / WAYPOINT_SPACING
    return point, heading, curvature
