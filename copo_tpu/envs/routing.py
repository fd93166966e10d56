"""Route-following math: projection, progress, lateral offset, lookahead.

Replaces MetaDrive's per-vehicle lane localization (C++ road network queries)
with windowed gathers on the compiled route arrays. Each agent tracks its last
waypoint index; projection searches a fixed window of segments around it, so
cost is O(window) per agent instead of O(route length), and monotone progress
is robust on self-intersecting routes (roundabout loops).
"""

from __future__ import annotations

import jax.numpy as jnp

from copo_tpu.envs.geometry import WAYPOINT_SPACING
from copo_tpu.envs.scene import SceneData

#: segments inspected behind/ahead of the tracked waypoint each step
WINDOW_BACK = 2
WINDOW_SIZE = 8


def locate_on_route(scene: SceneData, route_idx, waypoint_idx, pos):
    """Project agent position onto its route near the tracked waypoint.

    Args (per agent slot, any leading dims):
      route_idx (...,) int32, waypoint_idx (...,) int32, pos (..., 2)
    Returns (new_waypoint_idx, s, lateral, lane_heading):
      s: arc-length progress (m); lateral: signed offset (+ = left of dir).
    """
    P = scene.route_xy.shape[1]
    n_valid = scene.route_n_valid[route_idx]                       # (...,)
    start = jnp.clip(waypoint_idx - WINDOW_BACK, 0, P - 2)

    offs = jnp.arange(WINDOW_SIZE)                                  # (W,)
    seg_i = jnp.clip(start[..., None] + offs, 0, n_valid[..., None] - 2)  # (..., W)
    wp_a = scene.route_xy[route_idx[..., None], seg_i]              # (..., W, 2)
    wp_b = scene.route_xy[route_idx[..., None], seg_i + 1]          # (..., W, 2)

    d = wp_b - wp_a                                                 # (..., W, 2)
    seg_len2 = jnp.sum(d * d, axis=-1)                              # (..., W)
    rel = pos[..., None, :] - wp_a                                  # (..., W, 2)
    t = jnp.sum(rel * d, axis=-1) / jnp.maximum(seg_len2, 1e-8)
    t = jnp.clip(t, 0.0, 1.0)
    proj = wp_a + t[..., None] * d
    dist2 = jnp.sum((pos[..., None, :] - proj) ** 2, axis=-1)       # (..., W)
    # Degenerate (padded / clipped-duplicate) segments lose ties to real ones.
    dist2 = jnp.where(seg_len2 > 1e-6, dist2, dist2 + 1e6)

    best = jnp.argmin(dist2, axis=-1)                               # (...,)
    take = lambda arr: jnp.take_along_axis(arr, best[..., None], axis=-1)[..., 0]
    best_seg = take(seg_i)
    best_t = take(t)
    best_d = jnp.stack([take(d[..., 0]), take(d[..., 1])], axis=-1)
    best_rel = pos - jnp.stack([take(wp_a[..., 0]), take(wp_a[..., 1])], axis=-1)

    s = (best_seg.astype(jnp.float32) + best_t) * WAYPOINT_SPACING
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(best_d * best_d, axis=-1), 1e-8))
    lane_heading = jnp.arctan2(best_d[..., 1], best_d[..., 0])
    # signed lateral: cross(dir, rel) > 0 means pos is left of travel direction
    lateral = (best_d[..., 0] * best_rel[..., 1] - best_d[..., 1] * best_rel[..., 0]) * inv_len
    return best_seg, s, lateral, lane_heading


def route_point_at(scene: SceneData, route_idx, s):
    """Position, heading, and curvature on a route at arc length s (clamped)."""
    n_valid = scene.route_n_valid[route_idx]
    max_seg = n_valid - 2
    raw = s / WAYPOINT_SPACING
    seg = jnp.clip(raw.astype(jnp.int32), 0, max_seg)
    t = jnp.clip(raw - seg.astype(jnp.float32), 0.0, 1.0)

    a = scene.route_xy[route_idx, seg]
    b = scene.route_xy[route_idx, seg + 1]
    c = scene.route_xy[route_idx, jnp.clip(seg + 2, 0, n_valid - 1)]
    point = a + t[..., None] * (b - a)
    d1 = b - a
    d2 = c - b
    heading = jnp.arctan2(d1[..., 1], d1[..., 0])
    next_heading = jnp.arctan2(d2[..., 1], d2[..., 0])
    dh = jnp.arctan2(jnp.sin(next_heading - heading), jnp.cos(next_heading - heading))
    curvature = dh / WAYPOINT_SPACING
    return point, heading, curvature
