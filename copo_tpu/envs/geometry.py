"""Host-side (numpy) geometry builders for scene compilation.

The reference drives MetaDrive, whose maps are lane graphs evaluated lazily by
Panda3D/Bullet C++ code per vehicle per step. The TPU-native design instead
*compiles* each scene once, on host, into fixed-shape arrays (polyline routes
resampled at uniform arc-length spacing, wall segments, and a precomputed
static-lidar distance field) that the jitted engine consumes with pure gathers
— no host round-trips, no dynamic shapes.

Everything here runs once at build time; nothing is jitted.
"""

from __future__ import annotations

import numpy as np

#: uniform arc-length spacing (meters) of resampled route waypoints
WAYPOINT_SPACING = 2.0

#: localization window: segments inspected behind/ahead of the tracked
#: waypoint each step (consumed by routing.locate_on_route and baked into
#: SceneData.route_win at scene-compile time)
WINDOW_BACK = 2
WINDOW_SIZE = 8


def resample_polyline(points: np.ndarray, spacing: float = WAYPOINT_SPACING) -> np.ndarray:
    """Resample a polyline (K,2) at uniform arc-length `spacing`.

    Returns (P,2) with P = floor(total_len/spacing)+1; always includes the
    first point; the last sample sits at total_len rounded down to spacing
    (callers treat route length as (P-1)*spacing).
    """
    points = np.asarray(points, dtype=np.float64)
    assert points.ndim == 2 and points.shape[1] == 2 and len(points) >= 2
    seg = np.diff(points, axis=0)
    seg_len = np.linalg.norm(seg, axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    total = cum[-1]
    n = int(np.floor(total / spacing)) + 1
    s = np.arange(n) * spacing
    x = np.interp(s, cum, points[:, 0])
    y = np.interp(s, cum, points[:, 1])
    return np.stack([x, y], axis=1).astype(np.float32)


def straight(p0, p1, step: float = 1.0) -> np.ndarray:
    """Dense polyline from p0 to p1."""
    p0 = np.asarray(p0, dtype=np.float64)
    p1 = np.asarray(p1, dtype=np.float64)
    n = max(2, int(np.ceil(np.linalg.norm(p1 - p0) / step)) + 1)
    t = np.linspace(0.0, 1.0, n)[:, None]
    return (p0[None] * (1 - t) + p1[None] * t).astype(np.float32)


def arc(center, radius: float, a0: float, a1: float, step_deg: float = 3.0) -> np.ndarray:
    """Dense polyline along a circular arc from angle a0 to a1 (radians)."""
    center = np.asarray(center, dtype=np.float64)
    n = max(2, int(np.ceil(abs(np.degrees(a1 - a0)) / step_deg)) + 1)
    ang = np.linspace(a0, a1, n)
    return (center[None] + radius * np.stack([np.cos(ang), np.sin(ang)], axis=1)).astype(np.float32)


def hermite(p0, d0, p1, d1, n: int = 16) -> np.ndarray:
    """Cubic Hermite blend from p0 (tangent dir d0) to p1 (tangent dir d1).

    Tangent-continuous transition curve (used to merge lanes onto ring
    roads / ramps). Tangent magnitudes are scaled by the chord length.
    """
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    d0 = np.asarray(d0, np.float64)
    d1 = np.asarray(d1, np.float64)
    d0 = d0 / (np.linalg.norm(d0) + 1e-12)
    d1 = d1 / (np.linalg.norm(d1) + 1e-12)
    chord = np.linalg.norm(p1 - p0)
    m0, m1 = d0 * chord, d1 * chord
    t = np.linspace(0.0, 1.0, n)[:, None]
    h00 = 2 * t**3 - 3 * t**2 + 1
    h10 = t**3 - 2 * t**2 + t
    h01 = -2 * t**3 + 3 * t**2
    h11 = t**3 - t**2
    return (h00 * p0 + h10 * m0 + h01 * p1 + h11 * m1).astype(np.float32)


def arclen(points: np.ndarray) -> float:
    """Total arc length of a polyline."""
    seg = np.diff(np.asarray(points, np.float64), axis=0)
    return float(np.linalg.norm(seg, axis=1).sum())


def cum_boundaries(*parts: np.ndarray) -> list:
    """Cumulative end-arclengths of consecutive polyline pieces (the
    navigation checkpoint positions at segment joins)."""
    out, acc = [], 0.0
    for part in parts:
        acc += arclen(part)
        out.append(acc)
    return out


def join_polylines(*parts: np.ndarray) -> np.ndarray:
    """Concatenate polyline parts, dropping duplicated joints."""
    out = [np.asarray(parts[0], dtype=np.float32)]
    for p in parts[1:]:
        p = np.asarray(p, dtype=np.float32)
        if np.linalg.norm(out[-1][-1] - p[0]) < 1e-4:
            p = p[1:]
        out.append(p)
    return np.concatenate(out, axis=0)


def offset_polyline(points: np.ndarray, offset: float) -> np.ndarray:
    """Offset a polyline laterally by `offset` meters (+ = left of travel dir)."""
    points = np.asarray(points, dtype=np.float64)
    seg = np.diff(points, axis=0)
    seg = seg / (np.linalg.norm(seg, axis=1, keepdims=True) + 1e-9)
    # normals at vertices: average of adjacent segment normals
    normals = np.stack([-seg[:, 1], seg[:, 0]], axis=1)
    vert_n = np.vstack([normals[:1], 0.5 * (normals[1:] + normals[:-1]), normals[-1:]])
    vert_n = vert_n / (np.linalg.norm(vert_n, axis=1, keepdims=True) + 1e-9)
    return (points + offset * vert_n).astype(np.float32)


def polyline_to_walls(points: np.ndarray) -> np.ndarray:
    """Convert a polyline (K,2) into wall segments (K-1,4) [x1,y1,x2,y2]."""
    points = np.asarray(points, dtype=np.float32)
    return np.concatenate([points[:-1], points[1:]], axis=1)


def rect_walls(cx, cy, hx, hy, angle: float = 0.0) -> np.ndarray:
    """Axis-aligned (or rotated) rectangle outline as 4 wall segments."""
    c, s = np.cos(angle), np.sin(angle)
    corners = np.array([[-hx, -hy], [hx, -hy], [hx, hy], [-hx, hy]], dtype=np.float64)
    rot = corners @ np.array([[c, s], [-s, c]])
    pts = rot + np.array([cx, cy])
    pts = np.vstack([pts, pts[:1]]).astype(np.float32)
    return polyline_to_walls(pts)


def ray_segment_distances(origins: np.ndarray, angles: np.ndarray, walls: np.ndarray,
                          max_dist: float) -> np.ndarray:
    """Min ray->wall distance for each (origin, angle) pair; vectorized numpy.

    origins: (C,2); angles: (A,); walls: (W,4). Returns (C,A) float32 in
    [0, max_dist]. Used only at scene-compile time to bake the static lidar
    field sampled by the jitted engine.
    """
    origins = np.asarray(origins, dtype=np.float32)
    walls = np.asarray(walls, dtype=np.float32)
    C, A, W = len(origins), len(angles), len(walls)
    p = walls[:, 0:2]
    e = walls[:, 2:4] - walls[:, 0:2]

    # angle-independent pieces, (C, W) float32
    po_x = p[None, :, 0] - origins[:, None, 0]
    po_y = p[None, :, 1] - origins[:, None, 1]
    cross_po_e = po_x * e[None, :, 1] - po_y * e[None, :, 0]

    out = np.empty((C, A), dtype=np.float32)
    for a in range(A):
        dx, dy = np.float32(np.cos(angles[a])), np.float32(np.sin(angles[a]))
        denom = dx * e[:, 1] - dy * e[:, 0]  # (W,)
        safe = np.where(np.abs(denom) > 1e-9, denom, np.float32(1.0))
        inv = np.where(np.abs(denom) > 1e-9, np.float32(1.0) / safe, np.float32(0.0))
        t = cross_po_e * inv[None, :]
        u = (po_x * dy - po_y * dx) * inv[None, :]
        valid = (inv != 0.0) & (t >= 0.0) & (u >= 0.0) & (u <= 1.0)
        out[:, a] = np.where(valid, t, max_dist).min(axis=1)
    return np.clip(out, 0.0, max_dist)


def perp_wall_distances(waypoints: np.ndarray, walls: np.ndarray,
                        max_dist: float = 60.0) -> tuple[np.ndarray, np.ndarray]:
    """Distance from each waypoint to the nearest wall along the left/right
    perpendicular of the local route direction.

    waypoints: (P, 2) uniform-spacing polyline. Returns (left, right), each
    (P,) float32 in (0, max_dist]. Used at scene-compile time to clamp the
    drivable corridor to the physical walls (MetaDrive's `crash_sidewalk` /
    `on_lane` out-of-road tests resolve against real boundary geometry;
    SURVEY.md §2.2 `_is_out_of_road`).
    """
    waypoints = np.asarray(waypoints, dtype=np.float64)
    d = np.diff(waypoints, axis=0)
    d = np.vstack([d, d[-1:]])
    d = d / (np.linalg.norm(d, axis=1, keepdims=True) + 1e-12)
    left_n = np.stack([-d[:, 1], d[:, 0]], axis=1)  # +90 deg from travel dir

    walls = np.asarray(walls, dtype=np.float64).reshape(-1, 4)
    if len(walls) == 0:
        full = np.full(len(waypoints), max_dist, dtype=np.float32)
        return full, full.copy()
    p = walls[:, 0:2]
    e = walls[:, 2:4] - walls[:, 0:2]

    def cast(dirs):
        # ray o + t*dir vs segment p + u*e; per (waypoint, wall) pair
        po = p[None, :, :] - waypoints[:, None, :]                   # (P, W, 2)
        denom = dirs[:, None, 0] * e[None, :, 1] - dirs[:, None, 1] * e[None, :, 0]
        safe = np.where(np.abs(denom) > 1e-9, denom, 1.0)
        t = (po[..., 0] * e[None, :, 1] - po[..., 1] * e[None, :, 0]) / safe
        u = (po[..., 0] * dirs[:, None, 1] - po[..., 1] * dirs[:, None, 0]) / safe
        valid = (np.abs(denom) > 1e-9) & (t > 0.0) & (u >= 0.0) & (u <= 1.0)
        return np.where(valid, t, max_dist).min(axis=1).astype(np.float32)

    return cast(left_n), cast(-left_n)


_FIELD_CACHE: dict = {}


def bake_lidar_field(walls: np.ndarray, bbox, cell: float, num_angles: int,
                     max_dist: float) -> tuple[np.ndarray, np.ndarray]:
    """Precompute the static-obstacle lidar distance field (cached per geometry).

    Returns (field (H,W,A) float32, origin (2,) float32). field[i,j,a] is the
    distance from cell center (origin + (j+0.5, i+0.5)*cell) along absolute
    angle 2*pi*a/A to the nearest wall, capped at max_dist.
    """
    walls = np.asarray(walls, dtype=np.float32).reshape(-1, 4)
    cache_key = (walls.tobytes(), tuple(np.asarray(bbox, np.float64)), cell, num_angles, max_dist)
    if cache_key in _FIELD_CACHE:
        return _FIELD_CACHE[cache_key]

    # prefer the C++/OpenMP baker (copo_tpu/native); numpy fallback below
    from copo_tpu.native import native_bake_lidar_field
    native = native_bake_lidar_field(walls, bbox, cell, num_angles, max_dist) \
        if len(walls) else None
    if native is not None:
        _FIELD_CACHE[cache_key] = native
        return native

    xmin, xmax, ymin, ymax = bbox
    W = int(np.ceil((xmax - xmin) / cell))
    H = int(np.ceil((ymax - ymin) / cell))
    xs = xmin + (np.arange(W) + 0.5) * cell
    ys = ymin + (np.arange(H) + 0.5) * cell
    gx, gy = np.meshgrid(xs, ys)  # (H,W)
    origins = np.stack([gx.ravel(), gy.ravel()], axis=1)
    angles = 2 * np.pi * np.arange(num_angles) / num_angles
    if len(walls) == 0:
        field = np.full((H, W, num_angles), max_dist, dtype=np.float32)
    else:
        field = ray_segment_distances(origins, angles, walls, max_dist).reshape(H, W, num_angles)
    out = (field, np.array([xmin, ymin], dtype=np.float32))
    _FIELD_CACHE[cache_key] = out
    return out


def pad_routes(routes: list[np.ndarray], min_waypoints: int = 0
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad a list of (Pi,2) uniform-spacing waypoint arrays to (R,P,2).

    Padding repeats the final waypoint so downstream segment math (diff of
    consecutive waypoints) degenerates to zero-length segments past the end.
    `min_waypoints` forces a minimum P so scenes generated per-seed (PG maps)
    share one compiled shape. Returns (route_xy, route_len, n_valid).
    """
    P = max(max(len(r) for r in routes), min_waypoints)
    R = len(routes)
    xy = np.zeros((R, P, 2), dtype=np.float32)
    n_valid = np.zeros((R,), dtype=np.int32)
    length = np.zeros((R,), dtype=np.float32)
    for i, r in enumerate(routes):
        xy[i, :len(r)] = r
        xy[i, len(r):] = r[-1]
        n_valid[i] = len(r)
        length[i] = (len(r) - 1) * WAYPOINT_SPACING
    return xy, length, n_valid
