"""SceneData — a compiled scene as a pytree of fixed-shape device arrays.

The MetaDrive dependency the reference steps through (Panda3D scene graph +
Bullet physics, see SURVEY.md §2.4) is replaced by this static compilation:
routes are uniform-arc-length waypoint arrays, static obstacles are baked into
a (H, W, A) lidar distance field, and spawn points are sets of (route, s0)
options sharing one physical location. The jitted engine touches scenes only
through gathers on these arrays.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp
from flax import struct

from copo_tpu.envs import geometry as geo


@struct.dataclass
class SceneData:
    """Compiled static scene. All leaves are device arrays; shapes are static.

    Shapes: R routes x P waypoints; S spawn points x RMAX route options;
    (H, W, A) lidar field.
    """

    # --- routes ---
    route_xy: jnp.ndarray        # (R, P, 2) uniform-spacing waypoints, tail-padded
    route_len: jnp.ndarray       # (R,) drivable arc length
    route_n_valid: jnp.ndarray   # (R,) number of valid waypoints
    route_left_width: jnp.ndarray   # (R, P) road-edge distance left of centerline (obs)
    route_right_width: jnp.ndarray  # (R, P) road-edge distance right of centerline (obs)
    # Out-of-road ejection bounds: the road edge plus the body-contact slack
    # (wall_margin / profile_slack). MetaDrive OBSERVES the distance to the
    # road edge but EJECTS only once the body overlaps the curb/sidewalk —
    # the two must be separate tables or policies equilibrate against a
    # shifted edge and ride the ejection line (r4 cross-eval diagnosis).
    route_left_bound: jnp.ndarray   # (R, P)
    route_right_bound: jnp.ndarray  # (R, P)
    # Localization window table: route_win[r, p, k] = route_xy[r, clip(p -
    # WINDOW_BACK + k, 0, n_valid[r]-1)], k = 0..WINDOW_SIZE. Lets the hot
    # locate_on_route gather ONE contiguous (WINDOW_SIZE+1, 2) row per agent
    # instead of 2 x WINDOW_SIZE scattered point gathers (TPU gathers are
    # row-oriented; this was the single largest cost of the env step at
    # B=512: 2.9 of 7.9 ms).
    route_win: jnp.ndarray          # (R, P, WINDOW_SIZE+1, 2)

    # --- navigation checkpoints (MetaDrive navigates via road-BLOCK
    #     boundary nodes: the first dims of the navi block project the next
    #     two checkpoints into the ego frame; (R, C) arc lengths per route,
    #     padded with route_len) ---
    route_ckpt_s: jnp.ndarray    # (R, C)
    # Baked checkpoint table [s, x, y, curv] per checkpoint — positions plus
    # the representative curvature of the segment ENDING at each checkpoint
    # (median of polyline curvature samples over the segment — MetaDrive's
    # checkpoint lanes are StraightLane / CircularLane with CONSTANT
    # curvature, so a per-segment constant is both more faithful than
    # midpoint polyline sampling (resampling noise; see observation.
    # CURV_EPS) and removes the navi block's per-step route_point_at window
    # gathers). ONE fused row-gather per agent: TPU gathers carry a fixed
    # per-op cost, so navi reads this single (C, 4) row and does its
    # checkpoint selection as one-hot contractions over the tiny C axis
    # (navi was ~28% of the rollout step at B=512 even with 3 split
    # tables — the op count, not the bytes, was the cost).
    route_ckpt_tab: jnp.ndarray   # (R, C, 4)

    # --- spawn points (destination == end of assigned route) ---
    spawn_xy: jnp.ndarray        # (S, 2) physical spawn location
    spawn_heading: jnp.ndarray   # (S,) initial heading
    spawn_routes: jnp.ndarray    # (S, RMAX) int32 candidate route ids, padded
    spawn_route_s: jnp.ndarray   # (S, RMAX) float32 arc-length of this point on route
    spawn_n_routes: jnp.ndarray  # (S,) int32 number of valid candidates

    # --- static lidar field ---
    lidar_field: jnp.ndarray     # (H, W, A) distance to nearest wall, capped
    field_origin: jnp.ndarray    # (2,) xmin, ymin
    field_cell: jnp.ndarray      # () cell size in meters

    # --- misc ---
    walls: jnp.ndarray           # (Wn, 4) segments (lidar bake input; kept for viz/debug)
    bbox: jnp.ndarray            # (4,) xmin, xmax, ymin, ymax
    # special zone (tollgate plaza / bottleneck throat): xmin, xmax, ymin, ymax;
    # all-zeros = no zone
    zone: jnp.ndarray            # (4,)

    @property
    def num_routes(self) -> int:
        return self.route_xy.shape[0]

    @property
    def num_spawns(self) -> int:
        return self.spawn_xy.shape[0]

    @property
    def num_lidar_angles(self) -> int:
        return self.lidar_field.shape[2]


@dataclasses.dataclass(frozen=True)
class SceneBuildSpec:
    """Host-side inputs to `compile_scene` (plain numpy, not a pytree).

    `spawns` is a list of spawn points; each is a non-empty list of
    (route_idx, s0) options that share one physical location (e.g. the routes
    turning left / straight / right from the same entry-lane position).
    """

    routes: list            # list of (Ki, 2) polylines (raw, any spacing)
    # Per route: float (symmetric), (left, right) tuple, a piecewise
    # profile [(s_start, left, right), ...] (sorted by s_start; the entry
    # active at arc length s defines the corridor there), or a callable
    # prof(s (K,), xy (K, 2)) -> (cl (K,), cr (K,)) for corridors bounded by
    # ABSOLUTE geometry (e.g. a yellow line at fixed world y while the
    # route centerline migrates across lanes). The compiled
    # corridor is additionally clamped to the physical walls minus a
    # half-vehicle margin (MetaDrive semantics: crossing a yellow line /
    # leaving the lane set = out_of_road, hitting a sidewalk = crash_sidewalk
    # -> out_of_road; SURVEY.md §2.2 `_is_out_of_road`).
    half_widths: list
    spawns: list            # list[list[(route_idx, s0)]]
    walls: np.ndarray       # (Wn, 4) static wall segments
    bbox: tuple             # (xmin, xmax, ymin, ymax)
    lidar_cell: float = 1.0
    lidar_angles: int = 72
    lidar_range: float = 40.0
    zone: tuple | None = None    # (xmin, xmax, ymin, ymax) special scene zone
    # Per-route navigation checkpoint arc lengths (segment-boundary nodes,
    # ascending; the route end is appended automatically). None = a single
    # checkpoint at the route end.
    checkpoints: list | None = None
    # Fixed-shape knobs for per-seed generated scenes (PG maps): force the
    # padded waypoint count / checkpoint slots / wall rows so every seed
    # compiles to the same SceneData shapes (jit cache hit instead of a
    # recompile per seed).
    pad_waypoints: int = 0
    pad_checkpoints: int = 0
    pad_walls: int = 0
    # Clearance kept between the vehicle center and a physical wall before
    # out-of-road fires. NEGATIVE extends the drivable corridor past the
    # wall face: MetaDrive ejects on BODY-sidewalk contact (crash_sidewalk),
    # so the vehicle center can ride ~half a vehicle width beyond the curb
    # line before the event fires. Cross-eval: a +0.4 margin ejected the
    # reference's curb-hugging policies 1.3 m early (r3/r4 roundabout
    # diagnosis); -0.9 = half the 1.85 m body width.
    wall_margin: float = -0.9
    # Slack added to the CONFIGURED half-width profiles (left, right) before
    # the wall clamp. Convention in the directional scenes: left = yellow
    # center line (painted line — the reference's flag fires around the
    # vehicle center crossing it, keep exact), right = curb face (body
    # contact, same slack rationale as wall_margin). One-directional scenes
    # whose left edge is also a curb pass (0.9, 0.9).
    profile_slack: tuple = (0.0, 0.9)


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    """Pad (K, D) to (max(K, n), D) by repeating the last row (a repeated
    wall segment is geometrically inert)."""
    if n <= len(a):
        return a
    return np.concatenate([a, np.repeat(a[-1:], n - len(a), axis=0)], axis=0)


def _interp_on_route(route: np.ndarray, s: float) -> tuple[np.ndarray, float]:
    """Position and heading at arc length s on a uniform-spacing route."""
    spacing = geo.WAYPOINT_SPACING
    idx = int(np.clip(s / spacing, 0, len(route) - 2))
    t = s / spacing - idx
    p = route[idx] * (1 - t) + route[idx + 1] * t
    d = route[idx + 1] - route[idx]
    return p.astype(np.float32), float(np.arctan2(d[1], d[0]))


def compile_scene(spec: SceneBuildSpec) -> SceneData:
    """Compile a SceneBuildSpec to device-ready arrays (runs once, on host)."""
    resampled = [geo.resample_polyline(r) for r in spec.routes]
    route_xy, route_len, n_valid = geo.pad_routes(resampled, spec.pad_waypoints)

    S = len(spec.spawns)
    RMAX = max(len(opts) for opts in spec.spawns)
    spawn_xy = np.zeros((S, 2), dtype=np.float32)
    spawn_heading = np.zeros((S,), dtype=np.float32)
    spawn_routes = np.zeros((S, RMAX), dtype=np.int32)
    spawn_route_s = np.zeros((S, RMAX), dtype=np.float32)
    spawn_n = np.zeros((S,), dtype=np.int32)
    for i, opts in enumerate(spec.spawns):
        assert len(opts) >= 1
        ri0, s0 = opts[0]
        spawn_xy[i], spawn_heading[i] = _interp_on_route(resampled[ri0], s0)
        spawn_n[i] = len(opts)
        for j in range(RMAX):
            ri, sj = opts[min(j, len(opts) - 1)]  # pad by repeating last option
            spawn_routes[i, j] = ri
            spawn_route_s[i, j] = sj

    # navigation checkpoint table, padded with route_len
    R = len(resampled)
    cks = []
    for i in range(R):
        base = list(spec.checkpoints[i]) if spec.checkpoints else []
        if not base or base[-1] < route_len[i] - 1.0:
            base.append(float(route_len[i]))
        cks.append(base)
    C = max(max(len(c) for c in cks), spec.pad_checkpoints)
    ckpt_s = np.zeros((R, C), np.float32)
    for i, c in enumerate(cks):
        ckpt_s[i, :len(c)] = c
        ckpt_s[i, len(c):] = route_len[i]
    ckpt_s = np.minimum(ckpt_s, route_len[:, None])

    # per-waypoint corridor widths: configured profile ANDed with the
    # perpendicular wall raycast. Two tables: road-edge distances (obs) and
    # ejection bounds (road edge + body-contact slack).
    P = route_xy.shape[1]
    lw = np.zeros((len(resampled), P), np.float32)
    rw = np.zeros((len(resampled), P), np.float32)
    lb = np.zeros((len(resampled), P), np.float32)
    rb = np.zeros((len(resampled), P), np.float32)
    for i, r in enumerate(resampled):
        prof = spec.half_widths[i]
        s = np.arange(len(r)) * geo.WAYPOINT_SPACING
        if callable(prof):
            cl, cr = prof(s, r)
            cl = np.asarray(cl, np.float64)
            cr = np.asarray(cr, np.float64)
        elif isinstance(prof, (int, float)):
            cl = np.full(len(r), float(prof))
            cr = np.full(len(r), float(prof))
        elif isinstance(prof, (tuple, list)) and len(prof) == 2 \
                and isinstance(prof[0], (int, float)):
            cl = np.full(len(r), float(prof[0]))
            cr = np.full(len(r), float(prof[1]))
        else:  # piecewise [(s_start, left, right), ...]
            pieces = sorted(prof)
            cl = np.full(len(r), float(pieces[0][1]))
            cr = np.full(len(r), float(pieces[0][2]))
            for s_start, l_val, r_val in pieces:
                sel = s >= s_start
                cl[sel], cr[sel] = float(l_val), float(r_val)
        wall_l, wall_r = geo.perp_wall_distances(r, spec.walls)
        ls, rs = spec.profile_slack
        lw_i = np.minimum(cl, np.maximum(wall_l, 1.0))
        rw_i = np.minimum(cr, np.maximum(wall_r, 1.0))
        lb_i = np.minimum(cl + ls, np.maximum(wall_l - spec.wall_margin, 1.0))
        rb_i = np.minimum(cr + rs, np.maximum(wall_r - spec.wall_margin, 1.0))
        lw[i, :len(r)] = lw_i
        rw[i, :len(r)] = rw_i
        lw[i, len(r):] = lw_i[-1]
        rw[i, len(r):] = rw_i[-1]
        lb[i, :len(r)] = lb_i
        rb[i, :len(r)] = rb_i
        lb[i, len(r):] = lb_i[-1]
        rb[i, len(r):] = rb_i[-1]

    field, origin = geo.bake_lidar_field(
        spec.walls, spec.bbox, spec.lidar_cell, spec.lidar_angles, spec.lidar_range
    )

    # localization window table (see SceneData.route_win)
    R = route_xy.shape[0]
    Wp1 = geo.WINDOW_SIZE + 1
    p_idx = np.arange(P)[:, None]                       # (P, 1)
    k_idx = np.arange(Wp1)[None, :]                     # (1, W+1)
    route_win = np.zeros((R, P, Wp1, 2), dtype=np.float32)
    for r in range(R):
        pts = np.clip(p_idx - geo.WINDOW_BACK + k_idx, 0, int(n_valid[r]) - 1)
        route_win[r] = route_xy[r][pts]

    # baked navi checkpoint positions + per-segment curvature
    # (see SceneData.route_ckpt_xy/route_ckpt_curv)
    C2 = ckpt_s.shape[1]
    ckpt_xy = np.zeros((R, C2, 2), np.float32)
    ckpt_curv = np.zeros((R, C2), np.float32)
    for r in range(R):
        pts = route_xy[r][: int(n_valid[r])]
        seg_d = np.diff(pts.astype(np.float64), axis=0)
        h = np.arctan2(seg_d[:, 1], seg_d[:, 0])
        dh = np.arctan2(np.sin(np.diff(h)), np.cos(np.diff(h)))
        curv = dh / geo.WAYPOINT_SPACING                 # (n_valid-2,)
        prev = 0.0
        for c in range(C2):
            s_ck = float(ckpt_s[r, c])
            ckpt_xy[r, c], _ = _interp_on_route(pts.astype(np.float32), s_ck)
            # NET-SWEEP curvature: wrap(heading_end - heading_start) over the
            # segment length — exactly MetaDrive's block encoding (bend dims
            # carry the block's sweep angle). For CircularLane segments this
            # IS the curvature; for S-shaped transition segments (the
            # bottleneck funnel, lane merges) the net sweep is ~0 so they
            # read straight, as the shipped policies expect. A median or a
            # point sample picks up one lobe of the S and steers policies
            # into the wall (r5 regression: bottleneck CoPO 0.92 -> 0.64
            # before this was caught).
            # boundary headings sampled just OUTSIDE the segment (the
            # polyline piece ending at prev / starting at s_ck): with
            # tangent-continuous joins an S-curve nets exactly 0 and an arc
            # nets its full turn; interior sampling leaves a spurious
            # residual on transition segments
            i0 = int(np.clip(np.ceil(prev / geo.WAYPOINT_SPACING) - 1, 0,
                             len(h) - 1)) if len(h) else 0
            i1 = int(np.clip(np.floor(s_ck / geo.WAYPOINT_SPACING), i0,
                             len(h) - 1)) if len(h) else 0
            if len(h) and s_ck > prev + 1e-6:
                sweep = np.arctan2(np.sin(h[i1] - h[i0]), np.cos(h[i1] - h[i0]))
                ckpt_curv[r, c] = float(sweep / max(s_ck - prev, 1e-6))
            else:
                ckpt_curv[r, c] = 0.0
            prev = s_ck

    return SceneData(
        route_xy=jnp.asarray(route_xy),
        route_len=jnp.asarray(route_len),
        route_n_valid=jnp.asarray(n_valid),
        route_left_width=jnp.asarray(lw), route_right_width=jnp.asarray(rw),
        route_left_bound=jnp.asarray(lb), route_right_bound=jnp.asarray(rb),
        route_win=jnp.asarray(route_win),
        route_ckpt_s=jnp.asarray(ckpt_s),
        route_ckpt_tab=jnp.asarray(np.concatenate(
            [ckpt_s[..., None], ckpt_xy, ckpt_curv[..., None]],
            axis=-1).astype(np.float32)),
        spawn_xy=jnp.asarray(spawn_xy),
        spawn_heading=jnp.asarray(spawn_heading),
        spawn_routes=jnp.asarray(spawn_routes),
        spawn_route_s=jnp.asarray(spawn_route_s),
        spawn_n_routes=jnp.asarray(spawn_n),
        lidar_field=jnp.asarray(field),
        field_origin=jnp.asarray(origin),
        field_cell=jnp.asarray(np.float32(spec.lidar_cell)),
        walls=jnp.asarray(_pad_rows(
            np.asarray(spec.walls, dtype=np.float32).reshape(-1, 4),
            spec.pad_walls)),
        bbox=jnp.asarray(np.asarray(spec.bbox, dtype=np.float32)),
        zone=jnp.asarray(np.asarray(
            spec.zone if spec.zone is not None else (0.0, 0.0, 0.0, 0.0),
            dtype=np.float32,
        )),
    )
