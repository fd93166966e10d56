"""Bottleneck scene (TPU-native MultiAgentBottleneckEnv).

Reference: `MultiAgentBottleneckEnv` (metadrive 0.2.5), 20 agents, obs 96
(SURVEY.md §2.2 npz shapes). A BIDIRECTIONAL road — MetaDrive's spawn_roads
include the negative counterpart road — with 4 lanes per direction
(map_config bottle_lane_num=4) funnelling into ONE neck lane per direction
(neck_lane_num=1, neck_length=20) adjacent to the yellow center line, then
expanding back. Each direction's 4-lane stream must single-file through its
neck while oncoming traffic runs on the other side of the line — the reason
the reference's success band is only 15-60%, and why its shipped policies
merge LEFT toward the line on spawn (cross-eval-diagnosed r4: on a
one-directional variant with a center neck they dove straight into the left
wall).

Obs layout: [side-detector 4 | ego core 6 | lane-line detector 4 | navi 10 |
lidar 72] = 96 — MetaDrive's vehicle_config side_detector(num_lasers=4,
distance=50) + lane_line_detector(num_lasers=4, distance=20) REPLACE the two
boundary dims / the lane-offset dim (layout confirmed by the shipped npz
first-layer weight-norm block structure).
"""

from __future__ import annotations

import numpy as np

from copo_tpu.envs import geometry as geo
from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.scene import SceneBuildSpec, compile_scene

LANE_W = 3.5
#: per-direction entry lane offsets (+x direction, right-hand traffic:
#: lanes at negative y, leftmost = adjacent to the yellow line at y=0)
ENTRY_LANES = (-1.75, -5.25, -8.75, -12.25)
NECK_Y = -1.75                 # the single neck lane hugs the yellow line
ROAD_HW = 4 * LANE_W           # 14: each direction spans y in (0, -14)
X_ENTRY_END = 62.0
X_NARROW_START = 70.0          # 8 m funnel: lanes END at the merge boundary
X_NARROW_END = 90.0            # neck_length = 20 (MetaDrive)
X_EXPAND_END = 110.0
X_EXIT_END = 165.0


def _route(lane_idx: int):
    """+x-direction route from entry lane through the neck and back."""
    y_in = ENTRY_LANES[lane_idx]
    entry = geo.straight((0.0, y_in), (X_ENTRY_END, y_in))
    funnel = geo.hermite((X_ENTRY_END, y_in), (1, 0), (X_NARROW_START, NECK_Y), (1, 0), n=16)
    narrow = geo.straight((X_NARROW_START, NECK_Y), (X_NARROW_END, NECK_Y))
    expand = geo.hermite((X_NARROW_END, NECK_Y), (1, 0), (X_EXPAND_END, y_in), (1, 0), n=16)
    exit_ = geo.straight((X_EXPAND_END, y_in), (X_EXIT_END, y_in))
    poly = geo.join_polylines(entry, funnel, narrow, expand, exit_)
    return poly, geo.cum_boundaries(entry, funnel, narrow, expand, exit_)


def _mirror(poly: np.ndarray) -> np.ndarray:
    """Map a +x-direction polyline to the oncoming (-x) direction."""
    out = np.asarray(poly, np.float32).copy()
    out[:, 0] = X_EXIT_END - out[:, 0]
    out[:, 1] = -out[:, 1]
    return out


def _walls():
    wide, nar = ROAD_HW, LANE_W  # outer edge; neck outer walls at |y|=3.5
    def edge(sign):
        pts = np.array([
            (0.0, sign * wide),
            (X_ENTRY_END, sign * wide),
            (X_NARROW_START, sign * nar),
            (X_NARROW_END, sign * nar),
            (X_EXPAND_END, sign * wide),
            (X_EXIT_END, sign * wide),
        ], np.float32)
        return geo.polyline_to_walls(pts)
    cap_in = geo.polyline_to_walls(np.array([(0.0, -wide), (0.0, wide)], np.float32))
    cap_out = geo.polyline_to_walls(np.array([(X_EXIT_END, -wide), (X_EXIT_END, wide)], np.float32))
    return np.concatenate([edge(1), edge(-1), cap_in, cap_out], axis=0)


def build_bottleneck(num_agents: int | None = None, bidirectional: bool = True,
                     line_slack: float = 0.0, **cfg_overrides):
    num_agents = 20 if num_agents is None else num_agents

    routes, half_widths = [], []

    def corridor(sign):
        # Corridor bounded by the ABSOLUTE yellow line at y=0 on the left
        # and the (tapering) walls on the right: left width = distance from
        # the route centerline to the line wherever the centerline sits —
        # route-relative constants ejected early lane-changers mid-road.
        def prof(s, xy):
            to_line = np.maximum(sign * -xy[:, 1], 0.5)
            return to_line, np.full(len(xy), 2.0 * ROAD_HW)
        return prof

    checkpoints = []
    dirs = ((1.0, 0), (-1.0, 1)) if bidirectional else ((1.0, 0),)
    n_dirs = len(dirs)
    for i in range(4):
        fwd, cks = _route(i)
        for sign, d in dirs:
            routes.append(fwd if d == 0 else _mirror(fwd))
            half_widths.append(corridor(sign))
            checkpoints.append(cks)

    spawns = []
    for i in range(4):
        for s0 in (4.0, 14.0, 24.0, 34.0, 44.0):
            for d in range(n_dirs):
                spawns.append([(n_dirs * i + d, s0)])

    cfg_overrides.setdefault("side_detector_lasers", 4)
    cfg_overrides.setdefault("side_detector_distance", 50.0)
    cfg_overrides.setdefault("lane_line_lasers", 4)
    cfg_overrides.setdefault("lane_line_distance", 20.0)
    spec = SceneBuildSpec(
        routes=routes,
        half_widths=half_widths,
        spawns=spawns,
        walls=_walls(),
        bbox=(-5.0, X_EXIT_END + 5, -ROAD_HW - 4.0, ROAD_HW + 4.0),
        zone=(X_NARROW_START, X_NARROW_END, -LANE_W, LANE_W),
        checkpoints=checkpoints,
        profile_slack=(line_slack, 0.9),
        lidar_range=50.0,   # side-detector range (field bake cap)
    )
    scene = compile_scene(spec)
    cfg = EnvConfig(num_agents=num_agents, **cfg_overrides)
    return scene, cfg
