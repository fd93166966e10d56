"""Bottleneck scene (TPU-native MultiAgentBottleneckEnv).

Reference: `MultiAgentBottleneckEnv` (metadrive 0.2.5), 20 agents, obs 96 =
91 + 5 scene extras (SURVEY.md §2.2 npz shapes). A one-directional 4-lane
road funnels into 2 lanes and expands back; agents must negotiate the merge.
The 5 extra obs dims are a static-detector block: 4 side-detector beams +
1 in-throat flag (information-equivalent of MetaDrive's side-detector
channels, whose exact semantics live outside the reference repo).
"""

from __future__ import annotations

import numpy as np

from copo_tpu.envs import geometry as geo
from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.scene import SceneBuildSpec, compile_scene

LANE_W = 3.5
ENTRY_LANES = (-5.25, -1.75, 1.75, 5.25)   # 4 entry lane offsets
NARROW_LANES = (-1.75, 1.75)               # 2 lanes in the bottleneck
X_ENTRY_END = 50.0
X_NARROW_START = 70.0
X_NARROW_END = 110.0
X_EXPAND_END = 130.0
X_EXIT_END = 185.0


def _route(lane_idx: int):
    y_in = ENTRY_LANES[lane_idx]
    y_mid = NARROW_LANES[0] if y_in < 0 else NARROW_LANES[1]
    entry = geo.straight((0.0, y_in), (X_ENTRY_END, y_in))
    funnel = geo.hermite((X_ENTRY_END, y_in), (1, 0), (X_NARROW_START, y_mid), (1, 0), n=16)
    narrow = geo.straight((X_NARROW_START, y_mid), (X_NARROW_END, y_mid))
    expand = geo.hermite((X_NARROW_END, y_mid), (1, 0), (X_EXPAND_END, y_in), (1, 0), n=16)
    exit_ = geo.straight((X_EXPAND_END, y_in), (X_EXIT_END, y_in))
    return geo.join_polylines(entry, funnel, narrow, expand, exit_)


def _walls():
    wide, nar = 7.0, 3.5
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


def build_bottleneck(num_agents: int | None = None, **cfg_overrides):
    num_agents = 20 if num_agents is None else num_agents

    routes = [_route(i) for i in range(4)]
    # lateral sign: + = left of +x travel = +y; left width = to the +7 edge
    half_widths = [(7.0 - y, 7.0 + y) for y in ENTRY_LANES]

    spawns = []
    for i in range(4):
        for s0 in (4.0, 14.0, 24.0, 34.0, 44.0):
            spawns.append([(i, s0)])

    cfg_overrides.setdefault("obs_extra_dim", 5)
    cfg_overrides.setdefault("obs_extra_kind", "detector")
    spec = SceneBuildSpec(
        routes=routes,
        half_widths=half_widths,
        spawns=spawns,
        walls=_walls(),
        bbox=(-5.0, X_EXIT_END + 5, -14.0, 14.0),
        zone=(X_NARROW_START, X_NARROW_END, -3.5, 3.5),
    )
    scene = compile_scene(spec)
    cfg = EnvConfig(num_agents=num_agents, **cfg_overrides)
    return scene, cfg
