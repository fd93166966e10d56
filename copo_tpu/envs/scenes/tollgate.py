"""Tollgate scene (TPU-native MultiAgentTollgateEnv).

Reference: `MultiAgentTollgateEnv` (metadrive 0.2.5), 40 agents, obs 156 =
91 + 65 extras (SURVEY.md §2.2; `TollGateObservation` adds lane-detector and
gate-state channels, `algo_svo/svo_env.py:9,32-45`). A 3-lane road widens
into a 6-gate toll plaza (booth walls between gates) and contracts back.
The 65 extra obs dims are a static-detector block: 64 lane/booth detector
beams + 1 in-plaza flag (information-equivalent of MetaDrive's
side/lane-line detector channels, whose exact semantics live outside the
reference repo).

The narrow 4.2 m gates between booth walls force vehicles to slow and queue;
the plaza additionally carries a speed limit with an overspeed penalty
(MetaDrive's block-speed-limit shaping, calibrated equivalent).
"""

from __future__ import annotations

import numpy as np

from copo_tpu.envs import geometry as geo
from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.scene import SceneBuildSpec, compile_scene

LANE_W = 3.5
ENTRY_LANES = (-3.5, 0.0, 3.5)             # 3 entry lanes (one direction)
GATE_W = 4.2
GATE_YS = (-10.5, -6.3, -2.1, 2.1, 6.3, 10.5)   # 6 gate centerlines
X_ENTRY_END = 55.0
X_PLAZA_START = 80.0
X_PLAZA_END = 100.0
X_CONTRACT_END = 125.0
X_EXIT_END = 185.0
ROAD_HW = 5.25
PLAZA_HW = 12.6


#: entry lane -> gates it may use (left lane -> left gates etc.)
LANE_GATES = {0: (0, 1), 1: (2, 3), 2: (4, 5)}


def _route(lane_idx: int, gate_idx: int):
    y_in = ENTRY_LANES[lane_idx]
    y_gate = GATE_YS[gate_idx]
    entry = geo.straight((0.0, y_in), (X_ENTRY_END, y_in))
    widen = geo.hermite((X_ENTRY_END, y_in), (1, 0), (X_PLAZA_START, y_gate), (1, 0), n=18)
    gate = geo.straight((X_PLAZA_START, y_gate), (X_PLAZA_END, y_gate))
    contract = geo.hermite((X_PLAZA_END, y_gate), (1, 0), (X_CONTRACT_END, y_in), (1, 0), n=18)
    exit_ = geo.straight((X_CONTRACT_END, y_in), (X_EXIT_END, y_in))
    return geo.join_polylines(entry, widen, gate, contract, exit_)


def _walls():
    parts = []

    def edge(sign):
        pts = np.array([
            (0.0, sign * ROAD_HW),
            (X_ENTRY_END, sign * ROAD_HW),
            (X_PLAZA_START, sign * PLAZA_HW),
            (X_PLAZA_END, sign * PLAZA_HW),
            (X_CONTRACT_END, sign * ROAD_HW),
            (X_EXIT_END, sign * ROAD_HW),
        ], np.float32)
        return geo.polyline_to_walls(pts)

    parts += [edge(1), edge(-1)]
    # booth walls between gates (at the midlines between gate centerlines)
    for y in (-8.4, -4.2, 0.0, 4.2, 8.4):
        parts.append(geo.polyline_to_walls(
            np.array([(X_PLAZA_START, y), (X_PLAZA_END, y)], np.float32)
        ))
    parts.append(geo.polyline_to_walls(
        np.array([(0.0, -ROAD_HW), (0.0, ROAD_HW)], np.float32)))
    parts.append(geo.polyline_to_walls(
        np.array([(X_EXIT_END, -ROAD_HW), (X_EXIT_END, ROAD_HW)], np.float32)))
    return np.concatenate(parts, axis=0)


def build_tollgate(num_agents: int | None = None, **cfg_overrides):
    num_agents = 40 if num_agents is None else num_agents

    routes, half_widths, lane_routes = [], [], {}
    for lane, gates in LANE_GATES.items():
        for g in gates:
            idx = len(routes)
            routes.append(_route(lane, g))
            y = ENTRY_LANES[lane]
            # entry-road breadth; inside the plaza the booth walls and the
            # lidar field do the shepherding (gate half-width ~2.1)
            half_widths.append((ROAD_HW - y, ROAD_HW + y))
            lane_routes.setdefault(lane, []).append(idx)

    spawns = []
    for lane, ridxs in lane_routes.items():
        for s0 in (4.0, 12.0, 20.0, 28.0, 36.0, 44.0, 52.0):
            spawns.append([(ri, s0) for ri in ridxs])

    cfg_overrides.setdefault("obs_extra_dim", 65)
    cfg_overrides.setdefault("obs_extra_kind", "detector")
    # toll plaza speed limit (MetaDrive TollGate blocks limit speed; exact
    # constant lives outside the reference repo — 3 m/s forces the queueing
    # behavior the scene tests)
    cfg_overrides.setdefault("zone_speed_limit", 3.0)
    cfg_overrides.setdefault("overspeed_penalty", 0.5)
    spec = SceneBuildSpec(
        routes=routes,
        half_widths=half_widths,
        spawns=spawns,
        walls=_walls(),
        bbox=(-5.0, X_EXIT_END + 5, -18.0, 18.0),
        zone=(X_PLAZA_START, X_PLAZA_END, -PLAZA_HW, PLAZA_HW),
    )
    scene = compile_scene(spec)
    cfg = EnvConfig(num_agents=num_agents, **cfg_overrides)
    return scene, cfg
