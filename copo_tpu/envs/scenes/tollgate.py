"""Tollgate scene (TPU-native MultiAgentTollgateEnv).

Reference: `MultiAgentTollgateEnv` (metadrive 0.2.5), 40 agents, obs 156
(SURVEY.md §2.2; `TollGateObservation`, `algo_svo/svo_env.py:9,32-45`). A
BIDIRECTIONAL road — MetaDrive's spawn_roads include the negative
counterpart road — with 3 lanes per direction (map_config lane_num=3)
widening into a toll plaza of 8 gate lanes total (toll_lane_num=8, 4 per
direction, booth walls between gates) and contracting back.

Obs layout: [side-detector 72 | ego core 6 | lane-line detector 5 | lidar 72
| toll flag 1] = 156 with NO navi block (TollGateStateObservation drops
navigation on the straight toll road; layout recovered from the shipped npz
first-layer weight-norm structure — the speed dim at 73 and the toll flag at
155 carry by far the largest weights).

Stop-and-wait semantics (MetaDrive marl_tollgate): inside the gate the block
speed limit is ~3 km/h; a vehicle must stay `toll_min_pass_time` steps in
the gate before it "pays" (toll obs flips -1 -> +1); overspeeding cancels
the speed reward and charges overspeed_penalty * speed / max_speed; leaving
the gate unpaid hits the boom barrier (a crash).
"""

from __future__ import annotations

import numpy as np

from copo_tpu.envs import geometry as geo
from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.scene import SceneBuildSpec, compile_scene

LANE_W = 3.5
#: +x-direction entry lanes (right-hand traffic: negative y; leftmost lane
#: adjacent to the yellow center line at y=0)
ENTRY_LANES = (-1.75, -5.25, -8.75)
GATE_PITCH = 4.2
#: +x-direction gate centerlines (4 gates; booths between at 0/-4.2/-8.4/-12.6)
GATE_YS = (-2.1, -6.3, -10.5, -14.7)
X_ENTRY_END = 55.0
X_PLAZA_START = 80.0
X_PLAZA_END = 100.0
X_CONTRACT_END = 125.0
X_EXIT_END = 185.0
ROAD_HW = 3 * LANE_W           # 10.5 per direction
PLAZA_HW = 16.8                # 4 gates * 4.2 per direction


#: entry lane index -> usable gate indices (leftmost lane -> inner gates)
LANE_GATES = {0: (0, 1), 1: (1, 2), 2: (2, 3)}


def _route(lane_idx: int, gate_idx: int):
    """+x-direction route: entry lane -> gate -> back to the entry lane."""
    y_in = ENTRY_LANES[lane_idx]
    y_gate = GATE_YS[gate_idx]
    entry = geo.straight((0.0, y_in), (X_ENTRY_END, y_in))
    widen = geo.hermite((X_ENTRY_END, y_in), (1, 0), (X_PLAZA_START, y_gate), (1, 0), n=18)
    gate = geo.straight((X_PLAZA_START, y_gate), (X_PLAZA_END, y_gate))
    contract = geo.hermite((X_PLAZA_END, y_gate), (1, 0), (X_CONTRACT_END, y_in), (1, 0), n=18)
    exit_ = geo.straight((X_CONTRACT_END, y_in), (X_EXIT_END, y_in))
    poly = geo.join_polylines(entry, widen, gate, contract, exit_)
    return poly, geo.cum_boundaries(entry, widen, gate, contract, exit_)


def _mirror(poly: np.ndarray) -> np.ndarray:
    """Map a +x-direction polyline to the oncoming (-x) direction."""
    out = np.asarray(poly, np.float32).copy()
    out[:, 0] = X_EXIT_END - out[:, 0]
    out[:, 1] = -out[:, 1]
    return out


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
    # booth walls between gates, both directions + the center booth at y=0
    booth_ys = [0.0]
    for g in (-4.2, -8.4, -12.6):
        booth_ys += [g, -g]
    for y in booth_ys:
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
    checkpoints = []
    for lane, gates in LANE_GATES.items():
        for g in gates:
            fwd, cks = _route(lane, g)
            for d, poly in enumerate((fwd, _mirror(fwd))):
                idx = len(routes)
                routes.append(poly)
                checkpoints.append(cks)
                y_in = ENTRY_LANES[lane]
                # open road: yellow line left at |y_in|, curb right; the
                # plaza walls clamp the gate corridor
                half_widths.append((-y_in, ROAD_HW + y_in))
                lane_routes.setdefault((lane, d), []).append(idx)

    spawns = []
    for (lane, d), ridxs in lane_routes.items():
        for s0 in (4.0, 12.0, 20.0, 28.0, 36.0, 44.0, 52.0):
            spawns.append([(ri, s0) for ri in ridxs])

    cfg_overrides.setdefault("side_detector_lasers", 72)
    cfg_overrides.setdefault("side_detector_distance", 50.0)
    cfg_overrides.setdefault("lane_line_lasers", 5)
    cfg_overrides.setdefault("lane_line_distance", 20.0)
    cfg_overrides.setdefault("navi_in_obs", False)
    cfg_overrides.setdefault("toll_obs", True)
    cfg_overrides.setdefault("toll_min_pass_time", 30)
    # toll gate speed limit: MetaDrive TollGate block SPEED_LIMIT = 3 km/h —
    # effectively "stop inside the gate"
    cfg_overrides.setdefault("zone_speed_limit", 3.0 / 3.6)
    cfg_overrides.setdefault("overspeed_penalty", 0.5)
    spec = SceneBuildSpec(
        routes=routes,
        half_widths=half_widths,
        spawns=spawns,
        walls=_walls(),
        bbox=(-5.0, X_EXIT_END + 5, -PLAZA_HW - 4.0, PLAZA_HW + 4.0),
        zone=(X_PLAZA_START, X_PLAZA_END, -PLAZA_HW, PLAZA_HW),
        lidar_range=50.0,   # side-detector range (field bake cap)
        checkpoints=checkpoints,
    )
    scene = compile_scene(spec)
    cfg = EnvConfig(num_agents=num_agents, **cfg_overrides)
    return scene, cfg
