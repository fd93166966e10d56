"""Parking-lot scene (TPU-native MultiAgentParkingLotEnv).

Reference: `MultiAgentParkingLotEnv` (metadrive 0.2.5), 10 agents, obs 91,
`parking_space_num` config (SURVEY.md §2.2; eval uses 10 agents). A one-way
aisle (travel +y) with angled bays on both sides; agents either drive from
the entrance into a destination bay ("park") or pull out of a bay and drive
to the exit ("leave"), matching the reference's two task flavours.

Near-perpendicular 80-degree bays at real-world spot width (2.7 m between
divider walls): swinging into a spot from the 3.5 m one-way aisle is at the
bicycle model's turning limit, so precise low-speed maneuvering — often
with a reverse correction (enable_reverse=True, the one MetaDrive scene
that allows it) — is required, reproducing the published difficulty band
(12-21% success across algorithms).
"""

from __future__ import annotations

import numpy as np

from copo_tpu.envs import geometry as geo
from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.scene import SceneBuildSpec, compile_scene

LANE_W = 3.5
UP_X = 1.75                   # one-way aisle centerline (travel +y)
BAY_LEN = 7.0
BAY_ANGLE = np.radians(90.0)
Y_IN = 0.0
Y_OUT = 44.0
APPROACH = 14.0               # entrance/exit stubs


def _park_bay(y: float):
    """Right-side bay tilted up-aisle: mouth at (3.5, y), deep end up-right."""
    p0 = np.array([3.5, y])
    p1 = p0 + BAY_LEN * np.array([np.sin(BAY_ANGLE), np.cos(BAY_ANGLE)])
    return p0, p1


def _leave_bay(y: float):
    """Left-side bay tilted down-aisle: mouth at (-3.5, y), deep end down-left."""
    q0 = np.array([-3.5, y])
    q1 = q0 + BAY_LEN * np.array([-np.sin(BAY_ANGLE), -np.cos(BAY_ANGLE)])
    return q0, q1


def _routes(park_ys, leave_ys):
    routes = []
    for y in park_ys:
        p0, p1 = _park_bay(y)
        entry = geo.straight((UP_X, Y_IN - APPROACH), (UP_X, y - 5.0))
        swing = geo.hermite((UP_X, y - 5.0), (0, 1), p0, p1 - p0, n=18)
        bay = geo.straight(p0, p1)
        routes.append(("park", geo.join_polylines(entry, swing, bay),
                       geo.cum_boundaries(entry, swing, bay)))
    for y in leave_ys:
        q0, q1 = _leave_bay(y)
        bay = geo.straight(q1, q0)     # deep end -> mouth (heading up-inward)
        merge = geo.hermite(q0, q0 - q1, (UP_X, y + 5.0), (0, 1), n=18)
        out = geo.straight((UP_X, y + 5.0), (UP_X, Y_OUT + APPROACH))
        routes.append(("leave", geo.join_polylines(bay, merge, out),
                       geo.cum_boundaries(bay, merge, out)))
    through = geo.straight((UP_X, Y_IN - APPROACH), (UP_X, Y_OUT + APPROACH))
    routes.append(("through", through, [geo.arclen(through) / 2.0]))
    return routes


def _walls(park_ys, leave_ys):
    lot_hw = 3.5 + BAY_LEN * np.sin(BAY_ANGLE) + 3.0
    parts = [
        np.array([(-lot_hw, Y_IN - 2), (-lot_hw, Y_OUT + 2)], np.float32),
        np.array([(lot_hw, Y_IN - 2), (lot_hw, Y_OUT + 2)], np.float32),
    ]
    # top/bottom walls with openings for the aisle (|x| < 3.6)
    for yy in (Y_IN - 2, Y_OUT + 2):
        parts.append(np.array([(-lot_hw, yy), (-3.6, yy)], np.float32))
        parts.append(np.array([(3.6, yy), (lot_hw, yy)], np.float32))
    # bay divider walls: parallel to each bay centerline, offset sideways
    for y in park_ys:
        p0, p1 = _park_bay(y)
        d = (p1 - p0) / np.linalg.norm(p1 - p0)
        n = np.array([-d[1], d[0]])
        for s in (1.2, -1.2):
            parts.append(np.stack([p0 + s * n, p1 + s * n]).astype(np.float32))
    for y in leave_ys:
        q0, q1 = _leave_bay(y)
        d = (q0 - q1) / np.linalg.norm(q0 - q1)
        n = np.array([-d[1], d[0]])
        for s in (1.2, -1.2):
            parts.append(np.stack([q1 + s * n, q0 + s * n]).astype(np.float32))
    return np.concatenate([geo.polyline_to_walls(p) for p in parts], axis=0)


def build_parking(num_agents: int | None = None, parking_space_num: int = 8,
                  **cfg_overrides):
    num_agents = 10 if num_agents is None else num_agents

    n_side = max(parking_space_num // 2, 1)
    park_ys = [10.0 + 8.0 * i for i in range(n_side)]
    leave_ys = [14.0 + 8.0 * i for i in range(n_side)]

    named = _routes(park_ys, leave_ys)
    routes = [r for _, r, _ in named]
    tags = [t for t, _, _ in named]
    checkpoints = [c for _, _, c in named]
    half_widths = [(6.0, 6.0)] * len(routes)  # lot breadth; walls shepherd bays

    park_idx = [i for i, t in enumerate(tags) if t == "park"]
    leave_idx = [i for i, t in enumerate(tags) if t == "leave"]
    through_idx = [i for i, t in enumerate(tags) if t == "through"]

    spawns = []
    # entrance spawns: any park route or drive-through
    for s0 in (2.0, 10.0):
        spawns.append([(ri, s0) for ri in park_idx + through_idx])
    # one spawn at the deep end of each leave bay
    for ri in leave_idx:
        spawns.append([(ri, 0.5)])

    # MetaDrive's parking env is the only scene with reverse enabled
    # (MAParkingLotConfig vehicle_config enable_reverse=True)
    cfg_overrides.setdefault("enable_reverse", True)

    lot_hw = 3.5 + BAY_LEN * np.sin(BAY_ANGLE) + 3.0
    spec = SceneBuildSpec(
        routes=routes,
        half_widths=half_widths,
        spawns=spawns,
        walls=_walls(park_ys, leave_ys),
        checkpoints=checkpoints,
        bbox=(-(lot_hw + 4), lot_hw + 4, Y_IN - APPROACH - 4, Y_OUT + APPROACH + 4),
        # every lot edge is a physical wall; body-contact slack on both sides
        # (the walls clamp the wide 6.0 m profile anyway — this only removes
        # the left/right asymmetry of the default)
        profile_slack=(0.9, 0.9),
    )
    scene = compile_scene(spec)
    cfg = EnvConfig(num_agents=num_agents, **cfg_overrides)
    return scene, cfg
