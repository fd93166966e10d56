"""Four-way intersection scene (TPU-native MultiAgentIntersectionEnv).

Reference: `MultiAgentIntersectionEnv` (metadrive 0.2.5, imported at
`train_all_copo_dist.py:9`), 30 agents, obs dim 91 (SURVEY.md §2.2 — npz
first-layer shapes), map_config exit_length=60 / lane_num=3 (three lanes per
direction — junction conflict density depends on it: the 2-lane variant caps
IPPO success near 50% where the published IPPO reaches ~72%). Geometry
re-designed for static compilation: four arms, right-hand traffic; routes =
entry straight + turn arc (or straight-through) + exit straight, resampled at
uniform spacing.

Layout (lane width w, road half-width 3w, junction half-size BOX > 3w so the
outer-lane right-turn radius clears the vehicle's minimum turning radius):
  a road along +x carries -x traffic at y in (0, 3w) and +x traffic in
  (-3w, 0); analogously for the y-axis road. Innermost lane (offset w/2)
  turns left or goes straight; middle lane goes straight; outermost lane
  (5w/2) turns right or goes straight.
"""

from __future__ import annotations

import numpy as np

from copo_tpu.envs import geometry as geo
from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.scene import SceneBuildSpec, compile_scene

LANE_W = 3.5
N_LANES = 3            # lanes per direction (MetaDrive MAIntersection lane_num=3)
ROAD_HW = N_LANES * LANE_W   # road half-width
BOX = 14.0             # junction half-size (corner radius BOX - ROAD_HW = 3.5 m)
ARM = 60.0


def _rot(points: np.ndarray, k: int) -> np.ndarray:
    """Rotate points by k*90deg about the origin."""
    a = k * np.pi / 2
    c, s = np.cos(a), np.sin(a)
    return (np.asarray(points, np.float64) @ np.array([[c, s], [-s, c]]).T).astype(np.float32)


def _east_arm_routes():
    """Routes entering from the east arm (heading -x); rotated for other arms.

    Returns list of (polyline, entry_lane_offset, tag)."""
    routes = []
    lane_turns = (
        (LANE_W / 2, ("straight", "left")),        # innermost
        (3 * LANE_W / 2, ("straight",)),           # middle
        (5 * LANE_W / 2, ("straight", "right")),   # outermost
    )
    for y0, turns in lane_turns:
        entry = geo.straight((BOX + ARM, y0), (BOX, y0))
        for tag in turns:
            if tag == "straight":
                rest = geo.straight((BOX, y0), (-BOX - ARM, y0))
                poly = geo.join_polylines(entry, rest)
            elif tag == "right":
                r = BOX - y0
                turn = geo.arc((BOX, BOX), r, -np.pi / 2, -np.pi)
                out = geo.straight((y0, BOX), (y0, BOX + ARM))
                poly = geo.join_polylines(entry, turn, out)
            else:  # left
                r = y0 + BOX
                turn = geo.arc((BOX, -BOX), r, np.pi / 2, np.pi)
                out = geo.straight((-y0, -BOX), (-y0, -BOX - ARM))
                poly = geo.join_polylines(entry, turn, out)
            routes.append((poly, y0, tag))
    return routes


def _walls():
    """Outer road edges (y = +-2w along each arm), junction corner fillets,
    and arm end caps."""
    parts = [
        # walls are straight lines -> keep them single segments (bake cost
        # scales with segment count)
        np.array([(BOX, ROAD_HW), (BOX + ARM, ROAD_HW)], np.float32),
        np.array([(BOX, -ROAD_HW), (BOX + ARM, -ROAD_HW)], np.float32),
        np.array([(BOX + ARM, -ROAD_HW), (BOX + ARM, ROAD_HW)], np.float32),  # end cap
        # corner fillet between this arm's +y edge and the next arm's +x edge:
        # arc centered (BOX, BOX), radius BOX - ROAD_HW, from (BOX, ROAD_HW)
        # to (ROAD_HW, BOX)
        geo.arc((BOX, BOX), BOX - ROAD_HW, -np.pi / 2, -np.pi, step_deg=12.0),
    ]
    base = [geo.polyline_to_walls(p) for p in parts]
    walls = []
    for k in range(4):
        for w in base:
            walls.append(np.concatenate([_rot(w[:, 0:2], k), _rot(w[:, 2:4], k)], axis=1))
    return np.concatenate(walls, axis=0)


def build_intersection(num_agents: int | None = None, **cfg_overrides):
    """Compile the intersection scene. Returns (SceneData, EnvConfig)."""
    num_agents = 30 if num_agents is None else num_agents

    routes, half_widths = [], []
    lane_routes = {}  # (arm k, lane y0) -> route indices
    for k in range(4):
        for poly, y0, tag in _east_arm_routes():
            idx = len(routes)
            routes.append(_rot(poly, k))
            # left of travel = toward the road centerline (yellow line at
            # lateral y0); crossing it is out-of-road, MetaDrive
            # `on_yellow_continuous_line`. Right = own curb. Inside the
            # junction the corner-fillet walls clamp the corridor instead.
            half_widths.append((y0, ROAD_HW - y0))
            lane_routes.setdefault((k, y0), []).append(idx)

    # Spawn points: 5 longitudinal offsets per inbound lane; all routes of
    # that lane are options (entry straights share geometry).
    spawns = []
    for (k, y0), ridxs in lane_routes.items():
        for s0 in (4.0, 14.0, 24.0, 34.0, 44.0):
            spawns.append([(ri, s0) for ri in ridxs])

    spec = SceneBuildSpec(
        routes=routes,
        half_widths=half_widths,
        spawns=spawns,
        walls=_walls(),
        bbox=(-(BOX + ARM + 5), BOX + ARM + 5, -(BOX + ARM + 5), BOX + ARM + 5),
    )
    scene = compile_scene(spec)
    cfg = EnvConfig(num_agents=num_agents, **cfg_overrides)
    return scene, cfg
