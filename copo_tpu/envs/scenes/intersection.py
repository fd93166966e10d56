"""Four-way intersection scene (TPU-native MultiAgentIntersectionEnv).

Reference: `MultiAgentIntersectionEnv` (metadrive 0.2.5, imported at
`train_all_copo_dist.py:9`), 30 agents, obs dim 91 (SURVEY.md §2.2 — npz
first-layer shapes), map_config exit_length=60. Geometry re-designed for
static compilation: four arms, right-hand traffic; routes = entry straight +
turn arc (or straight-through) + exit straight, resampled at uniform spacing.

`lane_num` selects 2 or 3 lanes per direction. r2 tried 3 lanes on the
hypothesis that 2 lanes capped IPPO success near 50%, but its own runs
contradicted that (VERDICT r2 weak #4). Re-run in r3 under the fidelity-
fixed env (vehicles-only lidar, horizon grace): IPPO 1M-step best smoothed
success 48.2% (2-lane) vs 46.3% (3-lane), one seed each — statistically
indistinguishable, so lane count is not the binding quality factor and the
3-lane default stands (artifacts: results/r3_diag vs r3_bench/ippo).

Layout (lane width w, road half-width H = lane_num*w, junction half-size
BOX > H so the outer-lane right-turn radius clears the vehicle's minimum
turning radius): a road along +x carries -x traffic at y in (0, H) and +x
traffic in (-H, 0); analogously for the y-axis road. Innermost lane (offset
w/2) turns left or goes straight; outermost lane turns right or goes
straight; a middle lane (3 lanes only) goes straight.
"""

from __future__ import annotations

import numpy as np

from copo_tpu.envs import geometry as geo
from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.scene import SceneBuildSpec, compile_scene

LANE_W = 3.5
DEFAULT_N_LANES = 3    # per direction; see module docstring
#: junction corner (sidewalk fillet) radius — MetaDrive InterSection block
#: default turning radius 10 m; junction half-size = road half-width +
#: CORNER_R, giving the ~41 m box of the reference scene (cross-eval of the
#: shipped policies in a 28 m box showed 87% of crashes as low-speed
#: junction gridlock the reference env doesn't exhibit)
CORNER_R = 10.0
ARM = 60.0


def _rot(points: np.ndarray, k: int) -> np.ndarray:
    """Rotate points by k*90deg about the origin."""
    a = k * np.pi / 2
    c, s = np.cos(a), np.sin(a)
    return (np.asarray(points, np.float64) @ np.array([[c, s], [-s, c]]).T).astype(np.float32)


def _east_arm_routes(n_lanes: int, BOX: float):
    """Routes entering from the east arm (heading -x); rotated for other arms.

    Returns list of (polyline, entry_lane_offset, tag)."""
    routes = []
    if n_lanes == 3:
        lane_turns = (
            (LANE_W / 2, ("straight", "left")),        # innermost
            (3 * LANE_W / 2, ("straight",)),           # middle
            (5 * LANE_W / 2, ("straight", "right")),   # outermost
        )
    else:
        lane_turns = (
            (LANE_W / 2, ("straight", "left")),        # innermost
            (3 * LANE_W / 2, ("straight", "right")),   # outermost
        )
    for y0, turns in lane_turns:
        entry = geo.straight((BOX + ARM, y0), (BOX, y0))
        for tag in turns:
            if tag == "straight":
                mid = geo.straight((BOX, y0), (-BOX, y0))
                out = geo.straight((-BOX, y0), (-BOX - ARM, y0))
                poly = geo.join_polylines(entry, mid, out)
                cks = geo.cum_boundaries(entry, mid, out)
            elif tag == "right":
                r = BOX - y0
                turn = geo.arc((BOX, BOX), r, -np.pi / 2, -np.pi)
                out = geo.straight((y0, BOX), (y0, BOX + ARM))
                poly = geo.join_polylines(entry, turn, out)
                cks = geo.cum_boundaries(entry, turn, out)
            else:  # left
                r = y0 + BOX
                turn = geo.arc((BOX, -BOX), r, np.pi / 2, np.pi)
                out = geo.straight((-y0, -BOX), (-y0, -BOX - ARM))
                poly = geo.join_polylines(entry, turn, out)
                cks = geo.cum_boundaries(entry, turn, out)
            routes.append((poly, y0, tag, cks))
    return routes


def _walls(road_hw: float, BOX: float):
    """Outer road edges along each arm, junction corner fillets, and arm end
    caps."""
    ROAD_HW = road_hw
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


def build_intersection(num_agents: int | None = None,
                       lane_num: int = DEFAULT_N_LANES, **cfg_overrides):
    """Compile the intersection scene. Returns (SceneData, EnvConfig)."""
    num_agents = 30 if num_agents is None else num_agents
    road_hw = lane_num * LANE_W
    box = road_hw + CORNER_R

    routes, half_widths, checkpoints = [], [], []
    lane_routes = {}  # (arm k, lane y0) -> route indices
    for k in range(4):
        for poly, y0, tag, cks in _east_arm_routes(lane_num, box):
            idx = len(routes)
            routes.append(_rot(poly, k))
            checkpoints.append(cks)
            # left of travel = toward the road centerline (yellow line at
            # lateral y0); crossing it is out-of-road, MetaDrive
            # `on_yellow_continuous_line`. Right = own curb. Inside the
            # junction the corner-fillet walls clamp the corridor instead.
            half_widths.append((y0, road_hw - y0))
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
        walls=_walls(road_hw, box),
        checkpoints=checkpoints,
        bbox=(-(box + ARM + 5), box + ARM + 5, -(box + ARM + 5), box + ARM + 5),
    )
    scene = compile_scene(spec)
    cfg = EnvConfig(num_agents=num_agents, **cfg_overrides)
    return scene, cfg
