"""Procedurally-generated map scene (TPU-native MultiAgentMetaDrive "PG Map").

Reference: `MultiAgentMetaDrive` with procedural maps (SURVEY.md §2.2;
train scripts sweep `start_seed`, and MetaDrive's PG block sampler composes
straight/curve blocks per seed). Here: a seeded block-sequence generator
(straights and left/right arcs with drivable radii) composed into a 3-lane
one-directional road; different seeds give different maps, matching the
reference's seed-indexed map generation role.
"""

from __future__ import annotations

import numpy as np

from copo_tpu.envs import geometry as geo
from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.scene import SceneBuildSpec, compile_scene

LANE_W = 3.5
LANES = (-3.5, 0.0, 3.5)
ROAD_HW = 5.25
NUM_BLOCKS = 5
#: fixed-shape envelope so every map_seed compiles to one SceneData shape
#: (the train grid rotates maps per seed without paying a recompile):
#: total centerline arc length is normalized to TARGET_LEN and generation
#: retries (deterministically) until the map fits the CANVAS square
TARGET_LEN = 300.0
CANVAS = 340.0
N_SPAWN_PER_LANE = 18


def _generate_centerline(seed: int):
    """Seeded sequence of straight / arc blocks -> dense centerline.

    Returns (points, block_boundaries): cumulative arc lengths at block
    joins (the navigation checkpoint nodes)."""
    rng = np.random.RandomState(seed)
    pts = [np.array([0.0, 0.0]), np.array([10.0, 0.0])]
    boundaries = []
    heading = 0.0
    for _ in range(NUM_BLOCKS):
        kind = rng.choice(["straight", "curve"])
        if kind == "straight":
            length = rng.uniform(40.0, 80.0)
            d = np.array([np.cos(heading), np.sin(heading)])
            pts.append(pts[-1] + length * d)
        else:
            radius = rng.uniform(18.0, 40.0)
            angle = np.radians(rng.uniform(30.0, 90.0)) * rng.choice([-1.0, 1.0])
            # arc from current point, tangent to current heading
            side = np.sign(angle)
            center = pts[-1] + radius * np.array(
                [np.cos(heading + side * np.pi / 2), np.sin(heading + side * np.pi / 2)]
            )
            a_start = heading - side * np.pi / 2
            n = max(3, int(abs(np.degrees(angle)) / 6))
            for t in np.linspace(0, 1, n)[1:]:
                a = a_start + angle * t
                pts.append(center + radius * np.array([np.cos(a), np.sin(a)]))
            heading += angle
        seg = np.diff(np.asarray(pts, np.float64), axis=0)
        boundaries.append(float(np.linalg.norm(seg, axis=1).sum()))
    pts = np.array(pts, dtype=np.float64)

    # normalize to the fixed arc-length envelope: extend the final straight
    # or truncate so every seed's centerline is exactly TARGET_LEN
    seg = np.diff(pts, axis=0)
    seglen = np.linalg.norm(seg, axis=1)
    total = float(seglen.sum())
    if total < TARGET_LEN:
        d = seg[-1] / max(seglen[-1], 1e-6)
        pts = np.concatenate([pts, [pts[-1] + d * (TARGET_LEN - total)]])
        boundaries.append(TARGET_LEN)
    else:
        cum = np.concatenate([[0.0], np.cumsum(seglen)])
        keep = cum <= TARGET_LEN
        last = pts[keep][-1]
        i = int(keep.sum()) - 1
        d = seg[min(i, len(seg) - 1)]
        d = d / max(np.linalg.norm(d), 1e-6)
        pts = np.concatenate([pts[keep], [last + d * (TARGET_LEN - cum[keep][-1])]])
        boundaries = [b for b in boundaries if b < TARGET_LEN] + [TARGET_LEN]
    return pts, boundaries


def build_pg_map(num_agents: int | None = None, map_seed: int = 0, **cfg_overrides):
    num_agents = 30 if num_agents is None else num_agents

    # deterministic retry until the map fits the fixed canvas (keeps the
    # lidar-field shape identical across seeds)
    sub = 0
    while True:
        center, block_bounds = _generate_centerline(map_seed * 1000 + sub)
        ext_x = center[:, 0].max() - center[:, 0].min()
        ext_y = center[:, 1].max() - center[:, 1].min()
        if ext_x <= CANVAS - 30 and ext_y <= CANVAS - 30:
            break
        sub += 1
    routes = [geo.offset_polyline(center, off) for off in LANES]
    half_widths = [(ROAD_HW - off, ROAD_HW + off) for off in LANES]

    # walls: road edges offset from the centerline + end caps
    e1 = geo.offset_polyline(center, ROAD_HW + 0.25)
    e2 = geo.offset_polyline(center, -(ROAD_HW + 0.25))
    caps = [
        np.stack([e1[0], e2[0]]).astype(np.float32),
        np.stack([e1[-1], e2[-1]]).astype(np.float32),
    ]
    walls = np.concatenate(
        [geo.polyline_to_walls(p) for p in (e1, e2, *caps)], axis=0
    )

    # fixed spawn count along the first 60% of each lane
    offsets = np.linspace(4.0, TARGET_LEN * 0.6, N_SPAWN_PER_LANE)
    spawns = []
    for lane in range(3):
        for s0 in offsets:
            spawns.append([(lane, float(s0))])

    # fixed-size canvas centered on the map: identical lidar-field shape
    # for every seed
    allpts = np.concatenate([e1, e2], axis=0)
    # snap the canvas center to the lidar-cell grid so the baked field has
    # the exact same (H, W) for every seed
    cx = round(0.5 * (allpts[:, 0].min() + allpts[:, 0].max()))
    cy = round(0.5 * (allpts[:, 1].min() + allpts[:, 1].max()))
    bbox = (cx - CANVAS / 2, cx + CANVAS / 2, cy - CANVAS / 2, cy + CANVAS / 2)
    spec = SceneBuildSpec(
        routes=routes,
        checkpoints=[list(block_bounds) for _ in routes],
        half_widths=half_widths,
        spawns=spawns,
        walls=walls,
        bbox=bbox,
        pad_waypoints=int(TARGET_LEN / geo.WAYPOINT_SPACING) + 24,
        pad_checkpoints=NUM_BLOCKS + 2,
        pad_walls=160,
        # one-directional road with physical curbs on BOTH edges: body-contact
        # slack on both sides (the default (0.0, 0.9) is for scenes whose left
        # edge is the painted yellow line)
        profile_slack=(0.9, 0.9),
    )
    scene = compile_scene(spec)
    cfg = EnvConfig(num_agents=num_agents, **cfg_overrides)
    return scene, cfg
