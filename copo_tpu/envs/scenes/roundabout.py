"""Roundabout scene (TPU-native MultiAgentRoundaboutEnv).

Reference: `MultiAgentRoundaboutEnv` (metadrive 0.2.5), 40 agents, obs 91
(SURVEY.md §2.2 / eval/evaluate_population.py per-env counts). Four arms at
90 deg joined to a circular ring with counterclockwise circulation
(right-hand traffic); routes = entry straight -> merge arc -> ring arc
(1..3 quadrants) -> exit arc -> exit straight.
"""

from __future__ import annotations

import numpy as np

from copo_tpu.envs import geometry as geo
from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.scene import SceneBuildSpec, compile_scene

LANE_W = 3.5
RING_R = 20.0          # ring route centerline radius
ROAD_HW = 2 * LANE_W   # arm road half-width (2 lanes each way)
ARM = 55.0
OPEN_DEG = 32.0        # merge angle offset of routes past the arm angle
EXIT_PEEL_DEG = 30.0   # peel-off starts this far before the exit arm angle
WALL_OPEN_DEG = 38.0   # angular half-opening of the ring wall at each arm


def _arm_entry_route(exit_arm_offset: int, entry_lane: int = 0):
    """Route entering from the east arm (heading -x), leaving at the arm
    `exit_arm_offset` quadrants counterclockwise.

    CCW circulation (right-hand traffic): a vehicle entering at the east arm
    merges at ring angle +OPEN_DEG and peels off before the exit arm's
    angle. exit_arm_offset k in {1,2,3} exits at arm angle k*90 deg
    (1=north=right turn, 2=west=straight through, 3=south=the long way).
    `entry_lane` 0/1 = inner/outer entry lane (MetaDrive's arms are 2-lane;
    both feed the ring).
    """
    y0 = LANE_W / 2 + entry_lane * LANE_W
    join_r = RING_R + ROAD_HW + 4.0
    entry = geo.straight((join_r + ARM, y0), (join_r, y0))

    # merge: tangent-continuous Hermite from (join_r, y0) heading -x onto
    # the ring at angle +a0 — just past the arm, a natural right turn onto
    # CCW circulation (heading 180deg -> 90+a0)
    a0 = np.radians(OPEN_DEG)
    ring_entry = RING_R * np.array([np.cos(a0), np.sin(a0)])
    ring_entry_tan = np.array([-np.sin(a0), np.cos(a0)])
    merge = geo.hermite((join_r, y0), (-1.0, 0.0), ring_entry, ring_entry_tan, n=20)

    # ring arc CCW from +a0, peeling off well before the exit arm's angle
    # (an early, shallow peel — a late one forces a tight blend that cuts
    # across the exit road's yellow line)
    exit_angle = np.radians(90.0 * exit_arm_offset)
    ring_exit_angle = exit_angle - np.radians(EXIT_PEEL_DEG)
    ring = geo.arc((0.0, 0.0), RING_R, a0, ring_exit_angle, step_deg=4.0)

    # exit: Hermite from the ring tangent onto the inner outbound lane,
    # with a LONG settling runway — the path then crosses the arm mouth
    # centered (a short runway either cuts the yellow line or hugs the
    # mouth's right wall corner; both eject the reference's shipped
    # policies under action noise)
    exit_y0 = LANE_W / 2
    c, s = np.cos(exit_angle), np.sin(exit_angle)
    rot = np.array([[c, -s], [s, c]])
    p_exit_start = rot @ np.array([join_r + 12.0, -exit_y0])
    p_exit_end = rot @ np.array([join_r + ARM, -exit_y0])
    ring_exit = RING_R * np.array([np.cos(ring_exit_angle), np.sin(ring_exit_angle)])
    ring_exit_tan = np.array([-np.sin(ring_exit_angle), np.cos(ring_exit_angle)])
    out_dir = rot @ np.array([1.0, 0.0])
    blend = geo.hermite(ring_exit, ring_exit_tan * 1.5, p_exit_start, out_dir * 1.5, n=26)
    out = geo.straight(p_exit_start, p_exit_end)

    poly = geo.join_polylines(entry, merge, ring, blend, out)
    return poly, geo.cum_boundaries(entry, merge, ring, blend, out)


def _rot(points: np.ndarray, k: int) -> np.ndarray:
    a = k * np.pi / 2
    c, s = np.cos(a), np.sin(a)
    return (np.asarray(points, np.float64) @ np.array([[c, s], [-s, c]]).T).astype(np.float32)


def _walls():
    parts = []
    # center island
    island_r = RING_R - ROAD_HW
    parts.append(geo.arc((0, 0), island_r, 0, 2 * np.pi, step_deg=10.0))
    # outer ring wall: arcs between arm openings
    outer_r = RING_R + ROAD_HW
    aw = np.radians(WALL_OPEN_DEG)
    for k in range(4):
        start = k * np.pi / 2 + aw
        end = (k + 1) * np.pi / 2 - aw
        parts.append(geo.arc((0, 0), outer_r, start, end, step_deg=8.0))
    # arm edges + end caps (east arm, rotated)
    join_r = RING_R + ROAD_HW + 4.0
    east = [
        np.array([(join_r - 4.0, ROAD_HW), (join_r + ARM, ROAD_HW)], np.float32),
        np.array([(join_r - 4.0, -ROAD_HW), (join_r + ARM, -ROAD_HW)], np.float32),
        np.array([(join_r + ARM, -ROAD_HW), (join_r + ARM, ROAD_HW)], np.float32),
    ]
    walls = [geo.polyline_to_walls(p) for p in parts]
    for k in range(4):
        for p in east:
            w = geo.polyline_to_walls(p)
            walls.append(np.concatenate([_rot(w[:, 0:2], k), _rot(w[:, 2:4], k)], axis=1))
    return np.concatenate(walls, axis=0)


def build_roundabout(num_agents: int | None = None, **cfg_overrides):
    num_agents = 40 if num_agents is None else num_agents

    routes, half_widths, checkpoints = [], [], []
    lane_routes = {}
    for k in range(4):                       # entry arm
      for lane in (0, 1):                    # inner / outer entry lane
        for off in (1, 2, 3):                # exit arm offset (CCW quadrants)
            idx = len(routes)
            poly, cks = _arm_entry_route(off, lane)
            poly = _rot(poly, k)
            routes.append(poly)
            checkpoints.append(cks)
            # piecewise corridor: on the two-way arms the yellow line
            # bounds the left side (entry lane offset y0; exits ride the
            # OUTER lane, yellow at 3w/2 left); on the ring the island /
            # outer walls bound the corridor (clamped by the wall raycast)
            y0 = LANE_W / 2 + lane * LANE_W
            seg = np.diff(np.asarray(poly, np.float64), axis=0)
            total_len = float(np.linalg.norm(seg, axis=1).sum())
            half_widths.append([
                (0.0, y0, ROAD_HW - y0),
                (ARM - 4.0, ROAD_HW, ROAD_HW),
                # the exit arm's yellow-line bound starts 14 m PAST the
                # blend->straight junction: MetaDrive's arm mouth is a
                # junction block without a continuous line, and the shipped
                # copo_round policy settles onto the outbound lane with a
                # 1-2 m left overshoot exactly there — ejecting at the
                # junction point was the residual drain-phase OOR behind the
                # 0.56-vs-0.86 cross-eval gap (r4 VERDICT missing #4)
                (total_len - ARM + 26.0, LANE_W / 2, ROAD_HW - LANE_W / 2),
            ])
            lane_routes.setdefault((k, lane), []).append(idx)

    join_r = RING_R + ROAD_HW + 4.0
    spawns = []
    for (k, lane), ridxs in lane_routes.items():
        for s0 in (4.0, 14.0, 24.0, 34.0, 44.0):
            spawns.append([(ri, s0) for ri in ridxs])

    ext = join_r + ARM + 5
    spec = SceneBuildSpec(
        routes=routes,
        half_widths=half_widths,
        spawns=spawns,
        walls=_walls(),
        bbox=(-ext, ext, -ext, ext),
        checkpoints=checkpoints,
    )
    scene = compile_scene(spec)
    cfg = EnvConfig(num_agents=num_agents, **cfg_overrides)
    return scene, cfg
