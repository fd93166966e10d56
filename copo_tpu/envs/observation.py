"""Observation kernel: ego state + detectors + navigation + lidar (+ LCF).

Rebuilds the observation contract the reference consumes from MetaDrive 0.2.5
(SURVEY.md §2.2): flat float Box normalized to [0, 1]; dims 91 (Intersection /
Roundabout / Parking), 96 (Bottleneck), 156 (Tollgate), +1 LCF slot when the
CoPO wrapper is on (`env_wrappers.py:393-418` appends (lcf+1)/2).

Layout (MetaDrive 0.2.5 StateObservation.vehicle_state order; the boundary /
lane-offset dims are REPLACED by detector rings when the scene configures
them — see EnvConfig detector comments):
  [edge block]  2 dims: left/right road-edge distance / ((lane_num+1)*w)
                — or side-detector ring (side_detector_lasers) sensing the
                physical walls, first beam to the RIGHT, clockwise
  [core 6]      heading diff vs lane right-normal ((1 - sin(err))/2),
                speed (km/h+1)/(max+1), steering state, last action x2,
                |yaw rate|
  [lane block]  1 dim: lane-center offset (1 + 2*lat/w)/2 against the lane
                the vehicle is IN — or lane-line detector ring
                (lane_line_lasers) against the painted lane lines
  [navi 10]     2 checkpoints x [fwd proj, side proj (right-positive),
                bend radius/100, clockwise flag, bend angle] at the route's
                segment-boundary nodes (scene.route_ckpt_s); straights read
                (0, 0.5, 0.5); omitted when navi_in_obs=False (tollgate)
  [lidar L]     distances / range (1 = clear), vehicles only
  [+4K]         nearest-K vehicle features when lidar_num_others > 0
  [+1]          toll gate flag (0 outside / -1 unpaid / +1 paid) when
                toll_obs (TollGateObservation semantics)
  [+3]          traffic-light msg + bbox-normalized position when
                add_traffic_light (env_wrappers.py:258-272)
  [+1]          (lcf+1)/2 when lcf_enabled
  [+K*comm_dim] neighbours' comm messages when comm_method != "none"
                (env_wrappers.py:363-376; append order matches the reference)
"""

from __future__ import annotations

import jax.numpy as jnp

from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.dynamics import wrap_angle
from copo_tpu.envs.lidar import static_detector
from copo_tpu.envs.scene import SceneData

def _to01(x):
    """Map a [-1, 1]-clipped value to [0, 1]."""
    return 0.5 * (jnp.clip(x, -1.0, 1.0) + 1.0)


#: checkpoint projections saturate at this distance (MetaDrive NAVI_POINT_DIST)
NAVI_POINT_DIST = 50.0

#: curvature below this (radius > 50 m) counts as a straight lane for the
#: navi bend dims (see navi_block)
CURV_EPS = 0.02


def navi_block(scene: SceneData, cfg: EnvConfig, pos, heading, route_idx, s):
    """Navigation features (N, 10): the next two route CHECKPOINTS,
    MetaDrive encoding.

    Per checkpoint: [fwd projection, side projection (right-positive),
    bend radius, clockwise flag, bend angle] — the 0.2.5 Navigation
    `get_navi_info` schema. Checkpoints are the scene's segment-boundary
    nodes (SceneData.route_ckpt_s), matching MetaDrive's road-block boundary
    navigation: a FIXED next checkpoint provides heading feedback that a
    route-following constant-lookahead point absorbs (r4 diagnosis: on the
    bottleneck funnel the lookahead tracked the vehicle's drift and the
    shipped policies never received a correction signal). The projection
    vector saturates in NORM at 50 m (direction preserved), then each
    component maps (x/50+1)/2. Bend dims describe the segment being
    traversed TOWARD each checkpoint (baked constant per-segment curvature,
    scene.route_ckpt_curv), encoded as MetaDrive encodes CircularLane/
    StraightLane checkpoints.
    Chirality (right-positive side, clockwise flag) picked by
    cross-evaluating the reference's shipped npz policies.
    """
    # ONE gather: the fused checkpoint table [s, x, y, curv] row per agent
    # (see SceneData.route_ckpt_tab — gather-op count was the navi cost);
    # the next-checkpoint selection is then one-hot contractions over the
    # tiny C axis, which fuse as pure elementwise math
    tab = scene.route_ckpt_tab[route_idx]                    # (..., C, 4)
    ck_tab = tab[..., 0]                                     # (..., C)
    C = ck_tab.shape[-1]
    ahead = ck_tab > (s + 2.0)[..., None]
    idx1 = jnp.argmax(ahead, axis=-1)
    idx1 = jnp.where(jnp.any(ahead, axis=-1), idx1, C - 1)
    idx2 = jnp.minimum(idx1 + 1, C - 1)
    ar = jnp.arange(C, dtype=idx1.dtype)
    hot1 = (ar == idx1[..., None]).astype(tab.dtype)         # (..., C)
    hot2 = (ar == idx2[..., None]).astype(tab.dtype)
    sel1 = jnp.sum(tab * hot1[..., None], axis=-2)           # (..., 4)
    sel2 = jnp.sum(tab * hot2[..., None], axis=-2)
    pos1, curv1 = sel1[..., 1:3], sel1[..., 3]
    pos2, curv2 = sel2[..., 1:3], sel2[..., 3]

    feats = []
    cos_h, sin_h = jnp.cos(heading), jnp.sin(heading)
    for ck_pos, curv in ((pos1, curv1), (pos2, curv2)):
        rel = ck_pos - pos
        fwd = rel[..., 0] * cos_h + rel[..., 1] * sin_h
        left = -rel[..., 0] * sin_h + rel[..., 1] * cos_h
        nrm = jnp.sqrt(jnp.maximum(fwd * fwd + left * left, 1e-9))
        sat = jnp.where(nrm > NAVI_POINT_DIST, NAVI_POINT_DIST / nrm, 1.0)
        # Bend dims fire only for REAL turns (radius < 1/CURV_EPS = 50 m —
        # junction arcs and the roundabout ring qualify; lane tapers and
        # resampling noise do not). MetaDrive's checkpoint lane is either a
        # CircularLane (radius/direction/angle set) or a StraightLane
        # (0 / 0.5 / 0.5 after encoding); a raw sign(curv) saturates on
        # polyline noise and read the bottleneck funnel as a hard left turn,
        # which the shipped policies dutifully steered into (r4 diagnosis).
        is_turn = jnp.abs(curv) > CURV_EPS
        radius = jnp.where(is_turn, 1.0 / jnp.maximum(jnp.abs(curv), 1e-3), 0.0)
        turn_sign = jnp.where(is_turn, jnp.sign(curv), 0.0)
        feats += [
            _to01(fwd * sat / NAVI_POINT_DIST),
            _to01(-left * sat / NAVI_POINT_DIST),       # right-positive
            jnp.clip(radius / 100.0, 0.0, 1.0),
            _to01(-turn_sign),                          # 1 = clockwise turn
            # bend-angle magnitude through the (x+1)/2 map: MetaDrive 0.2.5
            # encodes the block sweep angle as clip((deg/angle_max+1)/2), so
            # straight lanes read 0.5 (not 0) and bends rise toward 1
            _to01(jnp.where(is_turn,
                            jnp.clip(jnp.abs(curv) * 30.0 / jnp.pi, 0.0, 1.0),
                            0.0)),
        ]
    return jnp.stack(feats, axis=-1)


def lane_snapped_lateral(lateral, left_w, right_w, lane_width):
    """Signed offset from the NEAREST parallel lane centerline.

    MetaDrive localizes against `vehicle.lane` — the lane the vehicle is
    actually in — so both the reward's lateral factor and the ego lane-offset
    obs dim read ~0 for a vehicle centered in ANY lane of its road
    (`reward_function` current_ref_lanes membership; `StateObservation.
    vehicle_state` uses vehicle.lane.local_coordinates). Parallel lanes sit
    at multiples of lane_width from the route centerline, bounded by the
    corridor: a lane center at k*w needs w/2 clearance to the corridor edge.
    Without this snap, a vehicle overtaking in the adjacent lane loses its
    entire progress reward and sees a saturated lane-offset obs that steers
    it toward the curb (cross-eval of the reference's shipped policies showed
    a 9x out-of-road inflation vs their home CSVs).
    """
    n_left = jnp.maximum(jnp.floor(left_w / lane_width - 0.5 + 1e-4), 0.0)
    n_right = jnp.maximum(jnp.floor(right_w / lane_width - 0.5 + 1e-4), 0.0)
    k = jnp.clip(jnp.round(lateral / lane_width), -n_right, n_left)
    return lateral - k * lane_width


def lane_line_block(cfg: EnvConfig, lat_lane, heading, lane_heading,
                    num_beams: int, distance: float):
    """Analytic lane-LINE detector ring (..., num_beams), 1 = clear.

    MetaDrive's lane_line_detector raycasts against the PAINTED lane lines
    (the broken white lines between lanes and the continuous yellow/white
    edges), not the physical walls — on a multi-lane road its side beams
    read the ~half-lane distance to the adjacent line. Model: the two
    nearest lines are the current lane's boundaries, parallel to the lane at
    +-lane_width/2 around the lane center; a beam at relative angle psi hits
    the left line at gap_l/sin(psi) (sin psi > 0) or the right line at
    gap_r/-sin(psi). Ring order matches the side detector: first beam to the
    RIGHT of heading, stepping clockwise (decoded from the shipped policies'
    steering-gradient signatures).
    """
    rel = 0.5 * jnp.pi + 2.0 * jnp.pi * jnp.arange(
        num_beams, dtype=jnp.float32) / num_beams
    psi = (heading - lane_heading)[..., None] - rel               # (..., B)
    sin_psi = jnp.sin(psi)
    gap_l = jnp.maximum(0.5 * cfg.lane_width - lat_lane, 0.0)[..., None]
    gap_r = jnp.maximum(0.5 * cfg.lane_width + lat_lane, 0.0)[..., None]
    eps = 1e-3
    d = jnp.where(
        sin_psi > eps, gap_l / jnp.maximum(sin_psi, eps),
        jnp.where(sin_psi < -eps, gap_r / jnp.maximum(-sin_psi, eps),
                  distance),
    )
    return jnp.clip(d / distance, 0.0, 1.0)


def in_zone(scene: SceneData, pos):
    """Bool (...,): inside the scene's special zone (all-zeros zone = never)."""
    z = scene.zone
    has_zone = (z[1] > z[0]) & (z[3] > z[2])
    inside = (
        (pos[..., 0] >= z[0]) & (pos[..., 0] <= z[1])
        & (pos[..., 1] >= z[2]) & (pos[..., 1] <= z[3])
    )
    return inside & has_zone


def traffic_light_block(scene: SceneData, cfg: EnvConfig, pos, t):
    """Global sawtooth traffic-light signal + bbox-normalized position (..., 3)
    (reference `_traffic_light_msg` / `get_agent_traffic_light_msg`,
    env_wrappers.py:258-272)."""
    interval = cfg.traffic_light_interval
    tf = t.astype(jnp.float32)
    inc = jnp.mod(tf, interval) / interval * 0.1
    odd = jnp.mod(jnp.floor_divide(t, interval), 2) == 1
    msg = jnp.where(odd, inc, 1.0 - inc)
    b = scene.bbox
    p0 = (pos[..., 0] - b[0]) / jnp.maximum(b[1] - b[0], 1e-6)
    p1 = (pos[..., 1] - b[2]) / jnp.maximum(b[3] - b[2], 1e-6)
    blk = jnp.stack([jnp.broadcast_to(msg, p0.shape), p0, p1], axis=-1)
    return jnp.clip(blk, 0.0, 1.0)


def comm_block(cfg: EnvConfig, pos, heading, comm_msg, sender_valid):
    """Messages of the K nearest in-radius senders, flattened (N, K*comm_dim).

    Distance-sorted like the reference's neighbour list (env_wrappers.py:
    129-139); messages are the senders' comm action slice from this step
    (:91-121); missing slots are zeros; `add_pos_in_comm` appends
    [dis/20, unit-dx, unit-dy] in the receiver's ego frame per message.
    """
    N = pos.shape[0]
    K = cfg.comm_neighbours
    diff = pos[None, :, :] - pos[:, None, :]                  # receiver, sender
    d2 = jnp.sum(diff * diff, axis=-1)
    pair_ok = (
        sender_valid[None, :]
        & ~jnp.eye(N, dtype=bool)
        & (d2 < cfg.neighbours_distance**2)
    )
    d2_sort = jnp.where(pair_ok, d2, jnp.inf)
    idx = jnp.argsort(d2_sort, axis=1)[:, :K]                 # (N, K)
    ok = jnp.take_along_axis(d2_sort, idx, axis=1) < jnp.inf  # (N, K)
    msgs = comm_msg[idx]                                      # (N, K, comm_size)
    if cfg.add_pos_in_comm:
        rel = jnp.take_along_axis(diff, idx[..., None], axis=1)   # (N, K, 2)
        cos_h = jnp.cos(heading)[:, None]
        sin_h = jnp.sin(heading)[:, None]
        fwd = rel[..., 0] * cos_h + rel[..., 1] * sin_h
        lat = -rel[..., 0] * sin_h + rel[..., 1] * cos_h
        dis = jnp.sqrt(jnp.maximum(fwd * fwd + lat * lat, 1e-12))
        extra = jnp.clip(
            jnp.stack(
                [dis / 20.0, (fwd / dis + 1.0) / 2.0, (lat / dis + 1.0) / 2.0],
                axis=-1,
            ),
            0.0, 1.0,
        )
        msgs = jnp.concatenate([msgs, extra], axis=-1)        # (N, K, comm_dim)
    msgs = jnp.where(ok[..., None], msgs, 0.0)
    return msgs.reshape(N, K * cfg.comm_dim)


def nearest_others_block(cfg: EnvConfig, pos, heading, speed, present):
    """4 features per K = cfg.lidar_num_others nearest in-range vehicles:
    ego-frame relative position (2) + relative velocity (2), each mapped to
    [0, 1]; zeros for missing slots (MetaDrive `lidar.num_others`
    `get_surrounding_vehicles_info`, SURVEY.md §2.2)."""
    N = pos.shape[0]
    K = cfg.lidar_num_others
    diff = pos[None, :, :] - pos[:, None, :]                  # to other, (N,N,2)
    d2 = jnp.sum(diff * diff, axis=-1)
    pair_ok = (
        present[None, :] & ~jnp.eye(N, dtype=bool)
        & (d2 < cfg.lidar_distance**2)
    )
    d2_sort = jnp.where(pair_ok, d2, jnp.inf)
    idx = jnp.argsort(d2_sort, axis=1)[:, :K]                 # (N, K)
    ok = jnp.take_along_axis(d2_sort, idx, axis=1) < jnp.inf
    rel = jnp.take_along_axis(diff, idx[..., None], axis=1)   # (N, K, 2)
    cos_h, sin_h = jnp.cos(heading)[:, None], jnp.sin(heading)[:, None]
    fwd = rel[..., 0] * cos_h + rel[..., 1] * sin_h
    lat = -rel[..., 0] * sin_h + rel[..., 1] * cos_h
    vel = jnp.stack([speed * jnp.cos(heading), speed * jnp.sin(heading)], -1)
    rel_v = vel[idx] - vel[:, None, :]                        # (N, K, 2)
    rv_f = rel_v[..., 0] * cos_h + rel_v[..., 1] * sin_h
    rv_l = -rel_v[..., 0] * sin_h + rel_v[..., 1] * cos_h
    feats = jnp.stack(
        [
            _to01(fwd / cfg.lidar_distance),
            _to01(lat / cfg.lidar_distance),
            _to01(rv_f / (2.0 * cfg.max_speed)),
            _to01(rv_l / (2.0 * cfg.max_speed)),
        ],
        axis=-1,
    )                                                          # (N, K, 4)
    feats = jnp.where(ok[..., None], feats, 0.0)
    return feats.reshape(N, 4 * K)


def build_obs(scene: SceneData, cfg: EnvConfig, *, pos, heading, speed, steering,
              yaw_rate, last_action, route_idx, waypoint_idx, s, lateral,
              lane_heading, lidar_block, lcf, t=None, comm_msg=None,
              comm_valid=None, present=None, toll_time=None):
    """Assemble the full observation (N, cfg.obs_dim). Inputs are per-slot."""
    left_w = scene.route_left_width[route_idx, waypoint_idx]
    right_w = scene.route_right_width[route_idx, waypoint_idx]
    width = jnp.maximum(left_w + right_w, 1e-3)

    # Ego block, MetaDrive 0.2.5 `StateObservation.vehicle_state` encodings:
    # boundary distances / ((lane_num+1)*lane_width); heading_diff encoded
    # against the lane's RIGHT normal (0.5 = aligned, <0.5 = pointing left);
    # speed as (km/h + 1)/(max + 1); yaw rate as UNSIGNED rad/s clipped to
    # [0, 1] (their arccos form); lateral vs the LANE center scaled by
    # 2/lane_width. Sign chirality validated by cross-evaluating the shipped
    # reference npz policies on this env (they lane-keep only under this
    # combination; every deviation leaves them paralyzed or wall-pinned).
    heading_err = wrap_angle(heading - lane_heading)
    speed_kmh = jnp.abs(speed) * 3.6
    total_w = width + cfg.lane_width
    # lane-offset dim reads against the lane the vehicle is IN (MetaDrive
    # `vehicle.lane.local_coordinates`), not the assigned route centerline
    lat_lane = lane_snapped_lateral(lateral, left_w, right_w, cfg.lane_width)
    # ego CORE block (MetaDrive vehicle_state middle scalars; the boundary /
    # lane-offset dims around it are replaced by detector rings when the
    # scene configures them — see EnvConfig detector comments)
    core = jnp.stack(
        [
            _to01(-jnp.sin(heading_err)),
            jnp.clip(
                (speed_kmh + 1.0)
                / ((cfg.obs_max_speed or cfg.max_speed) * 3.6 + 1.0),
                0.0, 1.0,
            ),
            _to01(steering / cfg.max_steering),
            _to01(last_action[..., 0]),
            _to01(last_action[..., 1]),
            jnp.clip(jnp.abs(yaw_rate), 0.0, 1.0),
        ],
        axis=-1,
    )
    if cfg.side_detector_lasers > 0:
        edge = static_detector(scene, cfg, pos, heading,
                               cfg.side_detector_lasers,
                               cfg.side_detector_distance)
    else:
        edge = jnp.stack(
            [
                jnp.clip((left_w - lateral) / total_w, 0.0, 1.0),
                jnp.clip((right_w + lateral) / total_w, 0.0, 1.0),
            ],
            axis=-1,
        )
    if cfg.lane_line_lasers > 0:
        lane_blk = lane_line_block(cfg, lat_lane, heading, lane_heading,
                                   cfg.lane_line_lasers,
                                   cfg.lane_line_distance)
    else:
        lane_blk = _to01(2.0 * lat_lane / cfg.lane_width)[..., None]

    parts = [edge, core, lane_blk]
    if cfg.navi_in_obs:
        parts.append(navi_block(scene, cfg, pos, heading, route_idx, s))
    parts.append(lidar_block)
    if cfg.lidar_num_others > 0:
        others = present if present is not None \
            else jnp.ones(pos.shape[:-1], dtype=bool)
        parts.append(nearest_others_block(cfg, pos, heading, speed, others))
    if cfg.toll_obs:
        # gate-state dim (TollGateObservation.observe): 0 outside the gate,
        # -1 inside unpaid or overspeeding, +1 inside once paid
        inz = in_zone(scene, pos)
        paid = toll_time >= cfg.toll_min_pass_time
        over = speed > cfg.zone_speed_limit
        flag = jnp.where(
            inz, jnp.where(paid & ~over, 1.0, -1.0), 0.0
        ).astype(jnp.float32)
        parts.append(flag[..., None])
    if cfg.add_traffic_light:
        parts.append(traffic_light_block(scene, cfg, pos, t))
    if cfg.lcf_enabled:
        parts.append(_to01(lcf)[..., None])
    if cfg.comm_method != "none":
        parts.append(comm_block(cfg, pos, heading, comm_msg, comm_valid))
    return jnp.concatenate(parts, axis=-1).astype(jnp.float32)
