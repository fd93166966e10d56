"""Observation kernel: ego state + navigation + lidar (+ scene extras + LCF).

Rebuilds the observation contract the reference consumes from MetaDrive 0.2.5
(SURVEY.md §2.2): flat float Box normalized to [0, 1], dims 91 (Intersection /
Roundabout / Parking = 9 ego + 10 navi + 72 lidar), 96 (Bottleneck, +5 scene
extras), 156 (Tollgate, +65 extras), +1 LCF slot when the CoPO wrapper is on
(`env_wrappers.py:393-418` appends (lcf+1)/2).

Layout (documented deviation: MetaDrive's navi checkpoints are road-block
boundaries; ours are fixed +20 m / +40 m arc-length lookaheads on the route —
same information role, simpler static-shape math):
  [0]   left drivable-edge distance / ((lane_num+1)*lane_width)
  [1]   right drivable-edge distance / ((lane_num+1)*lane_width)
  [2]   heading diff vs lane right-normal: (1 - sin(err))/2, 0.5 = aligned
  [3]   (speed km/h + 1) / (max km/h + 1)
  [4]   steering / max_steering, mapped to [0,1]
  [5:7] last action, mapped to [0,1]
  [6+1] |yaw rate| rad/s, clipped to [0,1]
  [8]   (1 + 2*lateral/lane_width)/2: lane-center offset, left-positive
  [9:19]  2 checkpoints x [fwd proj, side proj (right-pos), bend radius/100,
          clockwise flag, bend angle (0.5 = straight)] — MetaDrive
          get_navi_info schema; projections saturate in norm at 50 m then
          map (x/50+1)/2; bend angle maps (x+1)/2 like MetaDrive's sweep
          angle so straights read 0.5
  [19:19+L] lidar distances / range (1 = clear)
  [...obs_extra_dim] scene-specific block: zeros, or (obs_extra_dim-1)
          static-detector beams + 1 in-zone flag when obs_extra_kind="detector"
  [+3]  traffic-light msg + bbox-normalized position when cfg.add_traffic_light
        (env_wrappers.py:258-272)
  [+1]  (lcf+1)/2 when cfg.lcf_enabled
  [+K*comm_dim] neighbours' comm messages when cfg.comm_method != "none"
        (env_wrappers.py:363-376; append order matches the reference)
"""

from __future__ import annotations

import jax.numpy as jnp

from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.dynamics import wrap_angle
from copo_tpu.envs.lidar import static_detector
from copo_tpu.envs.routing import route_point_at
from copo_tpu.envs.scene import SceneData

#: lookahead arc lengths of the two navigation checkpoints
NAVI_LOOKAHEAD = (20.0, 40.0)


def _to01(x):
    """Map a [-1, 1]-clipped value to [0, 1]."""
    return 0.5 * (jnp.clip(x, -1.0, 1.0) + 1.0)


#: checkpoint projections saturate at this distance (MetaDrive NAVI_POINT_DIST)
NAVI_POINT_DIST = 50.0


def navi_block(scene: SceneData, cfg: EnvConfig, pos, heading, route_idx, s):
    """Navigation features (N, 10): two route checkpoints, MetaDrive encoding.

    Per checkpoint: [fwd projection, side projection (right-positive),
    bend radius, clockwise flag, bend angle] — the 0.2.5 Navigation
    `get_navi_info` schema. The projection vector saturates in NORM at 50 m
    (direction preserved), then each component maps (x/50+1)/2. Checkpoints
    are +20/+40 m route lookaheads (documented deviation: MetaDrive uses
    block-boundary nodes; fixed lookaheads carry the same lane-following/turn
    information with static shapes). Chirality (right-positive side, clockwise
    flag) picked by cross-evaluating the reference's shipped npz policies —
    the combination under which they drive best.
    """
    route_len = scene.route_len[route_idx]
    feats = []
    cos_h, sin_h = jnp.cos(heading), jnp.sin(heading)
    for ahead in NAVI_LOOKAHEAD:
        s_ck = jnp.minimum(s + ahead, route_len)
        ck_pos, ck_heading, curv = route_point_at(scene, route_idx, s_ck)
        rel = ck_pos - pos
        fwd = rel[..., 0] * cos_h + rel[..., 1] * sin_h
        left = -rel[..., 0] * sin_h + rel[..., 1] * cos_h
        nrm = jnp.sqrt(jnp.maximum(fwd * fwd + left * left, 1e-9))
        sat = jnp.where(nrm > NAVI_POINT_DIST, NAVI_POINT_DIST / nrm, 1.0)
        radius = jnp.where(
            jnp.abs(curv) > 1e-3, 1.0 / jnp.maximum(jnp.abs(curv), 1e-3), 0.0
        )
        feats += [
            _to01(fwd * sat / NAVI_POINT_DIST),
            _to01(-left * sat / NAVI_POINT_DIST),       # right-positive
            jnp.clip(radius / 100.0, 0.0, 1.0),
            _to01(-jnp.sign(curv)),                     # 1 = clockwise turn
            # bend-angle magnitude through the (x+1)/2 map: MetaDrive 0.2.5
            # encodes the block sweep angle as clip((deg/angle_max+1)/2), so
            # straight lanes read 0.5 (not 0) and bends rise toward 1
            _to01(jnp.clip(jnp.abs(curv) * 30.0 / jnp.pi, 0.0, 1.0)),
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


def in_zone(scene: SceneData, pos):
    """Bool (...,): inside the scene's special zone (all-zeros zone = never)."""
    z = scene.zone
    has_zone = (z[1] > z[0]) & (z[3] > z[2])
    inside = (
        (pos[..., 0] >= z[0]) & (pos[..., 0] <= z[1])
        & (pos[..., 1] >= z[2]) & (pos[..., 1] <= z[3])
    )
    return inside & has_zone


def extras_block(scene: SceneData, cfg: EnvConfig, pos, heading):
    """Scene-specific obs block (..., obs_extra_dim).

    "detector": (obs_extra_dim-1) static-obstacle beams + in-zone flag — our
    information-equivalent of MetaDrive's side/lane-line detectors and gate
    state (exact channels live outside the reference repo; SURVEY.md §2.2).
    """
    if cfg.obs_extra_kind == "detector" and cfg.obs_extra_dim >= 2:
        det = static_detector(scene, cfg, pos, heading, cfg.obs_extra_dim - 1)
        flag = in_zone(scene, pos).astype(jnp.float32)[..., None]
        return jnp.concatenate([det, flag], axis=-1)
    return jnp.zeros(pos.shape[:-1] + (cfg.obs_extra_dim,), dtype=jnp.float32)


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
              comm_valid=None, present=None):
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
    ego = jnp.stack(
        [
            jnp.clip((left_w - lateral) / total_w, 0.0, 1.0),
            jnp.clip((right_w + lateral) / total_w, 0.0, 1.0),
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
            _to01(2.0 * lat_lane / cfg.lane_width),
        ],
        axis=-1,
    )
    navi = navi_block(scene, cfg, pos, heading, route_idx, s)

    parts = [ego, navi, lidar_block]
    if cfg.lidar_num_others > 0:
        others = present if present is not None \
            else jnp.ones(pos.shape[:-1], dtype=bool)
        parts.append(nearest_others_block(cfg, pos, heading, speed, others))
    if cfg.obs_extra_dim > 0:
        parts.append(extras_block(scene, cfg, pos, heading))
    if cfg.add_traffic_light:
        parts.append(traffic_light_block(scene, cfg, pos, t))
    if cfg.lcf_enabled:
        parts.append(_to01(lcf)[..., None])
    if cfg.comm_method != "none":
        parts.append(comm_block(cfg, pos, heading, comm_msg, comm_valid))
    return jnp.concatenate(parts, axis=-1).astype(jnp.float32)
