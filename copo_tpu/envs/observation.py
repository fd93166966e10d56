"""Observation kernel: ego state + navigation + lidar (+ scene extras + LCF).

Rebuilds the observation contract the reference consumes from MetaDrive 0.2.5
(SURVEY.md §2.2): flat float Box normalized to [0, 1], dims 91 (Intersection /
Roundabout / Parking = 9 ego + 10 navi + 72 lidar), 96 (Bottleneck, +5 scene
extras), 156 (Tollgate, +65 extras), +1 LCF slot when the CoPO wrapper is on
(`env_wrappers.py:393-418` appends (lcf+1)/2).

Layout (documented deviation: MetaDrive's navi checkpoints are road-block
boundaries; ours are fixed +20 m / +40 m arc-length lookaheads on the route —
same information role, simpler static-shape math):
  [0]   left drivable-edge distance, / road width
  [1]   right drivable-edge distance, / road width
  [2]   heading error vs lane direction, /(pi/2), mapped to [0,1]
  [3]   speed / max_speed
  [4]   steering / max_steering, mapped to [0,1]
  [5:7] last action, mapped to [0,1]
  [6+1] yaw rate /2 rad/s, mapped to [0,1]
  [8]   signed lateral offset / road width, mapped to [0,1]
  [9:19]  2 checkpoints x [fwd/50, lat/50, heading diff/pi, curvature/0.2,
          route completion], each mapped to [0,1]
  [19:19+L] lidar distances / range (1 = clear)
  [...obs_extra_dim] scene-specific block (zeros unless the scene fills it)
  [-1]  (lcf+1)/2 when cfg.lcf_enabled
"""

from __future__ import annotations

import jax.numpy as jnp

from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.dynamics import wrap_angle
from copo_tpu.envs.routing import route_point_at
from copo_tpu.envs.scene import SceneData

#: lookahead arc lengths of the two navigation checkpoints
NAVI_LOOKAHEAD = (20.0, 40.0)


def _to01(x):
    """Map a [-1, 1]-clipped value to [0, 1]."""
    return 0.5 * (jnp.clip(x, -1.0, 1.0) + 1.0)


def navi_block(scene: SceneData, cfg: EnvConfig, pos, heading, route_idx, s):
    """Navigation features (N, 10): two route checkpoints in ego frame."""
    route_len = scene.route_len[route_idx]
    feats = []
    cos_h, sin_h = jnp.cos(heading), jnp.sin(heading)
    for ahead in NAVI_LOOKAHEAD:
        s_ck = jnp.minimum(s + ahead, route_len)
        ck_pos, ck_heading, curv = route_point_at(scene, route_idx, s_ck)
        rel = ck_pos - pos
        fwd = rel[..., 0] * cos_h + rel[..., 1] * sin_h
        lat = -rel[..., 0] * sin_h + rel[..., 1] * cos_h
        dh = wrap_angle(ck_heading - heading)
        feats += [
            _to01(fwd / 50.0),
            _to01(lat / 50.0),
            _to01(dh / jnp.pi),
            _to01(curv / 0.2),
            jnp.clip(s_ck / jnp.maximum(route_len, 1e-3), 0.0, 1.0),
        ]
    return jnp.stack(feats, axis=-1)


def build_obs(scene: SceneData, cfg: EnvConfig, *, pos, heading, speed, steering,
              yaw_rate, last_action, route_idx, s, lateral, lane_heading,
              lidar_block, lcf):
    """Assemble the full observation (N, cfg.obs_dim). Inputs are per-slot."""
    left_w = scene.route_left_width[route_idx]
    right_w = scene.route_right_width[route_idx]
    width = jnp.maximum(left_w + right_w, 1e-3)

    heading_err = wrap_angle(heading - lane_heading)
    ego = jnp.stack(
        [
            jnp.clip((left_w - lateral) / width, 0.0, 1.0),
            jnp.clip((right_w + lateral) / width, 0.0, 1.0),
            _to01(heading_err / (0.5 * jnp.pi)),
            jnp.clip(speed / cfg.max_speed, 0.0, 1.0),
            _to01(steering / cfg.max_steering),
            _to01(last_action[..., 0]),
            _to01(last_action[..., 1]),
            _to01(yaw_rate / 2.0),
            _to01(lateral / width),
        ],
        axis=-1,
    )
    navi = navi_block(scene, cfg, pos, heading, route_idx, s)

    parts = [ego, navi, lidar_block]
    if cfg.obs_extra_dim > 0:
        parts.append(jnp.zeros(pos.shape[:-1] + (cfg.obs_extra_dim,), dtype=jnp.float32))
    if cfg.lcf_enabled:
        parts.append(_to01(lcf)[..., None])
    return jnp.concatenate(parts, axis=-1).astype(jnp.float32)
