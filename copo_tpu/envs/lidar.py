"""Vectorized lidar: static field sampling + dynamic ray-vs-vehicle tests.

MetaDrive raycasts 72 lasers per vehicle against the Bullet world each step
(C++; SURVEY.md §2.4). TPU-native split:
  * static obstacles -> one gather into the precomputed (H, W, A) distance
    field baked at scene-compile time (trilinear: bilinear in x,y, linear in
    beam angle);
  * vehicles -> analytic ray-circle tests against two discs per vehicle
    (capsule approximation of the 4.5 x 1.85 m body), fully vectorized over
    (agents x beams x others).
"""

from __future__ import annotations

import jax.numpy as jnp

from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.scene import SceneData


def beam_angles(cfg: EnvConfig, heading):
    """Absolute beam angles (..., L) for each agent: heading + k/L * 2pi."""
    L = cfg.lidar_num_lasers
    rel = 2.0 * jnp.pi * jnp.arange(L, dtype=jnp.float32) / L
    return heading[..., None] + rel


def sample_field(scene: SceneData, pos, ang, cap):
    """Sample the baked field at arbitrary absolute angles (..., L).

    Gather strategy (the hot op of the whole env step): instead of 8 scalar
    gathers per beam into the (H, W, A) table — which XLA lowers to slow
    random-access gathers — fetch the four bilinear-corner *angle rows*
    (contiguous (A,) vectors, one row gather each), blend them with the
    position weights, and do the per-beam angle lerp inside the tiny blended
    row. The bilinear weights are angle-independent, so the result is
    bit-identical to interpolating per beam; the big-table traffic drops from
    8·L scalar loads to 4 contiguous rows per agent (~70x less gather work,
    measured 13.6 ms -> sub-ms env step on one TPU chip at B=64, N=30).
    """
    H, W, A = scene.lidar_field.shape
    field_rows = scene.lidar_field.reshape(H * W, A)

    # fractional grid coordinates (cell centers at +0.5)
    g = (pos - scene.field_origin) / scene.field_cell - 0.5      # (..., 2)
    gx, gy = g[..., 0], g[..., 1]
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(gx - x0.astype(jnp.float32), 0.0, 1.0)[..., None]   # (..., 1)
    fy = jnp.clip(gy - y0.astype(jnp.float32), 0.0, 1.0)[..., None]

    flat = y0 * W + x0                                            # (...,)
    r00 = field_rows[flat]                                        # (..., A)
    r01 = field_rows[flat + 1]
    r10 = field_rows[flat + W]
    r11 = field_rows[flat + W + 1]
    row = (r00 * (1 - fx) * (1 - fy) + r01 * fx * (1 - fy)
           + r10 * (1 - fx) * fy + r11 * fx * fy)                 # (..., A)

    # Angle lerp as a one-hot contraction: minor-axis take_along_axis lowers
    # to a slow TPU gather (~6 ms at B=64, N=30), while the equivalent
    # row @ P^T with P[k, j] = (1-fa_k)·[j=a0_k] + fa_k·[j=a0_k+1] rides the
    # MXU (~1 ms) — XLA fuses the iota-compare one-hot into the matmul.
    ga = ang / (2.0 * jnp.pi) * A
    ga_floor = jnp.floor(ga)
    a0 = ga_floor.astype(jnp.int32) % A                           # (..., L)
    fa = ga - ga_floor                                            # (..., L)
    j = jnp.arange(A, dtype=jnp.int32)                            # (A,)
    hit0 = (j == a0[..., None]).astype(row.dtype)                 # (..., L, A)
    hit1 = (j == ((a0 + 1) % A)[..., None]).astype(row.dtype)
    P = (1.0 - fa)[..., None] * hit0 + fa[..., None] * hit1
    d = jnp.einsum("...j,...kj->...k", row, P)
    return jnp.minimum(d, cap)


def static_lidar(scene: SceneData, cfg: EnvConfig, pos, heading):
    """Sample the baked field: distances (..., L) to static walls, capped."""
    return sample_field(scene, pos, beam_angles(cfg, heading), cfg.lidar_distance)


def static_detector(scene: SceneData, cfg: EnvConfig, pos, heading, num_beams: int):
    """Normalized static-obstacle detector ring with an arbitrary beam count.

    Our equivalent of MetaDrive's side/lane-line detectors (static geometry
    only, no vehicles — matching their semantics of sensing road boundaries
    and booth walls). Returns (..., num_beams) in [0, 1]; 1 = clear.
    """
    rel = 2.0 * jnp.pi * jnp.arange(num_beams, dtype=jnp.float32) / num_beams
    ang = heading[..., None] + rel
    d = sample_field(scene, pos, ang, cfg.lidar_distance)
    return jnp.clip(d / cfg.lidar_distance, 0.0, 1.0)


def vehicle_lidar(cfg: EnvConfig, pos, heading, present):
    """Distances (N, L) from each agent's beams to other vehicles' bodies.

    Operates on one env instance: pos (N, 2), heading (N,), present (N,) bool
    (present = alive or still-decaying dead body). Vehicles are two discs of
    radius ~width/2*1.1 centered +-1/4 length along the body axis.
    """
    N = pos.shape[0]
    L = cfg.lidar_num_lasers
    r = 0.55 * cfg.vehicle_width + 0.35  # disc radius covering body corners
    off = 0.25 * cfg.vehicle_length

    fwd = jnp.stack([jnp.cos(heading), jnp.sin(heading)], axis=-1)       # (N, 2)
    centers = jnp.stack([pos + off * fwd, pos - off * fwd], axis=1)      # (N, 2, 2)
    centers = centers.reshape(2 * N, 2)                                  # (2N, 2)
    target_present = jnp.repeat(present, 2)                              # (2N,)
    target_owner = jnp.repeat(jnp.arange(N), 2)                          # (2N,)

    ang = beam_angles(cfg, heading)                                      # (N, L)
    d = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)                 # (N, L, 2)

    oc = centers[None, None, :, :] - pos[:, None, None, :]               # (N, 1, 2N, 2)
    b = jnp.sum(oc * d[:, :, None, :], axis=-1)                          # (N, L, 2N)
    c2 = jnp.sum(oc * oc, axis=-1)                                       # (N, 1, 2N)
    disc = r * r - (c2 - b * b)
    hit = (disc > 0.0) & (b > 0.0)
    t = b - jnp.sqrt(jnp.maximum(disc, 0.0))

    valid = (
        hit
        & target_present[None, None, :]
        & (target_owner[None, None, :] != jnp.arange(N)[:, None, None])
        & (t > 0.0)
    )
    t = jnp.where(valid, t, cfg.lidar_distance)
    return jnp.min(t, axis=-1)                                           # (N, L)


def lidar_scan(scene: SceneData, cfg: EnvConfig, pos, heading, present):
    """Full normalized lidar observation block (N, L) in [0, 1]; 1 = clear."""
    d_static = static_lidar(scene, cfg, pos, heading)
    d_vehicle = vehicle_lidar(cfg, pos, heading, present)
    d = jnp.minimum(d_static, d_vehicle)
    return jnp.clip(d / cfg.lidar_distance, 0.0, 1.0)
