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

import functools

import jax
import jax.numpy as jnp
import numpy as np

from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.scene import SceneData


def beam_angles(cfg: EnvConfig, heading):
    """Absolute beam angles (..., L) for each agent: heading - k/L * 2pi.

    Beam order is CLOCKWISE from the heading (beam 0 dead ahead, beam 1 to
    the right) — the ordering under which the reference's shipped npz
    policies evade correctly on this env (mirrored order halves their
    cross-eval success: they dodge INTO the traffic they see)."""
    L = cfg.lidar_num_lasers
    rel = 2.0 * jnp.pi * jnp.arange(L, dtype=jnp.float32) / L
    return heading[..., None] - rel


def _field_rows(scene: SceneData, pos):
    """Bilinear-in-(x,y) angle rows of the baked field: (..., A).

    Instead of 8 scalar gathers per beam into the (H, W, A) table — which XLA
    lowers to slow random-access gathers — fetch the four bilinear-corner
    *angle rows* (contiguous (A,) vectors, one row gather each) and blend them
    with the position weights. The bilinear weights are angle-independent, so
    interpolating the blended row per beam is bit-identical to interpolating
    per beam in the big table (~70x less gather traffic).
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
    return (r00 * (1 - fx) * (1 - fy) + r01 * fx * (1 - fy)
            + r10 * (1 - fx) * fy + r11 * fx * fy)                # (..., A)


@functools.lru_cache(maxsize=None)
def _ring_dft_mats(A: int, L: int):
    """Constant matrices for exact circular shift-with-stride via real DFT.

    For a uniform L-beam ring over A baked angle bins with integer stride
    c = A/L, the per-beam angle interpolation collapses to
    `y[k] = blended[(s + k*c) mod A]` with one integer shift s and one shared
    lerp fraction per agent. A data-dependent circular shift is a phase
    rotation in Fourier space (shift theorem), so it becomes four tiny
    matmuls that ride the MXU with O(...·A) intermediates — replacing the
    earlier one-hot contraction whose (..., L, A) operand cost ~425 MB per
    intermediate at B=512, N=40 (VERDICT r2 weak #2, the rollout
    batch-size cliff)."""
    c = A // L
    M = A // 2 + 1
    m = np.arange(M, dtype=np.float64)[:, None]          # (M, 1)
    j = np.arange(A, dtype=np.float64)[None, :]          # (1, A)
    k = np.arange(L, dtype=np.float64)[None, :]          # (1, L)
    CJ = np.cos(2 * np.pi * m * j / A).T                 # (A, M) forward cos
    SJ = np.sin(2 * np.pi * m * j / A).T                 # (A, M) forward sin
    w = np.full((M, 1), 2.0 / A)
    w[0] = 1.0 / A
    if A % 2 == 0:
        w[-1] = 1.0 / A
    # CLOCKWISE ring: y[k] = row[(s - k*c) mod A] — beam 0 dead ahead,
    # beam 1 to the RIGHT, matching `beam_angles` (MetaDrive uses one
    # perceive() for lidar and the side/lane-line detectors, so all rings
    # share the clockwise-from-heading order the r3 cross-eval established)
    ICK = w * np.cos(2 * np.pi * m * (-k * c) / A)       # (M, L) inverse cos
    ISK = w * np.sin(2 * np.pi * m * (-k * c) / A)       # (M, L) inverse sin
    # numpy (not jnp): device constants created inside a trace would leak
    # tracers out through the cache.
    f32 = lambda x: np.asarray(x, dtype=np.float32)
    return f32(CJ), f32(SJ), f32(ICK), f32(ISK)


def _ring_resample_dft(row, base, L: int):
    """y[k] = lerp-sampled row at bin (base + k*A/L), k=0..L-1, A%L == 0.

    `row` (..., A) are field values at the A uniform angle bins; `base` (...,)
    is the fractional bin coordinate of beam 0; beams step CLOCKWISE
    (descending bins). Exact linear interpolation
    (identical to per-beam two-point lerp up to f32 rounding): the shared
    fraction is folded into `blended`, then the integer shift is applied as a
    Fourier phase rotation. All matmuls use HIGHEST precision — the matrices
    are (A, A/2+1), so the cost is negligible while bf16 accumulation would
    corrupt distances by ~1%."""
    A = row.shape[-1]
    s = jnp.floor(base)
    f = (base - s)[..., None]                                     # (..., 1)
    s = s.astype(jnp.int32) % A
    blended = (1.0 - f) * row + f * jnp.roll(row, -1, axis=-1)    # (..., A)

    CJ, SJ, ICK, ISK = _ring_dft_mats(A, L)
    hp = jax.lax.Precision.HIGHEST
    Fc = jnp.matmul(blended, CJ, precision=hp)                    # (..., M)
    Fs = jnp.matmul(blended, SJ, precision=hp)
    M = CJ.shape[1]
    theta = (2.0 * jnp.pi / A) * s[..., None].astype(jnp.float32) \
        * jnp.arange(M, dtype=jnp.float32)                        # (..., M)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    Gc = Fc * ct + Fs * st
    Gs = Fs * ct - Fc * st
    return (jnp.matmul(Gc, ICK, precision=hp)
            + jnp.matmul(Gs, ISK, precision=hp))                  # (..., L)


def sample_field(scene: SceneData, pos, ang, cap):
    """Sample the baked field at arbitrary absolute angles (..., L).

    General path: two `take_along_axis` gathers into the blended angle row.
    Only used when the beam pattern is not a uniform integer-stride ring
    (e.g. tollgate's 64-beam detector over 72 bins); the hot lidar path goes
    through `sample_field_ring`."""
    A = scene.lidar_field.shape[2]
    row = _field_rows(scene, pos)
    ga = ang / (2.0 * jnp.pi) * A
    ga_floor = jnp.floor(ga)
    a0 = ga_floor.astype(jnp.int32) % A                           # (..., L)
    fa = ga - ga_floor
    d0 = jnp.take_along_axis(row, a0, axis=-1)
    d1 = jnp.take_along_axis(row, (a0 + 1) % A, axis=-1)
    return jnp.minimum((1.0 - fa) * d0 + fa * d1, cap)


def sample_field_ring(scene: SceneData, pos, heading, num_beams: int, cap):
    """Sample a uniform `num_beams` CLOCKWISE ring from `heading` (..., beams)."""
    A = scene.lidar_field.shape[2]
    if A % num_beams == 0:
        row = _field_rows(scene, pos)
        base = heading / (2.0 * jnp.pi) * A                       # (...,)
        return jnp.minimum(_ring_resample_dft(row, base, num_beams), cap)
    rel = 2.0 * jnp.pi * jnp.arange(num_beams, dtype=jnp.float32) / num_beams
    return sample_field(scene, pos, heading[..., None] - rel, cap)


def static_lidar(scene: SceneData, cfg: EnvConfig, pos, heading):
    """Sample the baked field: distances (..., L) to static walls, capped."""
    return sample_field_ring(scene, pos, heading, cfg.lidar_num_lasers,
                             cfg.lidar_distance)


def static_detector(scene: SceneData, cfg: EnvConfig, pos, heading,
                    num_beams: int, distance: float | None = None):
    """Normalized static-obstacle detector ring with an arbitrary beam count.

    Our equivalent of MetaDrive's side/lane-line detectors (static geometry
    only, no vehicles — their semantics of sensing road boundaries and booth
    walls; the scene's field must be baked with lidar_range >= distance).
    Returns (..., num_beams) in [0, 1]; 1 = clear at `distance`.
    """
    distance = cfg.lidar_distance if distance is None else distance
    # Detector rings start at heading - 90deg (first beam to the RIGHT),
    # stepping clockwise — decoded from the shipped bottleneck policy's
    # steering-gradient signature: its position-0 input behaves like the
    # right-side distance and position-2 like the left-side distance
    # (matching the intersection policy's edgeR/edgeL signatures).
    d = sample_field_ring(scene, pos, heading - 0.5 * jnp.pi, num_beams,
                          distance)
    return jnp.clip(d / distance, 0.0, 1.0)


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
    dx, dy = jnp.cos(ang), jnp.sin(ang)                                  # (N, L)

    # Component-wise ray-disc math (no stacked (..., 2) coordinate tensors):
    # keeping x/y as separate scalars lets XLA fuse the whole elementwise
    # chain into the min-reduction instead of materializing broadcast
    # (N, 1, 2N, 2) / (N, L, 2N) intermediates in HBM — measured 1.93 ->
    # 1.24 ms per call at B=512 (lidar was ~36% of the rollout step, r5
    # bisect artifacts/r5/rollout_bisect.json).
    ocx = centers[None, None, :, 0] - pos[:, None, None, 0]              # (N, 1, 2N)
    ocy = centers[None, None, :, 1] - pos[:, None, None, 1]
    b = ocx * dx[:, :, None] + ocy * dy[:, :, None]                      # (N, L, 2N)
    c2 = ocx * ocx + ocy * ocy                                           # (N, 1, 2N)
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
    """Full normalized lidar observation block (N, L) in [0, 1]; 1 = clear.

    Vehicles-only by default (`cfg.lidar_see_static`): MetaDrive's vehicle
    lidar raycasts against dynamic bodies, not the road geometry — boundary
    awareness comes from the ego-state dims. See EnvConfig.lidar_see_static.
    """
    d = vehicle_lidar(cfg, pos, heading, present)
    if cfg.lidar_see_static:
        # sample_field_ring beams are clockwise-from-heading, the same
        # order as vehicle beams (beam_angles) — combine directly
        d = jnp.minimum(static_lidar(scene, cfg, pos, heading), d)
    return jnp.clip(d / cfg.lidar_distance, 0.0, 1.0)
