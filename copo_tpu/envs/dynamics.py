"""Kinematic bicycle-model vehicle dynamics as pure jnp ops.

Replaces the Bullet rigid-body step MetaDrive performs in C++ per vehicle
(SURVEY.md §2.4) with a vectorized kinematic bicycle model: one fused update
for all (B, N) vehicles. Action semantics follow the reference contract
(SURVEY.md §2.2): Box(2,) in [-1,1] = [steering, throttle/brake].
"""

from __future__ import annotations

import jax.numpy as jnp

from copo_tpu.envs.config import EnvConfig


def step_dynamics(cfg: EnvConfig, pos, heading, speed, steering, actions):
    """Advance vehicle state by one env step (dt seconds).

    All inputs are arrays over agent slots (leading dims arbitrary):
      pos (..., 2), heading (...), speed (...), steering (...), actions (..., 2)
    Returns (pos', heading', speed', steering', yaw_rate).
    """
    a_steer = jnp.clip(actions[..., 0], -1.0, 1.0)
    a_throttle = jnp.clip(actions[..., 1], -1.0, 1.0)

    # Low-pass toward the commanded wheel angle (discrete stand-in for the
    # steering actuator dynamics Bullet integrates).
    target = a_steer * cfg.max_steering
    new_steering = steering + cfg.steering_smooth * (target - steering)

    # Negative throttle brakes while moving forward; held at standstill it
    # engages reverse ONLY when cfg.enable_reverse (MetaDrive 0.2.5
    # `vehicle_config["enable_reverse"]`, default False — only the parking
    # scene enables it). With reverse off, a policy holding the brake stays
    # parked, exactly like MetaDrive; free reverse let cautious policies
    # creep backwards off-road (cross-eval of the shipped CoPO policies
    # showed out-of-road exits at full reverse speed the reference env
    # cannot produce).
    accel = jnp.where(a_throttle >= 0.0, a_throttle * cfg.max_accel, a_throttle * cfg.max_brake)
    new_speed = speed + accel * cfg.dt
    # rolling/drag deceleration always opposes motion (toward zero)
    drag = cfg.drag_decel * cfg.dt
    new_speed = jnp.where(
        new_speed > 0.0,
        jnp.maximum(new_speed - drag, 0.0),
        jnp.minimum(new_speed + drag, 0.0),
    )
    reverse_cap = cfg.max_reverse_speed if cfg.enable_reverse else 0.0
    new_speed = jnp.clip(new_speed, -reverse_cap, cfg.max_speed)

    # Tire-grip cornering cap (see EnvConfig.lat_accel_max): shed speed at a
    # bounded scrub rate until v^2 |tan(delta)| / L <= a_lat_max.
    if cfg.lat_accel_max > 0.0:
        v_grip = jnp.sqrt(
            cfg.lat_accel_max * cfg.wheelbase
            / jnp.maximum(jnp.abs(jnp.tan(new_steering)), 1e-4)
        )
        over = new_speed > v_grip
        new_speed = jnp.where(
            over,
            jnp.maximum(v_grip, new_speed - cfg.grip_scrub_decel * cfg.dt),
            new_speed,
        )

    # Kinematic bicycle: yaw rate = v/L * tan(delta), integrated midpoint.
    avg_speed = 0.5 * (speed + new_speed)
    yaw_rate = avg_speed / cfg.wheelbase * jnp.tan(new_steering)
    new_heading = heading + yaw_rate * cfg.dt
    mid_heading = heading + 0.5 * yaw_rate * cfg.dt
    delta = jnp.stack(
        [avg_speed * jnp.cos(mid_heading) * cfg.dt, avg_speed * jnp.sin(mid_heading) * cfg.dt],
        axis=-1,
    )
    new_pos = pos + delta
    return new_pos, new_heading, new_speed, new_steering, yaw_rate


def wrap_angle(theta):
    """Wrap angle(s) to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))
