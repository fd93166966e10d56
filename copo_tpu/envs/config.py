"""Typed env configuration (static) and per-run dynamic env parameters.

Mirrors the reference's env-side config surface (MetaDrive config keys
consumed at SURVEY.md §2.2 — `num_agents`, `horizon`, `crash_done`,
`neighbours_distance`, `delay_done`, lidar settings — plus the LCFEnv wrapper
config `copo_code/copo/torch_copo/utils/env_wrappers.py:161-187`) as two
dataclasses:

* `EnvConfig` — static, hashable, closed over at trace time (shapes/branches).
* `EnvParams` — dynamic pytree carried through jit (the knobs the trainer
  changes mid-run without recompiling: LCF distribution, curriculum agent
  count, forced LCF).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static env configuration. Hashable; safe to close over in jit."""

    # --- population ---
    num_agents: int = 30            # agent slots (max concurrent vehicles)
    horizon: int = 1000             # env episode length (steps)
    max_step_per_agent: int = 1000  # per-agent step cap
    delay_done: int = 25            # steps a terminated body stays as obstacle

    # --- termination ---
    crash_done: bool = True         # crash terminates the agent
    out_of_road_done: bool = True

    # --- neighbourhood (CCEnv/LCFEnv wrappers, env_wrappers.py:40,167) ---
    neighbours_distance: float = 40.0

    # --- lidar ---
    lidar_num_lasers: int = 72
    lidar_distance: float = 40.0
    lidar_num_others: int = 0       # extra nearest-K vehicle features (0 in scenes used)

    # --- reward (MetaDrive 0.2.5 semantics; see envs/reward notes) ---
    driving_reward: float = 1.0
    speed_reward: float = 0.1
    success_reward: float = 10.0
    out_of_road_penalty: float = 5.0
    crash_vehicle_penalty: float = 10.0
    crash_vehicle_cost: float = 1.0
    out_of_road_cost: float = 1.0
    use_lateral_reward: bool = False

    # --- vehicle / dynamics ---
    vehicle_length: float = 4.5
    vehicle_width: float = 1.85
    wheelbase: float = 2.6
    max_speed: float = 22.2         # m/s (~80 km/h)
    max_steering: float = 0.6981    # rad (40 deg)
    max_accel: float = 5.0          # m/s^2
    max_brake: float = 8.0          # m/s^2
    drag_decel: float = 0.4         # m/s^2 rolling/drag deceleration
    steering_smooth: float = 0.6    # low-pass factor toward commanded steering
    dt: float = 0.1                 # seconds per env step (MetaDrive 0.02 x 5)

    # --- respawn ---
    spawn_clear_radius: float = 8.0  # spawn point must be this clear of vehicles

    # --- LCF wrapper (SVOEnv/LCFEnv; "svo" in the TF reference) ---
    lcf_enabled: bool = False       # append (lcf+1)/2 obs slot, sample per agent
    lcf_dist: str = "normal"        # "normal" | "uniform"
    lcf_mode: str = "angle"         # "angle" | "linear" blending of coordinated reward
    return_native_reward: bool = True

    # --- scene-specific extra observation dims (bottleneck +5, tollgate +65) ---
    obs_extra_dim: int = 0

    @property
    def base_obs_dim(self) -> int:
        """Observation dim before the optional LCF slot: ego(9)+navi(10)+lidar."""
        return 9 + 10 + self.lidar_num_lasers + 4 * self.lidar_num_others + self.obs_extra_dim

    @property
    def obs_dim(self) -> int:
        return self.base_obs_dim + (1 if self.lcf_enabled else 0)

    @property
    def action_dim(self) -> int:
        return 2


@struct.dataclass
class EnvParams:
    """Dynamic env parameters (changed by the trainer without recompile).

    Replaces the reference's `env.set_lcf_dist` RPC fan-out
    (`torch_copo/algo_copo.py:600-613`) and the curriculum env-rebuild
    (`algo_ippo/ippo_cl.py:19-78`): here they are plain array inputs to the
    jitted step.
    """

    lcf_mean: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    lcf_std: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.1))
    # force_lcf == -100.0 means "not forced" (reference sentinel, env_wrappers.py:183)
    force_lcf: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(-100.0))
    # curriculum: respawn only while active agents < target (ippo_cl semantics)
    target_num_agents: jnp.ndarray = struct.field(default_factory=lambda: jnp.int32(10**9))

    @classmethod
    def default(cls, num_agents: int) -> "EnvParams":
        return cls(target_num_agents=jnp.int32(num_agents))
