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
    # MetaDrive MA horizon semantics: at `horizon` the spawn manager stops
    # respawning but the episode CONTINUES until every surviving agent
    # reaches a terminal state (the reference's training stats sum
    # success+crash+out to ~1.0 with max_step == 0.000 — shipped CoPO trial
    # progress.csv — impossible under a hard cut, which dumps ~18% of agents
    # into a max_step bucket mid-route). With `horizon_grace` True, done_all
    # fires once no agent is alive after the horizon (bounded by
    # horizon + max_step_per_agent via the per-agent cap). False restores
    # the hard cut (used by tests that need exact episode lengths).
    horizon_grace: bool = True

    # --- termination ---
    # MetaDrive's multi-agent default terminates an agent on crash
    # (crash_done=True) and out-of-road; the published runs use the MA
    # defaults (their params.json configures only `neighbours_distance`/
    # `start_seed`) and the eval drivers pass crash_done=True explicitly
    # (`eval/evaluate_population.py:106-132`).
    crash_done: bool = True         # crash terminates the agent
    out_of_road_done: bool = True

    # --- neighbourhood (CCEnv/LCFEnv wrappers, env_wrappers.py:40,167) ---
    neighbours_distance: float = 40.0

    # --- lidar ---
    lidar_num_lasers: int = 72
    lidar_distance: float = 40.0
    lidar_num_others: int = 0       # extra nearest-K vehicle features (0 in scenes used)
    # MetaDrive's 72-beam vehicle lidar senses only OTHER VEHICLES/objects;
    # road boundaries are sensed through the ego boundary-distance dims (and
    # the separate side detectors, absent in the MA configs). Mixing static
    # walls into the lidar makes every wall read as stationary traffic —
    # cross-eval of the reference's shipped ippo_inter.npz on this env goes
    # from 0% success (paralyzed at 1.6 km/h, braking at phantom traffic) to
    # driving at the reference's own 17 km/h average once the statics are
    # removed. Kept as a flag for the tollgate/bottleneck detector extras.
    lidar_see_static: bool = False

    # --- reward (MetaDrive 0.2.5 reward_function semantics: dense progress
    #     with lane-keeping lateral factor + speed term; terminal events
    #     REPLACE the step reward with the bonus/penalty) ---
    driving_reward: float = 1.0
    speed_reward: float = 0.1
    success_reward: float = 10.0
    out_of_road_penalty: float = 5.0
    crash_vehicle_penalty: float = 10.0
    crash_vehicle_cost: float = 1.0
    out_of_road_cost: float = 1.0
    use_lateral_reward: bool = True
    lane_width: float = 3.5         # lateral factor = clip(1 - 2|lat|/w, 0, 1)

    # --- vehicle / dynamics (calibrated against the shipped eval CSVs:
    #     reference vehicles average 14-17 km/h with observed max ~29 km/h,
    #     `eval/demo_results/evaluate_results/copo_inter_0.csv` velocity
    #     columns; MetaDrive's `vehicle.speed` is km/h) ---
    vehicle_length: float = 4.5
    vehicle_width: float = 1.85
    # collision boxes are deflated by this much per side: Bullet registers
    # crash_vehicle contacts via impulse-bearing manifolds, which grazing
    # passes of the visual boxes don't produce — exact-box overlap over-fires
    # vs the reference (cross-eval: ippo_inter crash 0.54 vs home 0.33)
    collision_shrink: float = 0.25
    wheelbase: float = 2.6
    max_speed: float = 11.1         # m/s (40 km/h)
    # speed-obs normalizer (m/s); 0 = use max_speed. MetaDrive's speed dim is
    # (km/h + 1)/(vehicle.max_speed + 1) with a config max_speed well above
    # the typical cruise speed, so trained policies see mid-range values —
    # a tighter normalizer makes them read "fast" too early and brake.
    obs_max_speed: float = 0.0
    max_reverse_speed: float = 3.0  # m/s reverse cap (when enable_reverse)
    # MetaDrive 0.2.5 `vehicle_config["enable_reverse"]` — False everywhere
    # except MultiAgentParkingLotEnv; with it off, brake at standstill holds
    enable_reverse: bool = False
    max_steering: float = 0.6981    # rad (40 deg)
    max_accel: float = 2.5          # m/s^2
    max_brake: float = 6.0          # m/s^2
    # Tire-grip envelope: cornering speed is capped so lateral acceleration
    # v^2 * tan(steer) / wheelbase stays under this bound (Bullet's tire
    # friction does the same in MetaDrive — without it the kinematic model
    # corners at 4g, the junction never forces a slow-down, and "yield before
    # turning" can't emerge; reference vehicles average 14-17 km/h with max
    # ~29 in `eval/demo_results/evaluate_results/copo_inter_0.csv`).
    # 0 disables the cap.
    lat_accel_max: float = 4.0      # m/s^2
    grip_scrub_decel: float = 6.0   # m/s^2 rate of speed shed when over grip
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

    # --- boundary detectors (MetaDrive 0.2.5 StateObservation.vehicle_state:
    #     when side_detector / lane_line_detector lasers are configured, the
    #     detector cloud points REPLACE the 2 boundary-distance dims at the
    #     START of the ego block and the 1 lane-offset dim at its END.
    #     Bottleneck 96 = [side 4 | core 6 | lane-line 4 | navi 10 | lidar 72];
    #     tollgate 156 = [side 72 | core 6 | lane-line 5 | lidar 72 | toll 1]
    #     with NO navi block (TollGateStateObservation drops navigation on the
    #     straight toll road). Layouts recovered from the shipped npz
    #     first-layer weight-norm block structure.) ---
    side_detector_lasers: int = 0
    side_detector_distance: float = 50.0
    lane_line_lasers: int = 0
    lane_line_distance: float = 20.0
    navi_in_obs: bool = True
    # --- tollgate stop-and-wait (MetaDrive marl_tollgate semantics: the
    #     vehicle must stay inside the gate under the block speed limit for
    #     `min_pass_time` steps before the gate "opens"; the toll obs dim
    #     reads -1 unpaid-or-overspeeding / +1 paid inside the gate, 0
    #     outside; running the gate unpaid = hitting the boom barrier =
    #     crash) ---
    toll_obs: bool = False
    toll_min_pass_time: int = 30
    # overspeeding INSIDE the gate terminates the vehicle as a crash
    # (MetaDrive's published tollgate table — IPPO 4.4% success — is only
    # consistent with a hard failure for breaking the gate speed limit, not
    # a shaping penalty a policy could simply ignore). The fatal threshold
    # carries a 1.3x grace band over zone_speed_limit (engine.py) so queue
    # creep stays legal.
    toll_overspeed_crash: bool = True
    # scenes may define a special zone (tollgate plaza / bottleneck throat)
    # with a speed limit; > 0 enables the overspeed penalty inside the zone
    # (MetaDrive: overspeed cancels the speed reward and charges
    # overspeed_penalty * speed / max_speed instead)
    zone_speed_limit: float = 0.0
    overspeed_penalty: float = 0.0

    # --- scene identity (replay metadata, set by `make_scene`: lets the
    #     eval driver rebuild the EXACT trained env from params.json instead
    #     of name-sniffing the trial directory — the reference's eval reads
    #     the trial's params.json the same way, `eval.py:66-139`) ---
    scene_name: str = ""
    scene_kwargs: tuple = ()    # builder kwargs as sorted (key, value) pairs

    # --- agent-to-agent communication channel (LCFEnv `communication` config,
    #     env_wrappers.py:44,91-121,363-376; off by default in the reference) ---
    comm_method: str = "none"       # "none" | "direct"
    comm_size: int = 4              # message dims appended to the action space
    comm_neighbours: int = 4        # K nearest senders whose messages we hear
    add_pos_in_comm: bool = False   # prepend [dis/20, unit-dx, unit-dy] per msg

    # --- global traffic-light signal obs (LCFEnv `add_traffic_light`,
    #     env_wrappers.py:45-46,258-272; off by default in the reference) ---
    add_traffic_light: bool = False
    traffic_light_interval: int = 30

    @property
    def comm_dim(self) -> int:
        """Per-message obs dims (comm payload + optional relative-pos tag)."""
        return self.comm_size + (3 if self.add_pos_in_comm else 0)

    @property
    def comm_obs_dim(self) -> int:
        if self.comm_method == "none":
            return 0
        return self.comm_dim * self.comm_neighbours

    @property
    def base_obs_dim(self) -> int:
        """Observation dim before the optional LCF slot."""
        edge = self.side_detector_lasers if self.side_detector_lasers > 0 else 2
        lane = self.lane_line_lasers if self.lane_line_lasers > 0 else 1
        d = edge + 6 + lane + self.lidar_num_lasers + 4 * self.lidar_num_others
        if self.navi_in_obs:
            d += 10
        if self.toll_obs:
            d += 1
        return d

    @property
    def obs_dim(self) -> int:
        """Full obs layout: base | traffic(3) | lcf(1) | comm(K*comm_dim)
        (reference append order: env_wrappers.py:279-310)."""
        d = self.base_obs_dim
        if self.add_traffic_light:
            d += 3
        if self.lcf_enabled:
            d += 1
        return d + self.comm_obs_dim

    @property
    def action_dim(self) -> int:
        """Steering + throttle, plus the comm message when the channel is on
        (env_wrappers.py:71-92: `actions[2:]` is the broadcast message)."""
        return 2 + (self.comm_size if self.comm_method != "none" else 0)


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
