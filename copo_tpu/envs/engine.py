"""DrivingEngine — the vectorized, jit-compiled multi-agent driving env.

Replaces the whole L1+L2 stack of the reference (MetaDrive MultiAgent*Env +
CCEnv/LCFEnv wrappers, SURVEY.md §1): fixed agent-slot arrays instead of dict
spaces, respawn = slot reuse with a fresh uid (reference respawn semantics,
SURVEY.md §2.2), the O(N^2) neighbour graph as one masked distance matrix
(replacing `env_wrappers.py:141-158`), and LCF sampling/append inside the
step (replacing `env_wrappers.py:393-418`). Single-env functions; batch over
env instances with `jax.vmap` (see `VecDrivingEnv`).

Step contract (slot-based analogue of the gym-dict MARL protocol):
  actions apply to slots alive at step start; `info.valid` marks those slots'
  transitions; `done` flags transition boundaries; newly respawned agents
  appear in the returned obs with fresh uids and valid=False this step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from copo_tpu.envs.config import EnvConfig, EnvParams
from copo_tpu.envs.dynamics import step_dynamics, wrap_angle
from copo_tpu.envs.lidar import lidar_scan
from copo_tpu.envs.geometry import WAYPOINT_SPACING
from copo_tpu.envs.observation import (build_obs, in_zone as obs_in_zone,
                                       lane_snapped_lateral as obs_lane_lateral)
from copo_tpu.envs.routing import locate_on_route
from copo_tpu.envs.scene import SceneData


@struct.dataclass
class EnvState:
    """Per-env-instance state over N agent slots."""

    pos: jnp.ndarray          # (N, 2)
    heading: jnp.ndarray      # (N,)
    speed: jnp.ndarray        # (N,)
    steering: jnp.ndarray     # (N,)
    yaw_rate: jnp.ndarray     # (N,)
    last_action: jnp.ndarray  # (N, 2)

    route: jnp.ndarray        # (N,) int32 assigned route
    waypoint_idx: jnp.ndarray  # (N,) int32 tracked waypoint
    s: jnp.ndarray            # (N,) float32 arc-length progress
    spawn_s: jnp.ndarray      # (N,) float32 progress at spawn (for route_completion)
    lateral: jnp.ndarray      # (N,) float32 signed lateral offset
    lane_heading: jnp.ndarray  # (N,)

    alive: jnp.ndarray        # (N,) bool — actively controlled
    dead_timer: jnp.ndarray   # (N,) int32 — body persists while > 0
    uid: jnp.ndarray          # (N,) int32 unique agent id (-1 = never used)
    next_uid: jnp.ndarray     # () int32
    steps: jnp.ndarray        # (N,) int32 steps since spawn
    ep_reward: jnp.ndarray    # (N,) float32 accumulated reward since spawn
    ep_nei_reward: jnp.ndarray  # (N,) float32 accumulated neighbour-mean reward
    ep_cost: jnp.ndarray      # (N,) float32 accumulated cost since spawn
    lcf: jnp.ndarray          # (N,) float32 in [-1, 1]
    in_contact: jnp.ndarray   # (N,) bool — was touching another body last step
    toll_time: jnp.ndarray    # (N,) int32 steps spent inside the gate zone
    comm_msg: jnp.ndarray     # (N, comm_size | 1 dummy) last broadcast message
    comm_valid: jnp.ndarray   # (N,) bool — slot broadcast a message this step

    t: jnp.ndarray            # () int32 env episode step
    key: jnp.ndarray          # PRNGKey

    # Scene-episode outcome counters (reference `callbacks.py:52-67` computes
    # success/crash/out/max_step over ALL agents that appeared in the
    # 1000-step scene episode — horizon survivors count in the max_step
    # bucket). Reset with the episode; flushed into StepInfo at done_all.
    epi_spawned: jnp.ndarray  # () int32 agents spawned this scene episode
    epi_arrive: jnp.ndarray   # () int32
    epi_crash: jnp.ndarray    # () int32
    epi_out: jnp.ndarray      # () int32

    @property
    def present(self):
        """Bodies that exist in the world (controlled or decaying wreck)."""
        return self.alive | (self.dead_timer > 0)


@struct.dataclass
class StepInfo:
    """Per-step side-channel arrays (replaces the reference info dict keys
    `neighbours`/`nei_rewards`/`global_rewards`/`lcf`/metric fields)."""

    valid: jnp.ndarray          # (N,) bool — transition belongs to a live agent
    arrive_dest: jnp.ndarray    # (N,) bool
    crash: jnp.ndarray          # (N,) bool
    out_of_road: jnp.ndarray    # (N,) bool
    max_step: jnp.ndarray       # (N,) bool
    step_reward: jnp.ndarray    # (N,) float32 (reward actually returned)
    native_reward: jnp.ndarray  # (N,) float32
    coordinated_reward: jnp.ndarray  # (N,) float32 cos(phi) r_self + sin(phi) r_nei
    nei_reward: jnp.ndarray     # (N,) float32 mean reward of in-radius neighbours
    global_reward: jnp.ndarray  # (N,) float32 mean reward over valid agents
    num_neighbours: jnp.ndarray  # (N,) int32
    cost: jnp.ndarray           # (N,) float32
    lcf: jnp.ndarray            # (N,) float32
    velocity: jnp.ndarray       # (N,) float32 km/h (MetaDrive `vehicle.speed` unit)
    steering: jnp.ndarray       # (N,) float32 raw steering action
    acceleration: jnp.ndarray   # (N,) float32 raw throttle action
    episode_length: jnp.ndarray  # (N,) int32
    episode_reward: jnp.ndarray  # (N,) float32
    episode_cost: jnp.ndarray   # (N,) float32 accumulated cost since spawn
    episode_nei_reward: jnp.ndarray  # (N,) float32 accumulated nei-mean reward
    route_completion: jnp.ndarray  # (N,) float32

    # Scene-episode report, emitted once per env episode at done_all
    # (reference per-scene-episode statistic, `callbacks.py:52-67`: rates
    # over every agent that appeared in the episode; horizon survivors fall
    # in the max_step bucket). All () per env instance; zero unless
    # scene_done.
    scene_done: jnp.ndarray      # () bool — this step ends the scene episode
    scene_spawned: jnp.ndarray   # () int32 total agents this episode
    scene_arrive: jnp.ndarray    # () int32
    scene_crash: jnp.ndarray     # () int32
    scene_out: jnp.ndarray       # () int32


@struct.dataclass
class StepOutput:
    obs: jnp.ndarray       # (N, obs_dim)
    reward: jnp.ndarray    # (N,)
    done: jnp.ndarray      # (N,) bool
    done_all: jnp.ndarray  # () bool
    info: StepInfo


def _sample_lcf(cfg: EnvConfig, key, shape, params: EnvParams):
        cfg = cfg
        if not cfg.lcf_enabled:
            return jnp.zeros(shape, dtype=jnp.float32)
        # forced LCF is used verbatim, no noise (env_wrappers.py:402-407)
        forced = params.force_lcf > -99.0
        if cfg.lcf_dist == "normal":
            lcf = jnp.clip(
                params.lcf_mean + params.lcf_std * jax.random.normal(key, shape),
                -1.0, 1.0,
            )
        else:
            lcf = jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
        return jnp.where(forced, jnp.full(shape, params.force_lcf), lcf)

def _respawn(scene: SceneData, cfg: EnvConfig, state: EnvState, params: EnvParams, key) -> EnvState:
        """Fill free slots from unoccupied spawn points (vectorized matching)."""
        N = cfg.num_agents
        S = scene.num_spawns
        k_perm, k_route, k_lcf = jax.random.split(key, 3)

        free_slot = (~state.alive) & (state.dead_timer <= 0)
        active = jnp.sum(state.alive)
        budget = jnp.clip(params.target_num_agents - active, 0, N)
        if cfg.horizon_grace:
            # the spawn manager stops respawning once the episode clock hits
            # the horizon; survivors drain out (EnvConfig.horizon_grace)
            budget = jnp.where(state.t < cfg.horizon, budget, 0)

        # spawn occupancy: any present body within clear radius
        d2 = jnp.sum((scene.spawn_xy[:, None, :] - state.pos[None, :, :]) ** 2, axis=-1)
        occupied = jnp.any(
            (d2 < cfg.spawn_clear_radius**2) & state.present[None, :], axis=1
        )  # (S,)
        spawn_free = ~occupied

        # Random rank of each free spawn point WITHOUT a sort (a per-step
        # batched argsort was ~1.2 ms/step at B=512): rank_i = #{free j with
        # priority_j < priority_i} via an (S, S) comparison count, then the
        # rank-r free spawn is matched to the rank-r free slot with a one-hot
        # contraction — all elementwise ops and reductions, no gathers.
        perm = jax.random.uniform(k_perm, (S,))
        pri = jnp.where(spawn_free, perm, jnp.inf)
        idx_s = jnp.arange(S)
        smaller = (pri[None, :] < pri[:, None]) | (
            (pri[None, :] == pri[:, None]) & (idx_s[None, :] < idx_s[:, None])
        )  # strict total order: index breaks float ties
        rank = jnp.sum((smaller & spawn_free[None, :]).astype(jnp.int32), axis=1)
        rank = jnp.where(spawn_free, rank, S)                      # (S,)
        n_free_spawns = jnp.sum(spawn_free)

        # rank free slots; slot takes the rank-th free spawn if within budget
        slot_rank = jnp.cumsum(free_slot.astype(jnp.int32)) - 1
        will_spawn = free_slot & (slot_rank < jnp.minimum(budget, n_free_spawns))
        match = (slot_rank[:, None] == rank[None, :]) & spawn_free[None, :]
        # spawn-field reads as one-hot contractions with `match` (N, S) —
        # int-exact in f32 for the id fields (values << 2^24), and cheaper
        # than N scattered small-row gathers on TPU
        matf = match.astype(jnp.float32)
        pick = lambda tbl: matf @ tbl.astype(jnp.float32) if tbl.ndim > 1 \
            else matf @ tbl.astype(jnp.float32)[:, None]

        # choose a route option at each spawn point
        rmax = scene.spawn_routes.shape[1]
        route_choice = jax.random.randint(k_route, (N,), 0, rmax)
        n_routes_here = (matf @ scene.spawn_n_routes.astype(jnp.float32)[:, None])[:, 0]
        route_choice = route_choice % jnp.maximum(n_routes_here.astype(jnp.int32), 1)
        hot_r = (jnp.arange(rmax)[None, :] == route_choice[:, None]).astype(jnp.float32)
        new_route = jnp.sum(pick(scene.spawn_routes) * hot_r, axis=1).astype(jnp.int32)
        new_s = jnp.sum(pick(scene.spawn_route_s) * hot_r, axis=1)
        new_spawn_xy = pick(scene.spawn_xy)                        # (N, 2)
        new_spawn_heading = pick(scene.spawn_heading)[:, 0]        # (N,)

        new_lcf = _sample_lcf(cfg, k_lcf, (N,), params)
        new_uid = state.next_uid + slot_rank

        def sel(new, old):
            w = will_spawn
            if new.ndim > 1:
                w = will_spawn[:, None]
            return jnp.where(w, new, old)

        spacing_idx = jnp.floor(new_s / WAYPOINT_SPACING).astype(jnp.int32)
        return state.replace(
            pos=sel(new_spawn_xy, state.pos),
            heading=sel(new_spawn_heading, state.heading),
            speed=sel(jnp.zeros((N,)), state.speed),
            steering=sel(jnp.zeros((N,)), state.steering),
            yaw_rate=sel(jnp.zeros((N,)), state.yaw_rate),
            last_action=sel(jnp.zeros((N, 2)), state.last_action),
            route=sel(new_route, state.route).astype(jnp.int32),
            waypoint_idx=sel(spacing_idx, state.waypoint_idx).astype(jnp.int32),
            s=sel(new_s, state.s),
            spawn_s=sel(new_s, state.spawn_s),
            lateral=sel(jnp.zeros((N,)), state.lateral),
            lane_heading=sel(new_spawn_heading, state.lane_heading),
            alive=state.alive | will_spawn,
            uid=sel(new_uid, state.uid).astype(jnp.int32),
            next_uid=state.next_uid + jnp.sum(will_spawn),
            epi_spawned=state.epi_spawned + jnp.sum(will_spawn, dtype=jnp.int32),
            steps=sel(jnp.zeros((N,), jnp.int32), state.steps),
            ep_reward=sel(jnp.zeros((N,)), state.ep_reward),
            ep_nei_reward=sel(jnp.zeros((N,)), state.ep_nei_reward),
            ep_cost=sel(jnp.zeros((N,)), state.ep_cost),
            lcf=sel(new_lcf, state.lcf),
            in_contact=state.in_contact & ~will_spawn,
            toll_time=sel(jnp.zeros((N,), jnp.int32), state.toll_time),
            comm_msg=sel(jnp.zeros_like(state.comm_msg), state.comm_msg),
            comm_valid=state.comm_valid & ~will_spawn,
        )

def _empty_state(cfg: EnvConfig, key) -> EnvState:
        N = cfg.num_agents
        zf = jnp.zeros((N,), jnp.float32)
        zi = jnp.zeros((N,), jnp.int32)
        return EnvState(
            pos=jnp.zeros((N, 2)) + 1e6,  # far away: empty slots never collide
            heading=zf, speed=zf, steering=zf, yaw_rate=zf,
            last_action=jnp.zeros((N, 2)),
            route=zi, waypoint_idx=zi, s=zf, spawn_s=zf, lateral=zf, lane_heading=zf,
            alive=jnp.zeros((N,), bool), dead_timer=zi,
            uid=jnp.full((N,), -1, jnp.int32), next_uid=jnp.int32(0),
            steps=zi, ep_reward=zf, ep_nei_reward=zf, ep_cost=zf, lcf=zf,
            in_contact=jnp.zeros((N,), bool),
            toll_time=zi,
            # 1-wide dummy when comm is off (orbax rejects zero-size arrays)
            comm_msg=jnp.zeros(
                (N, cfg.comm_size if cfg.comm_method != "none" else 1)
            ),
            comm_valid=jnp.zeros((N,), bool),
            t=jnp.int32(0), key=key,
            epi_spawned=jnp.int32(0), epi_arrive=jnp.int32(0),
            epi_crash=jnp.int32(0), epi_out=jnp.int32(0),
        )

def observe(scene: SceneData, cfg: EnvConfig, state: EnvState):
        lidar = lidar_scan(scene, cfg, state.pos, state.heading, state.present)
        return build_obs(
            scene, cfg,
            pos=state.pos, heading=state.heading, speed=state.speed,
            steering=state.steering, yaw_rate=state.yaw_rate,
            last_action=state.last_action, route_idx=state.route,
            waypoint_idx=state.waypoint_idx, s=state.s,
            lateral=state.lateral, lane_heading=state.lane_heading,
            lidar_block=lidar, lcf=state.lcf,
            t=state.t, comm_msg=state.comm_msg, comm_valid=state.comm_valid,
            present=state.present, toll_time=state.toll_time,
        )

def engine_reset(scene: SceneData, cfg: EnvConfig, key, params: EnvParams,
                 t_init=None):
        """Reset one env. `t_init` (optional, () int32) starts the episode
        clock mid-phase so a batch of envs hits the horizon at staggered
        iterations (first episode is shorter; all later ones are full length).
        Synchronized flushes are pathological for training statistics: every
        horizon crossing would dump ~B*N episode results into one iteration
        and every batch ~31 iterations later would be dominated by the
        post-reset spawn wave."""
        k0, k1 = jax.random.split(key)
        state = _empty_state(cfg, k0)
        if t_init is not None:
            state = state.replace(t=jnp.asarray(t_init, jnp.int32))
        state = _respawn(scene, cfg, state, params, k1)
        return state, observe(scene, cfg, state)


def engine_step(scene: SceneData, cfg: EnvConfig, state: EnvState, actions,
                params: EnvParams, auto_reset: bool = True):
        """One env step. actions: (N, 2) in [-1, 1]."""
        N = cfg.num_agents
        key, k_step, k_reset = jax.random.split(state.key, 3)
        alive0 = state.alive
        valid = alive0

        # Sanitize: a diverging policy emitting NaN/inf must not poison env
        # state (jnp.clip propagates NaN).
        actions = jnp.clip(jnp.nan_to_num(actions), -1.0, 1.0)
        actions = jnp.where(alive0[:, None], actions, 0.0)
        # comm channel: actions[2:] is the broadcast message (env_wrappers.py:91-92)
        drive = actions[..., :2]
        comm_msg = actions[..., 2:] if cfg.comm_method != "none" else state.comm_msg

        # --- dynamics (frozen for non-alive slots) ---
        pos, heading, speed, steering, yaw_rate = step_dynamics(
            cfg, state.pos, state.heading, state.speed, state.steering, drive
        )
        pos = jnp.where(alive0[:, None], pos, state.pos)
        heading = jnp.where(alive0, wrap_angle(heading), state.heading)
        speed = jnp.where(alive0, speed, state.speed)
        steering = jnp.where(alive0, steering, state.steering)
        yaw_rate = jnp.where(alive0, yaw_rate, 0.0)

        # collision: exact oriented-box overlap via the separating-axis
        # test (4 axes per pair). The earlier 3-disc capsule approximation
        # FORGAVE corner-to-corner clips of up to ~0.4 m — exactly the
        # contact mode of zipper merges — making the bottleneck's published
        # crash-driven difficulty unreachable; Bullet collides the full
        # 4.5 x 1.85 m boxes. O(N^2) with tiny per-pair math (cheaper than
        # the (3N)^2 disc distance matrix it replaces).
        hl = 0.5 * cfg.vehicle_length - cfg.collision_shrink
        hw = 0.5 * cfg.vehicle_width - cfg.collision_shrink
        cos_h, sin_h = jnp.cos(heading), jnp.sin(heading)
        u = jnp.stack([cos_h, sin_h], axis=-1)        # (N, 2) body fwd
        v = jnp.stack([-sin_h, cos_h], axis=-1)       # (N, 2) body left
        dvec = pos[None, :, :] - pos[:, None, :]      # i -> j
        du_i = jnp.einsum("ijk,ik->ij", dvec, u)
        dv_i = jnp.einsum("ijk,ik->ij", dvec, v)
        du_j = jnp.einsum("ijk,jk->ij", dvec, u)
        dv_j = jnp.einsum("ijk,jk->ij", dvec, v)
        dh_pair = heading[:, None] - heading[None, :]
        ac = jnp.abs(jnp.cos(dh_pair))
        asn = jnp.abs(jnp.sin(dh_pair))
        margin = 0.05
        thr_u = hl + hl * ac + hw * asn + margin
        thr_v = hw + hl * asn + hw * ac + margin
        pen = jnp.minimum(
            jnp.minimum(thr_u - jnp.abs(du_i), thr_v - jnp.abs(dv_i)),
            jnp.minimum(thr_u - jnp.abs(du_j), thr_v - jnp.abs(dv_j)),
        )                                             # (N, N) min-axis depth
        body_present = state.present
        overlap = (
            (pen > 0.0)
            & body_present[:, None] & body_present[None, :]
            & ~jnp.eye(N, dtype=bool)
        )
        crash_body = jnp.any(overlap, axis=1)
        crash = alive0 & crash_body
        # penalize the IMPACT (contact onset), not every step of a sustained
        # contact: a Bullet-style jam keeps bodies touching for many steps,
        # and repeating the full penalty each step makes "never drive near
        # anyone" the only optimum under the MA-default crash_done=False
        crash_onset = crash & ~state.in_contact

        # --- contact resolution (Bullet-equivalent, kinematic) ---
        # Overlapping bodies are pushed apart along the line of centers by
        # the separation depth and lose most of their speed (inelastic
        # bump). Without this, bodies tunnel through each other and — under
        # the MA-default crash_done=False — sit overlapped accruing the
        # crash penalty every step, which MetaDrive's rigid-body engine
        # never allows.
        dn = jnp.sqrt(jnp.sum(dvec * dvec, axis=-1) + 1e-12)
        push = jnp.sum(
            -dvec / dn[..., None]
            * jnp.where(overlap, jnp.minimum(pen, 1.0), 0.0)[..., None] * 0.5,
            axis=1,
        )
        push_norm = jnp.linalg.norm(push, axis=-1, keepdims=True)
        push = push * (jnp.minimum(push_norm, 0.5) / jnp.maximum(push_norm, 1e-6))
        pos = jnp.where((alive0 & crash_body)[:, None], pos + push, pos)
        speed = jnp.where(alive0 & crash_body, speed * 0.25, speed)

        # --- localization ---
        wp_idx, s_new, lateral, lane_heading = locate_on_route(
            scene, state.route, state.waypoint_idx, pos
        )
        s_new = jnp.where(alive0, s_new, state.s)
        progress = jnp.where(alive0, s_new - state.s, 0.0)

        # --- tollgate stop-and-wait (cfg.toll_obs; see EnvConfig) ---
        in_z = obs_in_zone(scene, pos)
        toll_time = jnp.where(
            alive0 & in_z, state.toll_time + 1, jnp.int32(0)
        )
        ran_gate = jnp.zeros_like(alive0)
        if cfg.toll_obs:
            # leaving the gate unpaid = hitting the boom barrier (counts as
            # a crash; under crash_done it terminates). Direction-agnostic:
            # with reverse disabled a vehicle can only leave the zone
            # forward, so any unpaid zone exit is a gate run.
            was_in = obs_in_zone(scene, state.pos)
            paid = state.toll_time >= cfg.toll_min_pass_time
            ran_gate = alive0 & was_in & ~in_z & ~paid
            if cfg.toll_overspeed_crash:
                # breaking the gate speed limit is itself fatal — a small
                # grace band over the 3 km/h limit keeps queue creep legal
                # (1.3x: calibrated so trained IPPO lands in the published
                # 4-37% tollgate band; the r4 sweep walked 2.0->1.15 and
                # settled here)
                ran_gate = ran_gate | (
                    alive0 & in_z & (speed > cfg.zone_speed_limit * 1.3)
                )

        crash = crash | ran_gate
        crash_onset = crash_onset | ran_gate

        # --- events ---
        left_w = scene.route_left_width[state.route, wp_idx]
        right_w = scene.route_right_width[state.route, wp_idx]
        # ejection uses the BOUND tables (road edge + body-contact slack);
        # obs and the lane-snap below use the road-edge tables
        left_b = scene.route_left_bound[state.route, wp_idx]
        right_b = scene.route_right_bound[state.route, wp_idx]
        out_of_road = alive0 & ((lateral > left_b) | (lateral < -right_b))
        route_len = scene.route_len[state.route]
        # arrive_dest is independent of the out-of-road flag (MetaDrive's
        # done_function checks arrive first; reaching the destination wins)
        arrive = alive0 & (s_new >= route_len - 2.0) & ~ran_gate
        out_of_road &= ~arrive

        steps_new = state.steps + alive0.astype(jnp.int32)
        max_step = alive0 & (steps_new >= cfg.max_step_per_agent)
        t_new = state.t + 1
        horizon_end = t_new >= cfg.horizon

        # --- reward (MetaDrive 0.2.5 reward_function semantics: dense
        #     progress * lateral-factor + speed term each step; on a terminal
        #     event the step reward is REPLACED by the bonus/penalty, priority
        #     arrive > out_of_road > crash_vehicle) ---
        # lateral factor against the NEAREST lane of the road (MetaDrive
        # measures in vehicle.lane when it belongs to the route's ref lanes:
        # overtaking in an adjacent lane keeps the full progress reward)
        lat_lane = obs_lane_lateral(lateral, left_w, right_w, cfg.lane_width)
        lat_factor = jnp.where(
            cfg.use_lateral_reward,
            jnp.clip(1.0 - 2.0 * jnp.abs(lat_lane) / cfg.lane_width, 0.0, 1.0),
            1.0,
        )
        dense = cfg.driving_reward * progress * lat_factor
        if cfg.zone_speed_limit > 0.0:
            # MetaDrive tollgate reward: overspeeding inside the gate zone
            # CANCELS the speed reward and charges
            # overspeed_penalty * speed / max_speed instead
            overspeed = in_z & (speed > cfg.zone_speed_limit)
            speed_term = jnp.where(
                overspeed,
                -cfg.overspeed_penalty * speed / cfg.max_speed,
                cfg.speed_reward * speed / cfg.max_speed,
            )
            dense = dense + speed_term * alive0
        else:
            dense = dense + cfg.speed_reward * speed / cfg.max_speed * alive0
        # crash penalty applies on contact onset (Bullet separates bodies, so
        # sustained-contact steps do not re-trigger crash_vehicle); with
        # crash_done the agent is removed the same step anyway
        native = jnp.where(
            arrive, cfg.success_reward,
            jnp.where(
                out_of_road, -cfg.out_of_road_penalty,
                jnp.where(crash_onset, -cfg.crash_vehicle_penalty, dense),
            ),
        )
        native = jnp.where(valid, native, 0.0)
        cost = cfg.crash_vehicle_cost * crash_onset + cfg.out_of_road_cost * out_of_road

        # --- neighbourhood graph + reward mixing (CCEnv/LCFEnv semantics) ---
        d2_agents = jnp.sum((pos[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
        nei_mask = (
            (d2_agents < cfg.neighbours_distance**2)
            & valid[:, None] & valid[None, :]
            & ~jnp.eye(N, dtype=bool)
        )
        n_nei = jnp.sum(nei_mask, axis=1)
        nei_reward = jnp.where(
            n_nei > 0, (nei_mask @ native) / jnp.maximum(n_nei, 1), 0.0
        )
        n_valid_agents = jnp.maximum(jnp.sum(valid), 1)
        global_reward = jnp.where(valid, jnp.sum(native) / n_valid_agents, 0.0)

        if cfg.lcf_mode == "angle":
            phi = state.lcf * jnp.pi / 2.0
            coordinated = jnp.cos(phi) * native + jnp.sin(phi) * nei_reward
        else:  # "linear": lcf mapped to [0,1] (env_wrappers.py:349-351)
            w = 0.5 * (state.lcf + 1.0)
            coordinated = w * native + (1.0 - w) * nei_reward
        reward = native if cfg.return_native_reward or not cfg.lcf_enabled else coordinated

        # --- termination bookkeeping ---
        # horizon semantics (MetaDrive MA, see EnvConfig.horizon_grace):
        # grace mode ends the scene episode only when the post-horizon field
        # has drained; hard mode force-terminates everyone at the horizon.
        done_i = arrive | max_step
        if not cfg.horizon_grace:
            done_i |= jnp.asarray(horizon_end) & alive0
        if cfg.crash_done:
            done_i |= crash
        if cfg.out_of_road_done:
            done_i |= out_of_road
        alive1 = alive0 & ~done_i
        if cfg.horizon_grace:
            done_all = jnp.asarray(horizon_end) & (jnp.sum(alive1) == 0)
        else:
            done_all = jnp.asarray(horizon_end)
        # wrecks persist for delay_done steps; arrivals are removed immediately
        new_wreck = done_i & ~arrive
        dead_timer = jnp.where(new_wreck, cfg.delay_done, jnp.maximum(state.dead_timer - 1, 0))

        ep_reward = state.ep_reward + reward
        ep_nei_reward = state.ep_nei_reward + nei_reward
        ep_cost = state.ep_cost + cost
        route_completion = jnp.clip(
            (s_new - state.spawn_s) / jnp.maximum(route_len - state.spawn_s, 1e-3), 0.0, 1.0
        )

        # scene-episode outcome tally (mutually exclusive, priority
        # arrive > crash > out; everything else done this episode — incl.
        # horizon survivors — lands in the implicit max_step bucket)
        cat_arrive = arrive
        cat_crash = crash & done_i & ~arrive
        cat_out = out_of_road & done_i & ~arrive & ~crash
        epi_arrive = state.epi_arrive + jnp.sum(cat_arrive, dtype=jnp.int32)
        epi_crash = state.epi_crash + jnp.sum(cat_crash, dtype=jnp.int32)
        epi_out = state.epi_out + jnp.sum(cat_out, dtype=jnp.int32)

        stepped = state.replace(
            pos=pos, heading=heading, speed=speed, steering=steering, yaw_rate=yaw_rate,
            last_action=jnp.where(valid[:, None], drive, state.last_action),
            comm_msg=jnp.where(valid[:, None], comm_msg, jnp.zeros_like(comm_msg)),
            comm_valid=valid,
            waypoint_idx=jnp.where(alive0, wp_idx, state.waypoint_idx).astype(jnp.int32),
            s=s_new,
            lateral=jnp.where(alive0, lateral, state.lateral),
            lane_heading=jnp.where(alive0, lane_heading, state.lane_heading),
            alive=alive1, dead_timer=dead_timer, in_contact=crash_body,
            toll_time=toll_time,
            steps=steps_new, ep_reward=ep_reward, ep_nei_reward=ep_nei_reward,
            ep_cost=ep_cost, t=t_new, key=key,
            epi_arrive=epi_arrive, epi_crash=epi_crash, epi_out=epi_out,
        )
        stepped = _respawn(scene, cfg, stepped, params, k_step)

        info = StepInfo(
            valid=valid,
            arrive_dest=arrive, crash=crash, out_of_road=out_of_road,
            max_step=max_step & ~(arrive | crash | out_of_road),
            step_reward=reward, native_reward=native, coordinated_reward=coordinated,
            nei_reward=nei_reward, global_reward=global_reward,
            num_neighbours=n_nei.astype(jnp.int32),
            cost=cost, lcf=state.lcf,
            velocity=jnp.abs(speed) * 3.6, steering=drive[..., 0], acceleration=drive[..., 1],
            episode_length=steps_new, episode_reward=ep_reward, episode_cost=ep_cost,
            episode_nei_reward=ep_nei_reward,
            route_completion=route_completion,
            scene_done=done_all,
            # pre-step counter: agents respawned by the post-step _respawn on
            # a done_all step are wiped by the auto-reset and never existed
            scene_spawned=jnp.where(done_all, state.epi_spawned, 0),
            scene_arrive=jnp.where(done_all, epi_arrive, 0),
            scene_crash=jnp.where(done_all, epi_crash, 0),
            scene_out=jnp.where(done_all, epi_out, 0),
        )

        if auto_reset:
            reset_state, _ = engine_reset(scene, cfg, k_reset, params)
            next_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(jnp.reshape(done_all, (1,) * a.ndim), a, b),
                reset_state, stepped,
            )
        else:
            next_state = stepped

        obs = observe(scene, cfg, next_state)
        return next_state, StepOutput(
            obs=obs, reward=reward, done=done_i, done_all=done_all, info=info
        )


def vec_reset(scene: SceneData, cfg: EnvConfig, keys, params: EnvParams,
              t_init=None):
    """Batched reset over B env instances (keys: (B, key)).

    `t_init` ((B,) int32, optional) staggers the episode clocks — see
    engine_reset. Trainers pass `stagger_t_init(B, horizon)`; eval keeps
    all-zero clocks."""
    if t_init is None:
        return jax.vmap(lambda k: engine_reset(scene, cfg, k, params))(keys)
    return jax.vmap(
        lambda k, t0: engine_reset(scene, cfg, k, params, t0)
    )(keys, t_init)


def stagger_t_init(num_envs: int, horizon: int):
    """Evenly phase-shifted episode clocks for a training env batch."""
    return (jnp.arange(num_envs, dtype=jnp.int32) * horizon) // num_envs


def vec_step(scene: SceneData, cfg: EnvConfig, states, actions, params: EnvParams):
    """Batched step over B env instances."""
    return jax.vmap(lambda st, a: engine_step(scene, cfg, st, a, params))(states, actions)


# Module-level jit caches: shared across engine instances. The scene is a
# runtime argument on purpose — embedding it as a jit constant slows XLA
# compilation by >100x (measured on CPU: 2.5 s vs >290 s).
_jit_reset = jax.jit(engine_reset, static_argnums=(1,))
_jit_step = jax.jit(engine_step, static_argnums=(1, 5))
_jit_vec_reset = jax.jit(vec_reset, static_argnums=(1,))
_jit_vec_step = jax.jit(vec_step, static_argnums=(1,))


class DrivingEngine:
    """Thin OO facade over the pure engine functions (pre-jitted)."""

    def __init__(self, scene: SceneData, cfg: EnvConfig):
        self.scene = scene
        self.cfg = cfg

    def reset(self, key, params: EnvParams):
        return _jit_reset(self.scene, self.cfg, key, params)

    def step(self, state: EnvState, actions, params: EnvParams, auto_reset: bool = True):
        return _jit_step(self.scene, self.cfg, state, actions, params, auto_reset)


class VecDrivingEnv:
    """B-way vectorized view via vmap (shared scene/params across envs)."""

    def __init__(self, scene: SceneData, cfg: EnvConfig, num_envs: int):
        self.engine = DrivingEngine(scene, cfg)
        self.scene = scene
        self.cfg = cfg
        self.num_envs = num_envs

    def reset(self, key, params: EnvParams):
        keys = jax.random.split(key, self.num_envs)
        return _jit_vec_reset(self.scene, self.cfg, keys, params)

    def step(self, states, actions, params: EnvParams):
        return _jit_vec_step(self.scene, self.cfg, states, actions, params)
