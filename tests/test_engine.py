"""Engine-level tests: scene compilation, reset/step contract, event semantics.

Replaces the reference's env-contract smoke harnesses (`svo_env.py:230-264`
asserts obs containment / LCF slot range while stepping; `env_wrappers.py:600`
distance-map stepping test) with real pytest units.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from copo_tpu.envs import make_scene
from copo_tpu.envs.config import EnvParams
from copo_tpu.envs.engine import DrivingEngine, VecDrivingEnv


@pytest.fixture(scope="module")
def inter():
    scene, cfg = make_scene("intersection", num_agents=12)
    return scene, cfg


@pytest.fixture(scope="module")
def shared(inter):
    """One engine + jitted step shared by tests (compile once)."""
    scene, cfg = inter
    eng = DrivingEngine(scene, cfg)
    return eng, eng.step, EnvParams.default(cfg.num_agents)


def test_scene_compiles(inter):
    scene, cfg = inter
    assert scene.num_routes == 20  # 4 arms x 3 lanes x movements (2+1+2)
    assert scene.num_spawns == 60
    assert scene.route_xy.ndim == 3
    # routes are uniformly spaced
    seg = np.diff(np.asarray(scene.route_xy[0, : int(scene.route_n_valid[0])]), axis=0)
    np.testing.assert_allclose(np.linalg.norm(seg, axis=1), 2.0, atol=1e-3)
    # lidar field sane: distances within [0, range]
    f = np.asarray(scene.lidar_field)
    assert f.min() >= 0.0 and f.max() <= 40.0 + 1e-6


def test_obs_dim_matches_reference(inter):
    # SURVEY.md §2.2: intersection obs dim 91 (92 with LCF slot)
    scene, cfg = inter
    assert cfg.obs_dim == 91
    _, cfg_lcf = make_scene("intersection", num_agents=12, lcf_enabled=True)
    assert cfg_lcf.obs_dim == 92


def test_reset_and_step_shapes(inter, shared):
    scene, cfg = inter
    eng, step, params = shared
    state, obs = eng.reset(jax.random.PRNGKey(0), params)
    N = cfg.num_agents
    assert obs.shape == (N, cfg.obs_dim)
    assert bool(jnp.all(state.alive))  # target agents all spawned
    assert np.asarray(obs).min() >= 0.0 and np.asarray(obs).max() <= 1.0

    actions = jnp.zeros((N, 2))
    state2, out = step(state, actions, params)
    assert out.obs.shape == (N, cfg.obs_dim)
    assert out.reward.shape == (N,)
    assert out.done.shape == (N,)
    assert bool(jnp.all(out.info.valid))
    assert int(state2.t) == 1


def test_driving_forward_gains_progress_and_reward(inter, shared):
    scene, cfg = inter
    eng, step, params = shared
    state, _ = eng.reset(jax.random.PRNGKey(1), params)
    total_r = jnp.zeros((cfg.num_agents,))
    s0 = state.s
    for _ in range(30):
        # full throttle, no steering: straight-lane agents progress
        state, out = step(state, jnp.tile(jnp.array([0.0, 1.0]), (cfg.num_agents, 1)), params)
        total_r = total_r + out.reward
    # 3 s at max_accel 2.5 - drag 0.4 -> ~9.5 m for an unobstructed agent
    assert float(jnp.max(state.s - s0)) > 5.0  # someone moved forward
    assert float(jnp.max(total_r)) > 0.5


def test_out_of_road_terminates(inter, shared):
    scene, cfg = inter
    eng, step, params = shared
    state, _ = eng.reset(jax.random.PRNGKey(2), params)
    oor_seen = False
    for _ in range(60):
        # moderate left + throttle: wide turn circle exits the road
        state, out = step(state, jnp.tile(jnp.array([0.4, 1.0]), (cfg.num_agents, 1)), params)
        if bool(jnp.any(out.info.out_of_road)):
            oor_seen = True
            break
    assert oor_seen
    # the agent that went out of road must be terminated
    assert bool(jnp.any(out.done & out.info.out_of_road))


def test_respawn_assigns_fresh_uids(inter, shared):
    scene, cfg = inter
    eng, step, params = shared
    state, _ = eng.reset(jax.random.PRNGKey(3), params)
    max_uid0 = int(jnp.max(state.uid))
    for _ in range(80):
        state, out = step(state, jnp.tile(jnp.array([0.4, 1.0]), (cfg.num_agents, 1)), params)
    # after crashes/out-of-road + respawns, uids must exceed the initial ones
    assert int(jnp.max(state.uid)) > max_uid0
    # uids of live agents are unique
    uids = np.asarray(state.uid)[np.asarray(state.alive)]
    assert len(set(uids.tolist())) == len(uids)


def test_horizon_autoreset():
    # hard-cut mode: done_all exactly at the horizon
    scene, cfg = make_scene("intersection", num_agents=4, horizon=10,
                            horizon_grace=False)
    eng = DrivingEngine(scene, cfg)
    params = EnvParams.default(cfg.num_agents)
    state, _ = eng.reset(jax.random.PRNGKey(4), params)
    step = eng.step
    for i in range(10):
        state, out = step(state, jnp.zeros((cfg.num_agents, 2)), params)
    assert bool(out.done_all)
    assert int(state.t) == 0  # auto-reset occurred


def test_vec_env(inter):
    scene, cfg = inter
    venv = VecDrivingEnv(scene, cfg, num_envs=4)
    params = EnvParams.default(cfg.num_agents)
    states, obs = venv.reset(jax.random.PRNGKey(5), params)
    assert obs.shape == (4, cfg.num_agents, cfg.obs_dim)
    states, out = venv.step(states, jnp.zeros((4, cfg.num_agents, 2)), params)
    assert out.obs.shape == (4, cfg.num_agents, cfg.obs_dim)
    # envs evolve independently: different rng keys -> different spawn layouts
    assert not np.allclose(np.asarray(states.pos[0]), np.asarray(states.pos[1]))


def test_neighbour_semantics(inter, shared):
    """Direct numeric check of nei_reward / num_neighbours / global_reward
    (reference `env_wrappers.py:318-326`: nei_reward = mean native reward of
    agents within `neighbours_distance`, global = mean over all active)."""
    scene, cfg = inter
    eng, step, params = shared
    state, _ = eng.reset(jax.random.PRNGKey(6), params)
    state, out = step(
        state, jnp.tile(jnp.array([0.0, 0.5]), (cfg.num_agents, 1)), params
    )
    info = out.info
    native = np.asarray(info.native_reward)
    valid = np.asarray(info.valid)
    g = native[valid].mean()
    np.testing.assert_allclose(np.asarray(info.global_reward)[valid], g, atol=1e-5)

    # recompute the neighbour means from the post-step positions the engine
    # used (valid agents keep their stepped pose; respawn fills only free slots)
    pos = np.asarray(state.pos)
    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    mask = (d < cfg.neighbours_distance) & valid[:, None] & valid[None, :]
    np.fill_diagonal(mask, False)
    n_nei = mask.sum(axis=1)
    np.testing.assert_array_equal(np.asarray(info.num_neighbours), n_nei)
    expect = np.where(n_nei > 0, (mask @ native) / np.maximum(n_nei, 1), 0.0)
    np.testing.assert_allclose(np.asarray(info.nei_reward), expect, atol=1e-5)
    assert n_nei.max() > 0  # the scenario actually has neighbours


def test_terminal_reward_replacement(inter):
    """MetaDrive 0.2.5 reward_function: a terminal event REPLACES the step
    reward (arrive -> +success_reward; out_of_road -> -out_of_road_penalty),
    it is not added to the dense term."""
    import dataclasses

    scene, cfg = inter
    eng = DrivingEngine(scene, cfg)
    params = EnvParams.default(cfg.num_agents)
    state, _ = eng.reset(jax.random.PRNGKey(11), params)
    # teleport agent 0 to just short of its route end: one step forward arrives
    route = int(state.route[0])
    n_valid = int(scene.route_n_valid[route])
    end = np.asarray(scene.route_xy[route, n_valid - 1])
    prev = np.asarray(scene.route_xy[route, n_valid - 2])
    d = (end - prev) / np.linalg.norm(end - prev)
    state = state.replace(
        pos=state.pos.at[0].set(jnp.asarray(end - 2.5 * d)),
        heading=state.heading.at[0].set(float(np.arctan2(d[1], d[0]))),
        speed=state.speed.at[0].set(8.0),
        waypoint_idx=state.waypoint_idx.at[0].set(n_valid - 3),
        s=state.s.at[0].set((n_valid - 3) * 2.0),
    )
    state2, out = eng.step(
        state, jnp.tile(jnp.array([0.0, 1.0]), (cfg.num_agents, 1)), params
    )
    assert bool(out.info.arrive_dest[0])
    np.testing.assert_allclose(float(out.reward[0]), cfg.success_reward)

    # out-of-road replaces the reward with exactly -penalty
    state3 = state.replace(
        pos=state.pos.at[0].set(state.pos[0]),  # keep route position
        lateral=state.lateral.at[0].set(0.0),
    )
    big_left = jnp.tile(jnp.array([1.0, 1.0]), (cfg.num_agents, 1))
    r0 = None
    for _ in range(40):
        state3, out3 = eng.step(state3, big_left, params)
        if bool(out3.info.out_of_road[0]):
            r0 = float(out3.reward[0])
            break
    assert r0 is not None
    np.testing.assert_allclose(r0, -cfg.out_of_road_penalty)


def test_arrive_independent_of_out_of_road(inter):
    """arrive_dest wins over out_of_road (MetaDrive done_function priority);
    the arrive flag must not be suppressed by the OOR test in the same step."""
    scene, cfg = inter
    eng = DrivingEngine(scene, cfg)
    params = EnvParams.default(cfg.num_agents)
    state, _ = eng.reset(jax.random.PRNGKey(12), params)
    route = int(state.route[0])
    n_valid = int(scene.route_n_valid[route])
    end = np.asarray(scene.route_xy[route, n_valid - 1])
    prev = np.asarray(scene.route_xy[route, n_valid - 2])
    d = (end - prev) / np.linalg.norm(end - prev)
    left = np.array([-d[1], d[0]])
    # just short of the destination but laterally OUTSIDE the corridor
    lw = float(scene.route_left_width[route, n_valid - 2])
    state = state.replace(
        pos=state.pos.at[0].set(jnp.asarray(end - 1.0 * d + (lw + 1.0) * left)),
        heading=state.heading.at[0].set(float(np.arctan2(d[1], d[0]))),
        speed=state.speed.at[0].set(8.0),
        waypoint_idx=state.waypoint_idx.at[0].set(n_valid - 2),
        s=state.s.at[0].set((n_valid - 2) * 2.0),
    )
    state2, out = eng.step(
        state, jnp.tile(jnp.array([0.0, 1.0]), (cfg.num_agents, 1)), params
    )
    assert bool(out.info.arrive_dest[0])
    assert not bool(out.info.out_of_road[0])
    np.testing.assert_allclose(float(out.reward[0]), cfg.success_reward)


def test_crash_done_training_vs_eval_semantics(inter):
    """The MA default terminates on crash (MetaDrive MULTI_AGENT default
    crash_done=True; eval also passes it explicitly,
    eval/evaluate_population.py:106-132). Contact must penalize either way,
    but only crash_done terminates the agent."""
    import dataclasses

    scene, cfg = inter
    assert cfg.crash_done is True
    assert cfg.delay_done == 25

    for crash_done in (False, True):
        c = dataclasses.replace(cfg, crash_done=crash_done)
        eng = DrivingEngine(scene, c)
        params = EnvParams.default(c.num_agents)
        state, _ = eng.reset(jax.random.PRNGKey(7), params)
        # force agents 0 and 1 into overlap
        pos = state.pos.at[1].set(state.pos[0] + jnp.array([0.5, 0.0]))
        heading = state.heading.at[1].set(state.heading[0])
        state = state.replace(pos=pos, heading=heading)
        state2, out = eng.step(state, jnp.zeros((c.num_agents, 2)), params)
        crashed = np.asarray(out.info.crash)
        assert crashed[0] and crashed[1]
        # crash penalty applies in both modes
        assert float(out.reward[0]) <= -c.crash_vehicle_penalty + 1.0
        if crash_done:
            assert bool(out.done[0]) and not bool(state2.alive[0]) or bool(
                state2.uid[0] != state.uid[0])  # terminated (slot may respawn)
        else:
            assert not bool(out.done[0])
            assert bool(state2.alive[0]) and int(state2.uid[0]) == int(state.uid[0])


def test_scene_episode_statistic(inter):
    """Scene-episode outcome tally (reference callbacks.py:52-67): at
    done_all the engine reports rates over every agent that appeared in the
    episode; horizon survivors land in the implicit max_step bucket."""
    import dataclasses

    scene, cfg = inter
    c = dataclasses.replace(cfg, horizon=40, num_agents=8,
                            horizon_grace=False)
    eng = DrivingEngine(scene, c)
    params = EnvParams.default(c.num_agents)
    state, _ = eng.reset(jax.random.PRNGKey(3), params)
    assert int(state.epi_spawned) == 8  # initial spawn counted

    n_scene = 0
    ev = {"arrive": 0, "crash": 0, "out": 0}
    key = jax.random.PRNGKey(4)
    for t in range(80):  # two full episodes
        key, k = jax.random.split(key)
        act = jnp.stack(
            [0.3 * jax.random.normal(k, (8,)), jnp.full((8,), 0.6)], axis=-1
        )
        state, out = eng.step(state, act, params)
        i = out.info
        ev["arrive"] += int(i.arrive_dest.sum())
        ev["crash"] += int((i.crash & out.done & ~i.arrive_dest).sum())
        ev["out"] += int(
            (i.out_of_road & out.done & ~i.arrive_dest & ~i.crash).sum())
        if bool(i.scene_done):
            n_scene += 1
            spawned = int(i.scene_spawned)
            assert spawned >= 8
            assert int(i.scene_arrive) == ev["arrive"]
            assert int(i.scene_crash) == ev["crash"]
            assert int(i.scene_out) == ev["out"]
            assert ev["arrive"] + ev["crash"] + ev["out"] <= spawned
            ev = {"arrive": 0, "crash": 0, "out": 0}
            # counters reset with the episode
            assert int(state.epi_arrive) == 0
        else:
            assert int(i.scene_spawned) == 0
    assert n_scene == 2


def test_horizon_grace_drain():
    """MetaDrive MA horizon semantics (EnvConfig.horizon_grace): respawn
    stops at the horizon, survivors keep driving, and done_all fires only
    once the field has drained — so no agent lands in a max_step bucket from
    the episode cut (the reference's training stats show max_step == 0)."""
    scene, cfg = make_scene("intersection", num_agents=4, horizon=10)
    assert cfg.horizon_grace
    eng = DrivingEngine(scene, cfg)
    params = EnvParams.default(cfg.num_agents)
    state, _ = eng.reset(jax.random.PRNGKey(4), params)
    # zero-action agents never terminate on their own: episode must continue
    # past the horizon (no done_all), with respawn disabled
    uid_at_h = None
    for t in range(30):
        state, out = eng.step(state, jnp.zeros((cfg.num_agents, 2)), params)
        if t >= 10:
            assert not bool(out.done_all)
            assert int(state.next_uid) == uid_at_h  # no post-horizon respawn
        elif t == 9:
            uid_at_h = int(state.next_uid)
    # force-terminate the survivors (off-road) -> done_all fires
    state = state.replace(pos=state.pos + 1000.0)
    state, out = eng.step(state, jnp.zeros((cfg.num_agents, 2)), params)
    assert bool(out.done_all)
    assert int(state.t) == 0  # auto-reset occurred


def test_staggered_reset_phases():
    """stagger_t_init spreads env episode clocks so horizon flushes do not
    synchronize across the batch."""
    from copo_tpu.envs.engine import stagger_t_init, vec_reset

    scene, cfg = make_scene("intersection", num_agents=4, horizon=100)
    params = EnvParams.default(4)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    t0 = stagger_t_init(8, 100)
    states, _ = jax.jit(vec_reset, static_argnums=(1,))(
        scene, cfg, keys, params, t0)
    ts = np.asarray(states.t)
    assert sorted(ts.tolist()) == [0, 12, 25, 37, 50, 62, 75, 87]
