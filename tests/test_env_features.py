"""Optional env features: comm channel, traffic-light obs, scene-extra
detector blocks, zone speed limit (reference LCFEnv `communication` /
`add_traffic_light` configs, `torch_copo/utils/env_wrappers.py:44-46,
91-121,258-272,363-390`; off by default there and here)."""

import jax
import jax.numpy as jnp
import numpy as np

from copo_tpu.envs import make_scene
from copo_tpu.envs.config import EnvConfig, EnvParams
from copo_tpu.envs.engine import DrivingEngine
from copo_tpu.envs.observation import traffic_light_block


def _rollout(eng, cfg, T=6, seed=0):
    params = EnvParams.default(cfg.num_agents)
    st, obs = eng.reset(jax.random.PRNGKey(seed), params)
    outs = []
    for i in range(T):
        act = jax.random.uniform(
            jax.random.PRNGKey(100 + i), (cfg.num_agents, cfg.action_dim),
            minval=-1.0, maxval=1.0,
        )
        st, out = eng.step(st, act, params)
        outs.append(out)
    return st, obs, outs


def test_comm_channel_dims_and_content():
    scene, cfg = make_scene(
        "intersection", num_agents=6, comm_method="direct",
        comm_size=4, comm_neighbours=3,
    )
    # action space widens by comm_size; obs by comm_dim * comm_neighbours
    assert cfg.action_dim == 6
    assert cfg.comm_dim == 4
    assert cfg.obs_dim == cfg.base_obs_dim + 12

    eng = DrivingEngine(scene, cfg)
    st, obs0, outs = _rollout(eng, cfg)
    # reset obs has a zero comm block (env_wrappers.py:296-303)
    np.testing.assert_array_equal(np.asarray(obs0[:, -12:]), 0.0)
    # after stepping, messages flow (agents spawn close enough at intersection)
    assert any(bool(jnp.any(o.obs[:, -12:] != 0)) for o in outs)


def test_comm_add_pos_in_comm_extras_in_range():
    scene, cfg = make_scene(
        "intersection", num_agents=6, comm_method="direct",
        comm_size=2, comm_neighbours=2, add_pos_in_comm=True,
    )
    assert cfg.comm_dim == 5
    eng = DrivingEngine(scene, cfg)
    _, _, outs = _rollout(eng, cfg)
    blk = np.asarray(outs[-1].obs[:, -cfg.comm_obs_dim:]).reshape(6, 2, 5)
    # pos-tag dims (last 3 of each message) are clipped to [0, 1]
    assert blk[..., 2:].min() >= 0.0 and blk[..., 2:].max() <= 1.0


def test_traffic_light_block_sawtooth():
    scene, cfg = make_scene(
        "intersection", num_agents=4, add_traffic_light=True,
        traffic_light_interval=10,
    )
    assert cfg.obs_dim == cfg.base_obs_dim + 3
    pos = jnp.zeros((4, 2))
    # phase 0 (even): msg = 1 - (t % 10)/10 * 0.1
    blk = traffic_light_block(scene, cfg, pos, jnp.int32(3))
    np.testing.assert_allclose(float(blk[0, 0]), 1.0 - 0.3 / 10 * 1.0, atol=1e-6)
    # phase 1 (odd): msg = (t % 10)/10 * 0.1
    blk = traffic_light_block(scene, cfg, pos, jnp.int32(13))
    np.testing.assert_allclose(float(blk[0, 0]), 0.3 / 10 * 1.0, atol=1e-6)
    # position channels normalized into [0, 1]
    assert float(blk[:, 1:].min()) >= 0.0 and float(blk[:, 1:].max()) <= 1.0


def test_detector_layouts_on_bottleneck_and_tollgate():
    # MetaDrive detector layouts (see EnvConfig): bottleneck 96 =
    # [side 4 | core 6 | lane-line 4 | navi 10 | lidar 72]; tollgate 156 =
    # [side 72 | core 6 | lane-line 5 | lidar 72 | toll 1], no navi
    scene, cfg = make_scene("bottleneck", num_agents=4)
    assert (cfg.side_detector_lasers, cfg.lane_line_lasers) == (4, 4)
    assert cfg.obs_dim == 96 and cfg.navi_in_obs
    eng = DrivingEngine(scene, cfg)
    st, obs = eng.reset(jax.random.PRNGKey(0), EnvParams.default(4))
    side = np.asarray(obs[:, :4])
    lane = np.asarray(obs[:, 10:14])
    assert side.min() >= 0.0 and side.max() <= 1.0
    assert (side < 1.0).any(), "side detector sees no wall"
    assert (lane < 1.0).any(), "lane-line detector sees no line"

    scene, cfg = make_scene("tollgate", num_agents=4)
    assert (cfg.side_detector_lasers, cfg.lane_line_lasers) == (72, 5)
    assert cfg.obs_dim == 156 and not cfg.navi_in_obs and cfg.toll_obs
    eng = DrivingEngine(scene, cfg)
    st, obs = eng.reset(jax.random.PRNGKey(0), EnvParams.default(4))
    side = np.asarray(obs[:, :72])
    assert (side < 1.0).any()
    # toll flag dim (155) reads 0 outside the gate at spawn
    np.testing.assert_allclose(np.asarray(obs[:, 155]), 0.0)


def test_tollgate_zone_speed_limit_penalizes():
    scene, cfg = make_scene("tollgate", num_agents=2)
    assert cfg.zone_speed_limit > 0.0
    from copo_tpu.envs.observation import in_zone

    inside = jnp.array([[90.0, 2.1]])   # mid-plaza gate centerline
    outside = jnp.array([[10.0, 0.0]])
    assert bool(in_zone(scene, inside)[0])
    assert not bool(in_zone(scene, outside)[0])


def test_lidar_num_others_block():
    """`vehicle_config.lidar.num_others` (SURVEY.md §2.2): 4 features per
    nearest-K vehicle — ego-frame relative position + relative velocity,
    mapped to [0,1]; zeros when no vehicle is in range."""
    scene, cfg = make_scene("intersection", num_agents=4, lidar_num_others=2)
    assert cfg.obs_dim == 91 + 8
    eng = DrivingEngine(scene, cfg)
    params = EnvParams.default(cfg.num_agents)
    st, obs = eng.reset(jax.random.PRNGKey(0), params)
    assert obs.shape == (4, cfg.obs_dim)

    # place agent 1 exactly 10 m ahead of agent 0 (same heading, both still)
    h0 = float(st.heading[0])
    fwd = jnp.array([jnp.cos(h0), jnp.sin(h0)])
    st = st.replace(
        # the other two go far outside lidar range
        pos=st.pos.at[1].set(st.pos[0] + 10.0 * fwd)
               .at[2].set(st.pos[0] + 500.0 * fwd)
               .at[3].set(st.pos[0] - 500.0 * fwd),
        heading=st.heading.at[1].set(h0),
        speed=st.speed * 0.0,
    )
    from copo_tpu.envs.engine import observe
    obs = observe(scene, cfg, st)
    start = 19 + cfg.lidar_num_lasers
    blk0 = np.asarray(obs[0, start:start + 8]).reshape(2, 4)
    # nearest other: 10 m straight ahead -> fwd feature (10/40 + 1)/2
    np.testing.assert_allclose(blk0[0, 0], 0.5 + 10.0 / 40.0 / 2, atol=1e-5)
    np.testing.assert_allclose(blk0[0, 1], 0.5, atol=1e-5)      # no lateral
    np.testing.assert_allclose(blk0[0, 2:], 0.5, atol=1e-5)     # no rel vel
    np.testing.assert_array_equal(blk0[1], 0.0)                 # only 1 in range


def test_default_configs_unchanged():
    """Features default off: obs/action dims match the reference contract."""
    scene, cfg = make_scene("intersection")
    assert cfg.obs_dim == 91 and cfg.action_dim == 2
    scene, cfg = make_scene("tollgate")
    assert cfg.obs_dim == 156
    scene, cfg = make_scene("bottleneck")
    assert cfg.obs_dim == 96


def test_tollgate_stop_and_wait_mechanics():
    # MetaDrive marl_tollgate semantics: leaving the gate unpaid = barrier
    # crash; waiting toll_min_pass_time steps under the limit pays the toll
    # (toll obs flag flips -1 -> +1) and the vehicle may proceed
    import jax.numpy as jnp

    scene, cfg = make_scene("tollgate", num_agents=1, crash_done=True)
    eng = DrivingEngine(scene, cfg)
    ep = EnvParams.default(1)

    def drive_to_gate(state, obs):
        # fast on the open road, then slow below the gate limit before the
        # plaza (overspeeding inside the gate is fatal)
        for _ in range(600):
            if bool(state.alive[0]) and 82.0 < float(state.pos[0, 0]) < 90.0:
                break
            x = float(state.pos[0, 0])
            target = 4.0 if x < 74.0 else 0.7
            thr = max(-1.0, min(0.8, (target - float(state.speed[0])) * 0.8))
            state, out = eng.step(state, jnp.array([[0.0, thr]]), ep)
            if not bool(state.alive[0]):
                return state, out, False
        return state, out, True

    # runner: blast into the gate at speed -> overspeed kill (crash)
    state, obs = eng.reset(jax.random.PRNGKey(3), ep)
    # force a +x-direction agent: keys until spawn heading ~0
    k = 3
    while abs(float(state.heading[0])) > 0.5:
        k += 1
        state, obs = eng.reset(jax.random.PRNGKey(k), ep)
    crashed = False
    for _ in range(400):
        state, out = eng.step(state, jnp.array([[0.0, 1.0]]), ep)
        crashed = crashed or bool(np.asarray(out.info.crash).any())
        if not bool(state.alive[0]):
            break
    assert crashed, "overspeeding through the gate must be fatal"

    # waiter: stop inside the gate for toll_min_pass_time, then proceed
    state, obs = eng.reset(jax.random.PRNGKey(k), ep)
    state, out, reached = drive_to_gate(state, obs)
    assert reached
    assert float(np.asarray(out.obs[0, 155])) in (-1.0, 1.0)  # inside the gate
    for _ in range(cfg.toll_min_pass_time + 10):
        state, out = eng.step(state, jnp.array([[0.0, -1.0]]), ep)  # brake+hold
    assert float(np.asarray(out.obs[0, 155])) == 1.0, "toll flag must flip to paid"
    arrived = False
    for _ in range(1200):
        # creep until clear of the plaza (the limit covers the whole gate
        # block), then accelerate away
        if float(state.pos[0, 0]) < 101.0:
            thr = max(-1.0, min(0.5, (0.7 - float(state.speed[0])) * 0.8))
        else:
            thr = 0.8
        state, out = eng.step(state, jnp.array([[0.0, thr]]), ep)
        if bool(np.asarray(out.info.arrive_dest).any()):
            arrived = True
            break       # stop before the slot respawns as a fresh agent
        assert not bool(np.asarray(out.info.crash).any()), \
            "paid vehicle must not hit the barrier"
    assert arrived, "paid vehicle should reach its destination"


def test_static_lidar_beam_orientation_matches_vehicle_beams():
    """Regression (r4 advice): with `lidar_see_static=True` the static-wall
    beams must share the vehicle beams' CLOCKWISE-from-heading order. The
    invariant: the ring fast-path equals the general `sample_field` path
    evaluated at exactly `beam_angles` (the angles the vehicle lidar uses),
    for several headings — any stale CCW->CW compensation re-mirrors one of
    the two and breaks this."""
    from copo_tpu.envs.lidar import beam_angles, sample_field, static_lidar

    scene, cfg = make_scene("intersection", num_agents=4)
    pos = jnp.array([[10.0, -3.0], [-20.0, 1.5], [3.0, 18.0], [0.0, -30.0]])
    for h in (0.0, 1.1, -2.4, 3.0):
        heading = jnp.full((4,), h)
        ring = static_lidar(scene, cfg, pos, heading)
        ref = sample_field(scene, pos, beam_angles(cfg, heading),
                           cfg.lidar_distance)
        np.testing.assert_allclose(np.asarray(ring), np.asarray(ref),
                                   rtol=0, atol=2e-3)
