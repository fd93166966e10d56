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


def test_detector_extras_filled_on_bottleneck_and_tollgate():
    for name, extra in (("bottleneck", 5), ("tollgate", 65)):
        scene, cfg = make_scene(name, num_agents=4)
        assert cfg.obs_extra_dim == extra
        assert cfg.obs_extra_kind == "detector"
        eng = DrivingEngine(scene, cfg)
        st, obs = eng.reset(jax.random.PRNGKey(0), EnvParams.default(4))
        blk = np.asarray(obs[:, 19 + cfg.lidar_num_lasers:][:, :extra])
        # detector beams see walls (not all clear) and stay in [0, 1]
        assert blk.min() >= 0.0 and blk.max() <= 1.0
        assert (blk[:, :-1] < 1.0).any(), f"{name}: no wall seen by detector"


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
