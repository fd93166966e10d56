"""CCPPO fusion + CoPO trainer tests (SURVEY.md §2.3 items 5-9 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from copo_tpu.algos.ccppo import FusionConfig, cc_obs_dim, make_cc_obs_fn
from copo_tpu.envs import make_scene
from copo_tpu.runtime.ccppo import CCPPOConfig, CCPPOTrainer
from copo_tpu.runtime.copo import CoPOConfig, CoPOTrainer


def test_cc_obs_dim_formula():
    # reference formula (`torch_copo/algo_ccppo.py:55-71`) on intersection dims
    assert cc_obs_dim(91, 2, FusionConfig("concat", 4, 10.0, True)) == 5 * 91 + 4 * 2
    assert cc_obs_dim(91, 2, FusionConfig("mf", 4, 10.0, True)) == 2 * 91 + 2
    assert cc_obs_dim(91, 2, FusionConfig("mf", 4, 10.0, False)) == 2 * 91
    assert cc_obs_dim(91, 2, FusionConfig("none", 4, 10.0, True)) == 91


def test_mf_fusion_masked_mean():
    # 3 agents: a0 and a1 within 10 m, a2 far away; a0's mf slot = a1's obs
    class FakeStates:
        pos = jnp.array([[[0.0, 0.0], [5.0, 0.0], [100.0, 0.0]]])
        alive = jnp.array([[True, True, True]])

    obs = jnp.arange(1 * 3 * 4, dtype=jnp.float32).reshape(1, 3, 4)
    act = jnp.ones((1, 3, 2))
    fn = make_cc_obs_fn(FusionConfig("mf", 4, 10.0, True), 40.0)
    cc = fn(None, None, FakeStates, obs, act)
    assert cc.shape == (1, 3, 4 + 4 + 2)
    np.testing.assert_allclose(np.asarray(cc[0, 0, 4:8]), np.asarray(obs[0, 1]))
    np.testing.assert_allclose(np.asarray(cc[0, 2, 4:8]), 0.0)  # no neighbour


def test_concat_fusion_sorted_and_padded():
    class FakeStates:
        pos = jnp.array([[[0.0, 0.0], [5.0, 0.0], [2.0, 0.0], [100.0, 0.0]]])
        alive = jnp.array([[True, True, True, True]])

    obs = jnp.arange(1 * 4 * 3, dtype=jnp.float32).reshape(1, 4, 3)
    act = jnp.zeros((1, 4, 2))
    fn = make_cc_obs_fn(FusionConfig("concat", 2, 10.0, False), 40.0)
    cc = fn(None, None, FakeStates, obs, act)
    assert cc.shape == (1, 4, 3 * 3)
    # agent 0's nearest neighbours sorted by distance: a2 (2 m), a1 (5 m)
    np.testing.assert_allclose(np.asarray(cc[0, 0, 3:6]), np.asarray(obs[0, 2]))
    np.testing.assert_allclose(np.asarray(cc[0, 0, 6:9]), np.asarray(obs[0, 1]))
    # agent 3 has no in-range neighbours: zero-padded
    np.testing.assert_allclose(np.asarray(cc[0, 3, 3:]), 0.0)


@pytest.mark.parametrize("fuse", ["mf", "concat"])
def test_ccppo_train_iter(fuse):
    scene, env_cfg = make_scene("intersection", num_agents=6, horizon=100)
    cfg = CCPPOConfig(num_envs=2, rollout_T=10, sgd_minibatch_size=32,
                      num_sgd_iter=2, fusion=FusionConfig(fuse, 4, 10.0, True))
    tr = CCPPOTrainer(scene, env_cfg, cfg)
    state = tr.init_state()
    state, m = tr.train_iter(state)
    assert np.isfinite(float(m["total_loss"]))
    assert np.isfinite(float(m["vf_loss"]))


@pytest.fixture(scope="module")
def copo_setup():
    scene, env_cfg = make_scene("intersection", num_agents=6, horizon=100,
                                lcf_enabled=True)
    # lcf_gate="none": these tests assert the meta-update mechanics; the
    # success gate would freeze the LCF in a tiny zero-success batch
    cfg = CoPOConfig(num_envs=2, rollout_T=10, sgd_minibatch_size=32,
                     num_sgd_iter=2, lcf_num_iters=2, lcf_gate="none")
    return CoPOTrainer(scene, env_cfg, cfg)


def test_copo_train_iter_runs(copo_setup):
    tr = copo_setup
    state = tr.init_state()
    assert "nei_vf" in state.params and "global_vf" in state.params
    lcf0 = np.asarray(state.params["lcf"]).copy()
    state, m = tr.train_iter(state)
    for k in ("vf_loss", "nei_vf_loss", "global_vf_loss", "lcf", "lcf_std",
              "meta/grad_value", "raw_lcf_adv_mean"):
        assert k in m, sorted(m)
    assert np.isfinite(float(m["total_loss"]))
    # LCF parameters moved (meta-update applied)
    assert np.any(np.asarray(state.params["lcf"]) != lcf0)
    # env LCF distribution pushed to env params
    np.testing.assert_allclose(
        float(state.env_params.lcf_mean), float(m["lcf"]), rtol=1e-5
    )
    # old policy synced to new policy after meta-update
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(state.target_params)
    assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))


def test_copo_obs_includes_lcf_slot(copo_setup):
    tr = copo_setup
    state = tr.init_state()
    assert state.last_obs.shape[-1] == 92  # 91 + LCF slot
    slot = np.asarray(state.last_obs[..., -1])
    alive = np.asarray(state.env_states.alive)
    # initial mean 0, std 0.1 -> obs slot (lcf+1)/2 around 0.5
    assert abs(slot[alive].mean() - 0.5) < 0.1


def test_copo_use_global_value_false():
    # published ablation axis (`train_all_copo_dist.py:49`, `grad.py:43-46`):
    # L1 falls back to the standardized ego advantage
    scene, env_cfg = make_scene("intersection", num_agents=6, horizon=100,
                                lcf_enabled=True)
    cfg = CoPOConfig(num_envs=2, rollout_T=10, sgd_minibatch_size=32,
                     num_sgd_iter=2, lcf_num_iters=2, use_global_value=False,
                     lcf_gate="none")
    tr = CoPOTrainer(scene, env_cfg, cfg)
    state = tr.init_state()
    lcf0 = np.asarray(state.params["lcf"]).copy()
    state, m = tr.train_iter(state)
    assert np.isfinite(float(m["meta/grad_value"]))
    assert np.any(np.asarray(state.params["lcf"]) != lcf0)


def test_copo_requires_lcf_env():
    scene, env_cfg = make_scene("intersection", num_agents=6)
    with pytest.raises(ValueError):
        CoPOTrainer(scene, env_cfg, CoPOConfig())


def test_copo_success_gate_freezes_lcf_without_success():
    """lcf_gate="success": the trust-region cap scales with the batch's own
    success rate — a batch in which no agent arrives must leave the LCF
    parameters untouched (the r5 anti-collapse rail: no blind LCF movement
    before driving competence exists)."""
    scene, env_cfg = make_scene("intersection", num_agents=6, horizon=100,
                                lcf_enabled=True)
    cfg = CoPOConfig(num_envs=2, rollout_T=10, sgd_minibatch_size=32,
                     num_sgd_iter=2, lcf_num_iters=2, lcf_gate="success")
    tr = CoPOTrainer(scene, env_cfg, cfg)
    state = tr.init_state()
    lcf0 = np.asarray(state.params["lcf"]).copy()
    state, m = tr.train_iter(state)
    # 20 random steps of 6 fresh agents: nobody arrives -> cap = 0
    np.testing.assert_array_equal(np.asarray(state.params["lcf"]), lcf0)
