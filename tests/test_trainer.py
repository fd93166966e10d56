"""Trainer smoke + learning tests (reference pattern: tiny-budget end-to-end
local-mode runs, `torch_copo/algo_ippo.py:186-230`, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from copo_tpu.envs import make_scene
from copo_tpu.runtime.trainer import IPPOTrainer, TrainerConfig


@pytest.fixture(scope="module")
def tiny_setup():
    scene, env_cfg = make_scene("intersection", num_agents=8, horizon=200)
    tcfg = TrainerConfig(num_envs=2, rollout_T=20, sgd_minibatch_size=64,
                         num_sgd_iter=2, seed=0)
    trainer = IPPOTrainer(scene, env_cfg, tcfg)
    return trainer


def test_train_iter_runs_and_updates(tiny_setup):
    trainer = tiny_setup
    state = trainer.init_state()
    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.params)
    state, metrics = trainer.train_iter(state)

    assert int(state.iteration) == 1
    for k in ("policy_loss", "vf_loss", "kl", "entropy", "success_rate"):
        assert k in metrics, sorted(metrics)
    assert np.isfinite(float(metrics["policy_loss"]))
    assert np.isfinite(float(metrics["vf_loss"]))
    # params actually changed
    p1 = state.params
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - b))), p1, p0
    )
    flat = jax.tree_util.tree_leaves(diff)
    assert max(flat) > 1e-6
    # metric counters
    assert float(metrics["env_steps_this_iter"]) == 2 * 20
    assert 0 < float(metrics["agent_steps_this_iter"]) <= 2 * 20 * 8


def test_train_iter_deterministic_given_state(tiny_setup):
    trainer = tiny_setup
    state = trainer.init_state()
    s1, m1 = trainer.train_iter(state)
    s2, m2 = trainer.train_iter(state)
    np.testing.assert_allclose(
        np.asarray(m1["policy_loss"]), np.asarray(m2["policy_loss"]), rtol=1e-6
    )


def test_multiple_iters_stable(tiny_setup):
    trainer = tiny_setup
    state = trainer.init_state()
    for _ in range(3):
        state, metrics = trainer.train_iter(state)
    assert np.isfinite(float(metrics["total_loss"]))
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
