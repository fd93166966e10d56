"""Multi-device correctness: a GSPMD-sharded train step must reproduce the
unsharded result (VERDICT r1 item 5).

The reference's distributed path is Ray workers + weight broadcast
(`train/train.py:37-52`); ours is a sharding annotation on the same jitted
program, so correctness is testable as sharded == unsharded from identical
state on the conftest-provisioned 8-CPU-device mesh. Small float drift is
expected (sharded reductions reassociate), exact equality is not.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from copo_tpu.envs import make_scene
from copo_tpu.parallel.mesh import make_mesh, shard_train_state
from copo_tpu.runtime.copo import CoPOConfig, CoPOTrainer
from copo_tpu.runtime.trainer import IPPOTrainer, TrainerConfig


def _max_param_diff(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return max(
        float(jnp.max(jnp.abs(x - y))) for x, y in zip(leaves_a, leaves_b)
    )


def _common(seed):
    return dict(
        num_envs=8, rollout_T=8, sgd_minibatch_size=32, num_sgd_iter=2,
        seed=seed,
    )


def test_ippo_sharded_matches_unsharded(devices):
    scene, env_cfg = make_scene("intersection", num_agents=4, horizon=50)
    trainer = IPPOTrainer(scene, env_cfg, TrainerConfig(**_common(7)))
    state0 = trainer.init_state()

    state_ref, m_ref = trainer.train_iter(state0)

    mesh = make_mesh(devices=devices)
    sharded0 = shard_train_state(state0, mesh)
    with mesh:
        state_sh, m_sh = trainer.train_iter(sharded0)

    assert _max_param_diff(state_ref.params, state_sh.params) < 1e-4
    np.testing.assert_allclose(
        float(m_ref["kl"]), float(m_sh["kl"]), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        float(m_ref["agent_steps_this_iter"]),
        float(m_sh["agent_steps_this_iter"]),
    )
    # the sharded state actually lives on the mesh (not silently gathered)
    shardings = {
        str(leaf.sharding.spec)
        for leaf in jax.tree_util.tree_leaves(state_sh.env_states)
        if hasattr(leaf, "sharding") and hasattr(leaf.sharding, "spec")
    }
    assert any("data" in s for s in shardings), shardings


def test_copo_sharded_matches_unsharded(devices):
    scene, env_cfg = make_scene(
        "intersection", num_agents=4, horizon=50, lcf_enabled=True
    )
    cfg = CoPOConfig(lcf_num_iters=2, **_common(11))
    trainer = CoPOTrainer(scene, env_cfg, cfg)
    state0 = trainer.init_state()

    state_ref, m_ref = trainer.train_iter(state0)

    mesh = make_mesh(devices=devices)
    with mesh:
        state_sh, m_sh = trainer.train_iter(shard_train_state(state0, mesh))

    assert _max_param_diff(state_ref.params, state_sh.params) < 1e-4
    # the meta-gradient LCF distribution update must agree too
    np.testing.assert_allclose(
        float(m_ref["lcf_deg"]), float(m_sh["lcf_deg"]), rtol=1e-3, atol=1e-4
    )


def test_second_sharded_step_runs(devices):
    """Regression: the output sharding of step 1 must be a valid input
    sharding for step 2 (no host round-trip between iterations)."""
    scene, env_cfg = make_scene("intersection", num_agents=4, horizon=50)
    trainer = IPPOTrainer(scene, env_cfg, TrainerConfig(**_common(13)))
    mesh = make_mesh(devices=devices)
    state = shard_train_state(trainer.init_state(), mesh)
    with mesh:
        state, _ = trainer.train_iter(state)
        state, m = trainer.train_iter(state)
    assert np.isfinite(float(m["total_loss"]))
