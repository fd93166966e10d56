"""GAE unit tests with hand-computed references (SURVEY.md §4: the math the
reference delegates to RLlib `compute_advantages` / numpy discount_cumsum)."""

import jax.numpy as jnp
import numpy as np

from copo_tpu.algos.gae import masked_gae


def ref_gae(rewards, values, dones, last_value, gamma, lam):
    """Straightforward python reference for a single trajectory."""
    T = len(rewards)
    adv = np.zeros(T)
    next_adv, next_v = 0.0, last_value
    for t in reversed(range(T)):
        nonterminal = 1.0 - dones[t]
        delta = rewards[t] + gamma * next_v * nonterminal - values[t]
        adv[t] = delta + gamma * lam * nonterminal * next_adv
        next_adv, next_v = adv[t], values[t]
    return adv


def test_gae_matches_reference_no_dones():
    T = 6
    r = np.array([1.0, 0.5, -0.2, 0.3, 1.0, 0.0])
    v = np.array([0.5, 0.4, 0.3, 0.2, 0.6, 0.1])
    d = np.zeros(T)
    adv_ref = ref_gae(r, v, d, last_value=0.7, gamma=0.99, lam=0.95)

    adv, tgt = masked_gae(
        jnp.asarray(r)[:, None], jnp.asarray(v)[:, None],
        jnp.asarray(d)[:, None].astype(bool), jnp.ones((T, 1), bool),
        jnp.asarray([0.7]), gamma=0.99, lam=0.95,
    )
    np.testing.assert_allclose(np.asarray(adv)[:, 0], adv_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tgt)[:, 0], adv_ref + v, rtol=1e-5)


def test_gae_resets_at_done():
    # done at t=2: steps 3.. belong to a new episode; no bootstrap across
    r = np.array([1.0, 1.0, 1.0, 1.0, 1.0])
    v = np.array([0.5, 0.5, 0.5, 0.5, 0.5])
    d = np.array([0.0, 0.0, 1.0, 0.0, 0.0])
    adv_ref = ref_gae(r, v, d, last_value=0.9, gamma=0.9, lam=0.8)
    adv, _ = masked_gae(
        jnp.asarray(r)[:, None], jnp.asarray(v)[:, None],
        jnp.asarray(d)[:, None].astype(bool), jnp.ones((5, 1), bool),
        jnp.asarray([0.9]), gamma=0.9, lam=0.8,
    )
    np.testing.assert_allclose(np.asarray(adv)[:, 0], adv_ref, rtol=1e-5)
    # terminal step advantage = r - v exactly
    np.testing.assert_allclose(np.asarray(adv)[2, 0], 1.0 - 0.5, rtol=1e-6)


def test_gae_respawn_slot_isolation():
    # slot: agent A (t=0,1, done at 1), empty (t=2), agent B (t=3,4)
    r = np.array([1.0, 2.0, 0.0, 3.0, 1.0])
    v = np.array([0.5, 0.5, 0.0, 0.7, 0.7])
    d = np.array([0.0, 1.0, 0.0, 0.0, 0.0])
    m = np.array([1.0, 1.0, 0.0, 1.0, 1.0])
    adv, tgt = masked_gae(
        jnp.asarray(r)[:, None], jnp.asarray(v)[:, None],
        jnp.asarray(d)[:, None].astype(bool), jnp.asarray(m)[:, None].astype(bool),
        jnp.asarray([0.4]), gamma=0.9, lam=0.8,
    )
    adv = np.asarray(adv)[:, 0]
    # invalid step contributes nothing
    assert adv[2] == 0.0
    # agent A's segment: standard 2-step episode ending in done
    a_ref = ref_gae(r[:2], v[:2], d[:2], last_value=0.0, gamma=0.9, lam=0.8)
    np.testing.assert_allclose(adv[:2], a_ref, rtol=1e-5)
    # agent B's segment: truncated, bootstraps from last_value
    b_ref = ref_gae(r[3:], v[3:], d[3:], last_value=0.4, gamma=0.9, lam=0.8)
    np.testing.assert_allclose(adv[3:], b_ref, rtol=1e-5)
