"""Batched, masked Generalized Advantage Estimation on device.

Replaces the reference's per-trajectory numpy `discount_cumsum`
(`algo_copo.py:17,189-204`, RLlib `compute_advantages`) with one reverse
`lax.scan` over the time axis of slot-based rollouts (T, ...). Because agents
live in fixed slots and respawn in place (SURVEY.md §7.3 "ragged agent
lifecycle"), the recursion must reset at per-slot done boundaries and ignore
invalid (empty-slot) steps — handled with masks instead of RLlib's batch
slicing.

Reference GAE streams (SURVEY.md §2.3 item 5):
  native: gamma=cfg, lambda=cfg, bootstrap from VF
  nei:    gamma=cfg, lambda=cfg, over nei_rewards vs nei-VF
  global: gamma=1.0, lambda=cfg, over global_rewards vs global-VF
Bootstraps use the last value prediction when the rollout truncates
mid-episode (`algo_copo.py:492-496`).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def masked_gae(rewards, values, dones, valid, last_values, *, gamma, lam):
    """GAE over leading time axis with per-slot resets.

    Args:
      rewards, values, dones, valid: (T, ...) — aligned per transition;
        `dones[t]` marks the agent's terminal transition (no bootstrap past
        it); `valid[t]` marks a real transition (empty slots contribute 0).
      last_values: (...) value prediction at the post-rollout observation,
        used to bootstrap truncated (non-done) trajectories.
    Returns (advantages, value_targets), both (T, ...), zero where invalid.
    """
    dones_f = dones.astype(jnp.float32)
    valid_f = valid.astype(jnp.float32)

    def step(carry, xs):
        next_adv, next_value = carry
        r, v, d, m = xs
        nonterminal = 1.0 - d
        delta = r + gamma * next_value * nonterminal - v
        adv = (delta + gamma * lam * nonterminal * next_adv) * m
        # carry passes through invalid (empty-slot) steps unchanged; the
        # done flag on the terminal transition already blocks any bootstrap
        # across a respawn (slot reuse never leaks values between agents)
        new_carry = (jnp.where(m > 0, adv, next_adv), jnp.where(m > 0, v, next_value))
        return new_carry, adv

    (_, _), advs = lax.scan(
        step,
        (jnp.zeros_like(last_values), last_values),
        (rewards, values, dones_f, valid_f),
        reverse=True,
    )
    targets = advs + values * valid_f
    return advs, targets
