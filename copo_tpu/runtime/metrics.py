"""On-device episode metrics mirroring the reference callbacks.

Parity target: `MultiAgentDrivingCallbacks` (`torch_copo/utils/callbacks.py:
14-153`): success/crash/out_of_road/max_step rates over agent episodes ending
in the window, episode length/reward/cost stats, per-step velocity etc. The
reference accumulates python dicts per episode; here everything is a masked
reduction over the (T, B, N) trajectory — no host involvement.

Headline metric: success_rate = mean over *finished agent episodes* of
arrive_dest (`callbacks.py:52-67` takes the per-scene-episode agent mean;
with thousands of envs we pool all agent episodes in the window, which is the
same statistic up to weighting by agents-per-episode).
"""

from __future__ import annotations

import jax.numpy as jnp


def _rate(num, den):
    return jnp.where(den > 0, num / jnp.maximum(den, 1), jnp.nan)


def rollout_metrics(traj) -> dict:
    """Compute scalar metrics from a (T, B, N) trajectory record dict."""
    info = traj["info"]
    valid = traj["valid"]
    done = traj["done"] & valid
    n_done = jnp.sum(done)

    def done_mean(x):
        return _rate(jnp.sum(jnp.where(done, x, 0.0)), n_done)

    n_step = jnp.maximum(jnp.sum(valid), 1)

    def step_mean(x):
        return jnp.sum(jnp.where(valid, x, 0.0)) / n_step

    return {
        "success_rate": done_mean(info.arrive_dest),
        "crash_rate": done_mean(info.crash),
        "out_of_road_rate": done_mean(info.out_of_road),
        "max_step_rate": done_mean(info.max_step),
        "episode_length": done_mean(info.episode_length.astype(jnp.float32)),
        "episode_reward": done_mean(info.episode_reward),
        "episode_cost": done_mean(info.episode_cost),
        "route_completion": done_mean(info.route_completion),
        "episodes_this_iter": n_done.astype(jnp.float32),
        "velocity": step_mean(info.velocity),
        "step_reward": step_mean(info.step_reward),
        "num_neighbours": step_mean(info.num_neighbours.astype(jnp.float32)),
        "num_active_agents": step_mean(valid.astype(jnp.float32)) * valid.shape[2],
        "cost_per_step": step_mean(info.cost),
    }
