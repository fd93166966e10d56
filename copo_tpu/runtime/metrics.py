"""On-device episode metrics mirroring the reference callbacks.

Parity target: `MultiAgentDrivingCallbacks` (`copo_code/copo/callbacks.py:
11-112`, torch variant `torch_copo/utils/callbacks.py:14-153`). The headline
success/crash/out/max_step rates are the reference's PER-SCENE-EPISODE
statistic (`callbacks.py:52-67`): once per 1000-step scene episode, rates
over EVERY agent that appeared in it — agents still driving at the horizon
fall into the max_step bucket ("not (arrive or crash or out)"). The engine
tallies these on device (`EnvState.epi_*` counters flushed into
`StepInfo.scene_*` at done_all); here they reduce to per-iteration scalars,
and the harness smooths them over the trailing 100 scene episodes exactly
like RLlib's `metrics_num_episodes_for_smoothing`.

Per-agent means (length/reward/cost at individual agent dones) and per-step
means (velocity etc.) ride along as secondary columns.
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

    # --- headline: per-scene-episode rates (reference callbacks.py:52-67) ---
    sdone = info.scene_done                       # (T, B) bool
    n_scene = jnp.sum(sdone)
    spawned = jnp.maximum(info.scene_spawned, 1).astype(jnp.float32)

    def scene_mean(counts):
        """Mean over finished scene episodes of the per-episode rate
        (equal weight per episode, like RLlib's 100-episode smoothing)."""
        r = counts.astype(jnp.float32) / spawned
        return _rate(jnp.sum(jnp.where(sdone, r, 0.0)), n_scene)

    succ = scene_mean(info.scene_arrive)
    crash = scene_mean(info.scene_crash)
    out = scene_mean(info.scene_out)
    max_step = jnp.where(
        n_scene > 0, 1.0 - (succ + crash + out), jnp.nan
    )

    return {
        "success_rate": succ,
        "crash_rate": crash,
        "out_of_road_rate": out,
        "max_step_rate": max_step,
        "episodes_this_iter": n_scene.astype(jnp.float32),
        # secondary per-agent-episode means (at agent done)
        "episode_length": done_mean(info.episode_length.astype(jnp.float32)),
        "episode_reward": done_mean(info.episode_reward),
        "episode_cost": done_mean(info.episode_cost),
        "route_completion": done_mean(info.route_completion),
        "agent_episodes_this_iter": n_done.astype(jnp.float32),
        # per-step means
        "velocity": step_mean(info.velocity),
        "step_reward": step_mean(info.step_reward),
        "num_neighbours": step_mean(info.num_neighbours.astype(jnp.float32)),
        "num_active_agents": step_mean(valid.astype(jnp.float32)) * valid.shape[2],
        "cost_per_step": step_mean(info.cost),
    }
