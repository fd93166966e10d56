"""Policy evaluation: the RecorderEnv + eval.py pipeline, on device.

Parity: `eval/recoder.py:16-355` + `eval.py:27-242` (SURVEY.md §2.1 items
20-21). Each evaluation episode runs the env for its horizon (agents respawn
mid-episode exactly as in training/reference eval), then reports the
reference's episode-level metrics: success/crash/out/max-step rates over all
spawned agents, reward/cost stats, and the **estimated empirical SVO** per
finished agent, phi_hat = atan2(total nei reward, total own reward)
(`recoder.py:318-343`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from copo_tpu.envs.config import EnvConfig, EnvParams
from copo_tpu.envs.engine import engine_reset, engine_step
from copo_tpu.envs.scene import SceneData
from copo_tpu.models.mlp import DiagGaussian, policy_logits


def make_policy_fn(deterministic: bool = False):
    """Policy callable (params, obs, key) -> actions.

    Params flow through as a traced argument — never close concrete arrays
    into the jitted episode (constant-embedding slows XLA compile >100x).
    """

    def policy_fn(params, obs, key):
        mean, log_std = policy_logits(params, obs)
        if deterministic:
            return mean
        return DiagGaussian.sample(key, mean, log_std)

    return policy_fn


def _episode(scene: SceneData, cfg: EnvConfig, policy_fn, policy_params,
             env_params, key, drain_steps: int):
    """One full eval episode (horizon steps + bounded drain). Returns
    accumulated stats."""
    k_reset, k_run = jax.random.split(key)
    state, obs = engine_reset(scene, cfg, k_reset, env_params)
    init_agents = state.next_uid

    def step_fn(carry, k):
        state, obs = carry
        act = policy_fn(policy_params, obs, k)
        state, out = engine_step(scene, cfg, state, act, env_params, False)
        i = out.info
        done = out.done & i.valid
        rec = {
            "done": done,
            "arrive": i.arrive_dest, "crash": i.crash, "oor": i.out_of_road,
            "max_step": i.max_step,
            "ep_reward_at_done": jnp.where(done, i.episode_reward, 0.0),
            "ep_cost_at_done": jnp.where(done, i.episode_cost, 0.0),
            "ep_len_at_done": jnp.where(done, i.episode_length, 0),
            "ep_nei_at_done": jnp.where(done, i.episode_nei_reward, 0.0),
            "rc_at_done": jnp.where(done, i.route_completion, 0.0),
            "velocity": jnp.where(i.valid, i.velocity, 0.0),
            "valid": i.valid,
        }
        return (state, out.obs), rec

    def drained_step_fn(carry, k):
        # drain segment: once no agent is alive the env state is frozen and
        # the policy/step work is skipped (the typical post-horizon field
        # empties within tens of steps; paying 1000 full steps for it doubled
        # eval cost and the monolithic 2000-step program wedged XLA compile
        # on the remote-attached backend — NOTES_r3 items 3/5).
        # NOTE: the compute skip only materializes on the UNBATCHED path —
        # under the vmapped episode batch the predicate is batched, cond
        # lowers to select, and both branches execute; correctness is
        # unaffected and the segment early-out below still bounds the cost.
        state, obs = carry
        any_alive = jnp.any(state.alive)
        zero_rec = {
            "done": jnp.zeros_like(state.alive),
            "arrive": jnp.zeros_like(state.alive),
            "crash": jnp.zeros_like(state.alive),
            "oor": jnp.zeros_like(state.alive),
            "max_step": jnp.zeros_like(state.alive),
            "ep_reward_at_done": jnp.zeros_like(state.ep_reward),
            "ep_cost_at_done": jnp.zeros_like(state.ep_cost),
            "ep_len_at_done": jnp.zeros_like(state.steps),
            "ep_nei_at_done": jnp.zeros_like(state.ep_nei_reward),
            "rc_at_done": jnp.zeros_like(state.ep_reward),
            "velocity": jnp.zeros_like(state.speed),
            "valid": jnp.zeros_like(state.alive),
        }
        return jax.lax.cond(
            any_alive, lambda c: step_fn(c, k),
            lambda c: (c, zero_rec), (state, obs),
        )

    # Under horizon_grace (MetaDrive MA semantics) the scene keeps running
    # after the horizon until the field drains. Two scan segments: the
    # horizon proper, then a drain bounded by `drain_steps` (cap on the
    # per-agent step budget of horizon survivors).
    keys = jax.random.split(k_run, cfg.horizon + drain_steps)
    (state, obs), rec = jax.lax.scan(step_fn, (state, obs), keys[:cfg.horizon])
    # drain in <=500-step scan segments: one 1000-step drain scan on top of
    # the horizon scan crashed the remote TPU worker (r5; program size), and
    # segments keep the early-out granularity of the unbatched path
    recs = [rec]
    off = cfg.horizon
    while off < cfg.horizon + drain_steps:
        seg = min(500, cfg.horizon + drain_steps - off)
        (state, obs), rec_i = jax.lax.scan(
            drained_step_fn, (state, obs), keys[off:off + seg]
        )
        recs.append(rec_i)
        off += seg
    if len(recs) > 1:
        rec = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *recs
        )
    return {
        "total_agents": state.next_uid,
        "initial_agents": init_agents,
        **{k: v for k, v in rec.items()},
    }


_jit_episode = jax.jit(_episode, static_argnums=(1, 2, 6))

#: batched episodes: vmap over the episode keys (one device dispatch for the
#: whole eval instead of num_episodes sequential scans — the grid-wide eval
#: pass walks hundreds of checkpoints)
_jit_episode_batch = jax.jit(
    jax.vmap(_episode, in_axes=(None, None, None, None, None, 0, None)),
    static_argnums=(1, 2, 6),
)


#: window length for traffic-efficiency rates (reference RecorderEnv logs
#: arrival/crash counts per 300-step window, `eval/recoder.py:177-349`)
EFFICIENCY_WINDOW = 300


def episode_result(raw) -> dict:
    """Reduce raw per-step arrays to the reference's episode report columns."""
    done = np.asarray(raw["done"])
    n_done = max(int(done.sum()), 1)
    total = float(raw["total_agents"])

    def done_sum(k):
        return float(np.asarray(raw[k]).sum())

    def done_mean(k):
        return float(np.asarray(raw[k]).sum() / n_done)

    arrive = done_sum("arrive")
    crash = done_sum("crash")
    oor = done_sum("oor")
    # estimated empirical SVO per finished agent (recoder.py:318-343)
    ep_r = np.asarray(raw["ep_reward_at_done"])[done]
    ep_nei = np.asarray(raw["ep_nei_at_done"])[done]
    svo_est = np.degrees(np.arctan2(ep_nei, np.maximum(np.abs(ep_r), 1e-6)))

    valid = np.asarray(raw["valid"])
    vel = np.asarray(raw["velocity"])

    # per-300-step traffic-efficiency rates: event counts per window,
    # averaged over the episode's windows (recoder.py:177-349 equivalent).
    # The scan runs past the horizon so the grace-mode drain is recorded
    # (evaluator._episode); windows cover only the episode's ACTIVE extent,
    # not the empty padding after the field drained.
    active_steps = np.asarray(raw["valid"]).any(axis=-1).reshape(-1)
    T_eff = int(active_steps.nonzero()[0].max()) + 1 if active_steps.any() \
        else done.shape[0]
    win = min(T_eff, EFFICIENCY_WINDOW)
    n_win = max(T_eff // win, 1)
    cut = n_win * win

    def per_window(k):
        # counts per window, rescaled to the nominal window length when the
        # horizon is shorter (tiny test configs)
        ev = np.asarray(raw[k])[:cut].reshape(n_win, win, -1)
        return float(ev.sum(axis=(1, 2)).mean()) * (EFFICIENCY_WINDOW / win)

    return {
        f"arrive_per_{EFFICIENCY_WINDOW}_steps": per_window("arrive"),
        f"crash_per_{EFFICIENCY_WINDOW}_steps": per_window("crash"),
        f"out_per_{EFFICIENCY_WINDOW}_steps": per_window("oor"),
        "success_rate": arrive / max(total, 1.0),
        "crash_rate": crash / max(total, 1.0),
        "out_of_road_rate": oor / max(total, 1.0),
        "max_step_rate": done_sum("max_step") / max(total, 1.0),
        "num_agents_total": total,
        "num_agents_finished": float(done.sum()),
        "episode_reward_mean": done_mean("ep_reward_at_done"),
        "episode_reward_min": float(ep_r.min()) if len(ep_r) else 0.0,
        "episode_reward_max": float(ep_r.max()) if len(ep_r) else 0.0,
        "episode_cost_mean": done_mean("ep_cost_at_done"),
        "episode_length_mean": done_mean("ep_len_at_done"),
        "route_completion_mean": done_mean("rc_at_done"),
        "velocity_mean": float(vel.sum() / max(valid.sum(), 1)),
        "estimated_svo_mean_deg": float(svo_est.mean()) if len(svo_est) else 0.0,
        "estimated_svo_std_deg": float(svo_est.std()) if len(svo_est) else 0.0,
    }


#: default cap on the post-horizon drain scan: the full max_step_per_agent
#: (an agent spawned just before the horizon may live up to its whole
#: per-agent budget after it — MetaDrive's actual bound). The r4 value of
#: 500 cut slow cooperative policies off mid-drive: copo_round left ~12 of
#: 85 agents per episode unfinished (success 0.68 vs 0.83 with the full
#: drain), which the reference protocol would have scored as arrivals.
DEFAULT_DRAIN_STEPS = 1000


def evaluate_policy(scene: SceneData, cfg: EnvConfig, params_or_policy,
                    num_episodes: int = 20, seed: int = 0,
                    env_params: EnvParams | None = None,
                    deterministic: bool = False,
                    drain_steps: int | None = None) -> list[dict]:
    """Evaluate a policy for `num_episodes`; one result row per episode.

    `params_or_policy` is a model params pytree or a (params, obs, key)->act
    callable (params will be None for a self-contained callable).
    """
    if callable(params_or_policy):
        policy_fn, policy_params = params_or_policy, None
    else:
        policy_fn = make_policy_fn(deterministic)
        policy_params = params_or_policy
    env_params = env_params or EnvParams.default(cfg.num_agents)
    if drain_steps is None:
        drain_steps = min(cfg.max_step_per_agent, DEFAULT_DRAIN_STEPS) \
            if cfg.horizon_grace else 0

    keys = jnp.stack([
        jax.random.PRNGKey(seed * 1000 + ep) for ep in range(num_episodes)
    ])
    # dispatch episodes in chunks: the full 20-episode vmap of a 40-agent
    # 2000-step program crashed the remote TPU worker on the heaviest
    # scenes (r5); 5-episode chunks keep the program well inside its
    # envelope at a negligible dispatch cost (results identical — the
    # per-episode keys are unchanged)
    chunk = 5
    rows = []
    for c0 in range(0, num_episodes, chunk):
        kc = keys[c0:c0 + chunk]
        raw_all = jax.device_get(_jit_episode_batch(
            scene, cfg, policy_fn, policy_params, env_params, kc, drain_steps
        ))
        for i in range(kc.shape[0]):
            raw = jax.tree_util.tree_map(lambda a: a[i], raw_all)
            row = episode_result(raw)
            row["episode"] = c0 + i
            rows.append(row)
    return rows


def summarize(rows: list[dict]) -> dict:
    """Mean over episode rows (the reference averages CSV rows per ckpt)."""
    keys = [k for k in rows[0] if k != "episode"]
    return {k: float(np.mean([r[k] for r in rows])) for k in keys}
