"""Curriculum learning (CL): agent-count schedule over training.

Parity: `algo_ippo/ippo_cl.py:19-78` (SURVEY.md §2.1 item 7) — IPPO plus a
callback that bumps env `num_agents` from 1/4 -> 1/2 -> 3/4 -> full of the
target at 25/50/75% of total steps. The reference must close and rebuild
every MetaDrive env to change the count; here the env respawns only while
`active < EnvParams.target_num_agents`, so the schedule is one scalar write
between iterations — no rebuild, no recompile.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.scene import SceneData
from copo_tpu.runtime.trainer import IPPOTrainer, TrainerConfig


@dataclasses.dataclass(frozen=True)
class CLConfig(TrainerConfig):
    total_iters: int = 1000        # schedule horizon (reference: 2M steps)


def curriculum_num_agents(progress: float, full_n: int) -> int:
    """Reference schedule (`ippo_cl.py:40-60`): quarters of the target."""
    if progress < 0.25:
        frac = 0.25
    elif progress < 0.5:
        frac = 0.5
    elif progress < 0.75:
        frac = 0.75
    else:
        frac = 1.0
    return max(int(round(full_n * frac)), 1)


class IPPOCLTrainer(IPPOTrainer):
    """IPPO + curriculum over the active agent count."""

    def __init__(self, scene: SceneData, env_cfg: EnvConfig, cfg: CLConfig):
        super().__init__(scene, env_cfg, cfg)
        self._full_n = env_cfg.num_agents

    def apply_curriculum(self, state, iteration: int):
        """Set target_num_agents for the given iteration (host-side)."""
        n = curriculum_num_agents(iteration / max(self.cfg.total_iters, 1),
                                  self._full_n)
        return state.replace(
            env_params=state.env_params.replace(target_num_agents=jnp.int32(n))
        ), n

    def init_state(self, key=None):
        state = super().init_state(key)
        state, _ = self.apply_curriculum(state, 0)
        return state

    def train(self, state, num_iters: int, log_fn=None):
        for _ in range(num_iters):
            state, _ = self.apply_curriculum(state, int(state.iteration))
            state, metrics = self.train_iter(state)
            if log_fn is not None:
                log_fn(state, metrics)
        return state, metrics
