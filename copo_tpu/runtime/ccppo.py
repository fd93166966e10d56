"""CCPPO trainer: PPO with a centralized critic over fused neighbour obs.

Parity: `torch_copo/algo_ccppo.py` (CCPPOConfig/CCModel/CCPPOPolicy/Trainer,
SURVEY.md §2.1 item 17). The critic consumes cc-obs built by
`algos/ccppo.make_cc_obs_fn` inside the rollout; policy input stays ego obs.
"""

from __future__ import annotations

import dataclasses

from copo_tpu.algos.ccppo import FusionConfig, cc_obs_dim, make_cc_obs_fn
from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.scene import SceneData
from copo_tpu.runtime.trainer import IPPOTrainer, TrainerConfig


@dataclasses.dataclass(frozen=True)
class CCPPOConfig(TrainerConfig):
    fusion: FusionConfig = FusionConfig()   # fuse_mode mf, K=4, 10 m, counterfactual


class CCPPOTrainer(IPPOTrainer):
    """PPO + centralized critic (fuse_mode concat | mf | none)."""

    def __init__(self, scene: SceneData, env_cfg: EnvConfig, cfg: CCPPOConfig):
        self.fusion = cfg.fusion
        super().__init__(scene, env_cfg, cfg)

    def cc_obs_fn(self):
        return make_cc_obs_fn(self.fusion, self.env_cfg.neighbours_distance)

    def model_kwargs(self):
        return {
            "num_value_heads": 1,
            "cc_obs_dim": cc_obs_dim(
                self.env_cfg.obs_dim, self.env_cfg.action_dim, self.fusion
            ),
        }
