from copo_tpu.algos.gae import masked_gae
from copo_tpu.algos.ppo import ppo_loss, PPOLossConfig

__all__ = ["masked_gae", "ppo_loss", "PPOLossConfig"]
