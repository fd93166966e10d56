"""PPO loss with the reference's exact semantics, as one pure function.

Parity (SURVEY.md §2.3 items 7, 16): clip surrogate on pre-normalized
advantages, old-RLlib-style clipped value loss
`max((v-t)^2, (v_prev+clip(v-v_prev, +-c) - t)^2)` with c = vf_clip_param
(`torch_copo/algo_copo.py:358-367`, `algo_ippo.py:138-150`), entropy bonus,
and KL penalty with the dynamic coefficient update (RLlib `update_kl`:
coeff *= 1.5 if kl > 2*target, *= 0.5 if kl < target/2).

All reductions are valid-masked means (slot-based batches carry empty
transitions; the reference instead relies on RLlib's per-trajectory slicing).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from copo_tpu.models.mlp import DiagGaussian, policy_logits, value_head


@dataclasses.dataclass(frozen=True)
class PPOLossConfig:
    clip_param: float = 0.2
    vf_clip_param: float = 100.0
    vf_loss_coeff: float = 1.0
    entropy_coeff: float = 0.0
    kl_target: float = 0.01
    use_kl: bool = True
    old_value_loss: bool = True     # reference IPPOConfig.old_value_loss=True


def masked_mean(x, mask):
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def clipped_value_loss(cfg: PPOLossConfig, current_vf, prev_vf, target):
    """Old-style (True) or squared-clamped (False) value loss per reference."""
    if cfg.old_value_loss:
        vf_loss1 = jnp.square(current_vf - target)
        vf_clipped = prev_vf + jnp.clip(
            current_vf - prev_vf, -cfg.vf_clip_param, cfg.vf_clip_param
        )
        vf_loss2 = jnp.square(vf_clipped - target)
        return jnp.maximum(vf_loss1, vf_loss2)
    return jnp.clip(jnp.square(current_vf - target), 0.0, cfg.vf_clip_param)


def ppo_loss(params, batch, cfg: PPOLossConfig, kl_coeff, *, value_heads=("vf",)):
    """Total PPO loss over a flat minibatch dict.

    batch keys: obs, cc_obs, actions, logp_old, action_dist_old (mean/log_std),
    normalized_advantages, value_targets/vf_preds (per head: `<head>_target`,
    `<head>_pred`), valid.
    Returns (loss, stats_dict).
    """
    mask = batch["valid"].astype(jnp.float32)
    mean, log_std = policy_logits(params, batch["obs"])
    logp = DiagGaussian.logp(mean, log_std, batch["actions"])
    ratio = jnp.exp(logp - batch["logp_old"])

    adv = batch["normalized_advantages"]
    surrogate = jnp.minimum(
        adv * ratio,
        adv * jnp.clip(ratio, 1.0 - cfg.clip_param, 1.0 + cfg.clip_param),
    )
    policy_loss = -masked_mean(surrogate, mask)

    entropy = DiagGaussian.entropy(log_std)
    mean_entropy = masked_mean(entropy, mask)

    old_mean, old_log_std = batch["dist_mean_old"], batch["dist_log_std_old"]
    kl = DiagGaussian.kl(old_mean, old_log_std, mean, log_std)
    mean_kl = masked_mean(kl, mask)

    total = policy_loss - cfg.entropy_coeff * mean_entropy
    if cfg.use_kl:
        total = total + kl_coeff * mean_kl

    stats = {
        "policy_loss": policy_loss,
        "entropy": mean_entropy,
        "kl": mean_kl,
        "ratio_mean": masked_mean(ratio, mask),
    }
    for head in value_heads:
        vf = value_head(params, head, batch["cc_obs"])
        vf_loss = clipped_value_loss(
            cfg, vf, batch[f"{head}_pred"], batch[f"{head}_target"]
        )
        mean_vf_loss = masked_mean(vf_loss, mask)
        total = total + cfg.vf_loss_coeff * mean_vf_loss
        stats[f"{head}_loss"] = mean_vf_loss
    stats["total_loss"] = total
    return total, stats


def update_kl_coeff(kl_coeff, kl, target):
    """RLlib dynamic KL coefficient schedule (branchless for jit)."""
    up = kl > 2.0 * target
    down = kl < 0.5 * target
    return jnp.where(up, kl_coeff * 1.5, jnp.where(down, kl_coeff * 0.5, kl_coeff))
