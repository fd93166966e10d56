from copo_tpu.models.mlp import (
    DiagGaussian,
    init_model,
    mlp_forward,
    policy_logits,
    value_head,
)

__all__ = ["DiagGaussian", "init_model", "mlp_forward", "policy_logits", "value_head"]
