from copo_tpu.eval.npz import export_policy_npz, load_policy_npz
from copo_tpu.eval.evaluator import evaluate_policy

__all__ = ["export_policy_npz", "load_policy_npz", "evaluate_policy"]
