from copo_tpu.runtime.trainer import IPPOTrainer, TrainerConfig

__all__ = ["IPPOTrainer", "TrainerConfig"]
