from multimeditron_tpu.train.trainer import MultimodalTrainer, TrainerConfig

__all__ = ["MultimodalTrainer", "TrainerConfig"]
