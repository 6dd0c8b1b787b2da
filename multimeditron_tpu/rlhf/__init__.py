from multimeditron_tpu.rlhf.grpo import GRPOConfig, GRPOTrainer
from multimeditron_tpu.rlhf.rewards import AutoRewardManager, compute_score

__all__ = ["GRPOConfig", "GRPOTrainer", "AutoRewardManager", "compute_score"]
