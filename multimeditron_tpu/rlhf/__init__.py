from multimeditron_tpu.rlhf.dapo import DAPOConfig, DAPOTrainer
from multimeditron_tpu.rlhf.grpo import GRPOConfig, GRPOTrainer
from multimeditron_tpu.rlhf.ppo import PPOConfig, PPOTrainer
from multimeditron_tpu.rlhf.rewards import AutoRewardManager, compute_score

__all__ = [
    "GRPOConfig", "GRPOTrainer", "PPOConfig", "PPOTrainer",
    "DAPOConfig", "DAPOTrainer",
    "AutoRewardManager", "compute_score",
]
