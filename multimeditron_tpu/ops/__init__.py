from multimeditron_tpu.ops.attention import attention, attention_xla
from multimeditron_tpu.ops.flash_attention import flash_attention

__all__ = ["attention", "attention_xla", "flash_attention"]
