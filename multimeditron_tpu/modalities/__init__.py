from multimeditron_tpu.modalities.base import (
    AutoModality,
    BaseModality,
    BaseModalityConfig,
    BaseModalityProcessor,
)

# Import built-in modalities so they self-register.
from multimeditron_tpu.modalities import image_clip as _image_clip  # noqa: F401

__all__ = [
    "AutoModality",
    "BaseModality",
    "BaseModalityConfig",
    "BaseModalityProcessor",
]
