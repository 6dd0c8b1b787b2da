from multimeditron_tpu.modalities.base import (
    AutoModality,
    BaseModality,
    BaseModalityConfig,
    BaseModalityProcessor,
)

# Import built-in modalities so they self-register.
from multimeditron_tpu.modalities import image_clip as _image_clip  # noqa: F401
from multimeditron_tpu.modalities import image_moe as _image_moe  # noqa: F401
from multimeditron_tpu.modalities import image_biomed as _image_biomed  # noqa: F401
from multimeditron_tpu.modalities import audio_whisper as _audio_whisper  # noqa: F401

__all__ = [
    "AutoModality",
    "BaseModality",
    "BaseModalityConfig",
    "BaseModalityProcessor",
]
