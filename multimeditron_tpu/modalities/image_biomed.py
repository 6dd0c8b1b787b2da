"""BiomedCLIP-style image modality (``meditron_biomedclip``).

Parity with the reference's ``BioMedCLIPImageModality``
(``image_modality_biomed.py``): an OpenCLIP/timm-style ViT tower (CLS
token, biased patch embedding, no pre-layernorm, exact GELU, final norm
applied to the intermediates since the reference calls
``forward_intermediates(normalize_intermediates=True)``), patch tokens
into the shared MLP projector.
"""

from __future__ import annotations

import dataclasses

from multimeditron_tpu.modalities.base import AutoModality
from multimeditron_tpu.modalities.image_clip import ImageConfig, ImageModality, ImageProcessor
from multimeditron_tpu.models.vit import ViTConfig


@dataclasses.dataclass
class BioMedCLIPImageConfig(ImageConfig):
    tower: str = "biomed"
    trust_remote_code: bool = True
    # BiomedCLIP default tower: ViT-B/16 @ 224
    patch_size: int = 16
    vision_hidden_size: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vision_intermediate_size: int = 3072

    def vit_config(self) -> ViTConfig:
        import jax.numpy as jnp

        return ViTConfig(
            image_size=self.image_size,
            patch_size=self.patch_size,
            hidden_size=self.vision_hidden_size,
            num_layers=self.vision_layers,
            num_heads=self.vision_heads,
            intermediate_size=self.vision_intermediate_size,
            layer_norm_eps=1e-6,
            hidden_act="gelu",
            use_cls_token=True,
            use_pre_layernorm=False,
            post_layernorm_output=True,
            patch_bias=True,
            dtype=getattr(jnp, self.param_dtype),
        )


class BioMedCLIPImageProcessor(ImageProcessor):
    pass  # OpenCLIP transform == CLIP shortest-edge + crop + CLIP mean/std


@AutoModality.register("meditron_biomedclip")
class BioMedCLIPImageModality(ImageModality):
    config_class = BioMedCLIPImageConfig
    processor_class = BioMedCLIPImageProcessor
