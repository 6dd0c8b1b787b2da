"""Single-CLIP image modality (``meditron_clip``).

Capability parity with the reference's ``ImageModality``
(``model/modalities/image_modality.py``): CLIP/SigLIP vision tower, CLS
dropped, MLP projector into the LLM embedding space, optional 2-D position
ids for the image patch grid.

TPU-first differences: the tower is the functional ViT (patchify-as-matmul
+ flash attention) and the per-image ``encode`` is a pure function fused
into the multimodal forward graph. Tower dimensions live in the config so
models build offline; ``clip_name`` pointing at a local HF checkpoint dir
enables pretrained bootstrap.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimeditron_tpu.constants import (
    MODALITY_VALUE_KEY,
    NUM_EMBEDDINGS_KEY,
    POSITION_IDS_KEY,
)
from multimeditron_tpu.data.image_processing import (
    CLIP_MEAN,
    CLIP_STD,
    SIGLIP_MEAN,
    SIGLIP_STD,
    preprocess_image,
)
from multimeditron_tpu.modalities.base import (
    AutoModality,
    BaseModality,
    BaseModalityConfig,
    BaseModalityProcessor,
)
from multimeditron_tpu.models.projector import (
    init_mlp_projector,
    mlp_projector_forward,
)
from multimeditron_tpu.models.vit import ViTConfig, init_vit_params, vit_forward


@dataclasses.dataclass
class ImageConfig(BaseModalityConfig):
    modality_type: str = "image"
    hidden_size: int = 4096
    clip_name: str = "openai/clip-vit-large-patch14"
    projection_type: str = "mlp"
    use_2d_position_ids: bool = False
    tower: str = "clip"  # "clip" | "siglip"
    # Tower dims (defaults: clip-vit-large-patch14). When ``clip_name`` is a
    # local HF checkpoint dir these are overridden from its config.json.
    image_size: int = 224
    patch_size: int = 14
    vision_hidden_size: int = 1024
    vision_layers: int = 24
    vision_heads: int = 16
    vision_intermediate_size: int = 4096
    param_dtype: str = "bfloat16"
    # Host->device wire format for pixel values. "uint8" ships the
    # resized-cropped 8-bit pixels and fuses /255+normalize into the
    # device graph (bit-identical math, 4x fewer bytes — host upload
    # dominated serving TTFT on relay-attached chips); "float32" keeps
    # the fully host-normalized arrays.
    wire_dtype: str = "float32"

    def vit_config(self) -> ViTConfig:
        import jax.numpy as jnp

        base = (
            ViTConfig.siglip_from_hf_dict if self.tower == "siglip"
            else ViTConfig.clip_from_hf_dict
        )({
            "image_size": self.image_size,
            "patch_size": self.patch_size,
            "hidden_size": self.vision_hidden_size,
            "num_hidden_layers": self.vision_layers,
            "num_attention_heads": self.vision_heads,
            "intermediate_size": self.vision_intermediate_size,
        })
        return dataclasses.replace(base, dtype=getattr(jnp, self.param_dtype))


class ImageProcessor(BaseModalityProcessor):
    """PIL -> normalized NHWC pixels + num_embeddings (+ 2-D position ids),
    matching reference ``ImageProcessor.process`` (``image_modality.py:83-110``)."""

    def __init__(self, config: ImageConfig):
        super().__init__(config)
        self._grid = config.image_size // config.patch_size
        if config.tower == "siglip":
            self._mean, self._std, self._mode = SIGLIP_MEAN, SIGLIP_STD, "squash"
        else:
            self._mean, self._std, self._mode = CLIP_MEAN, CLIP_STD, "shortest_edge"

    @property
    def num_embeddings(self) -> int:
        return self._grid ** 2

    @property
    def value_shape(self) -> tuple:
        s = self.config.image_size
        return (s, s, 3)

    @property
    def value_dtype(self):
        return (np.uint8 if getattr(self.config, "wire_dtype", "float32") == "uint8"
                else np.float32)

    def process(self, modality: Dict[str, Any]) -> Dict[str, Any]:
        out = modality.copy()
        out[MODALITY_VALUE_KEY] = preprocess_image(
            modality[MODALITY_VALUE_KEY],
            self.config.image_size,
            mean=self._mean,
            std=self._std,
            resize_mode=self._mode,
            normalize=self.value_dtype is np.float32,
        )
        out[NUM_EMBEDDINGS_KEY] = self.num_embeddings
        if self.config.use_2d_position_ids:
            g = self._grid
            rows, cols = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
            out[POSITION_IDS_KEY] = np.stack(
                [rows.reshape(-1), cols.reshape(-1)], axis=-1
            ).astype(np.int64)
        return out


@AutoModality.register("meditron_clip")
class ImageModality(BaseModality):
    config_class = ImageConfig
    processor_class = ImageProcessor

    def __init__(self, config: ImageConfig):
        super().__init__(config)
        self.vit_cfg = config.vit_config()

    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        k1, k2 = jax.random.split(key)
        return {
            "embedder": init_vit_params(k1, self.vit_cfg),
            "projector": init_mlp_projector(
                k2,
                self.vit_cfg.hidden_size,
                self.config.hidden_size,
                dtype=self.vit_cfg.dtype,
            ),
        }

    def load_pretrained_params(self, dtype=None) -> Optional[Dict[str, Any]]:
        """Bootstrap: pretrained tower + randomly-initialized projector
        (reference ``bootstrap`` contract, ``model/model.py:643-671``)."""
        path = self.config.clip_name
        if not (os.path.isdir(path) and os.path.exists(os.path.join(path, "config.json"))):
            return None
        from multimeditron_tpu.models.hf_import import load_clip_vision

        vit_cfg, tower = load_clip_vision(path, dtype=dtype or self.vit_cfg.dtype)
        self.vit_cfg = vit_cfg
        proj = init_mlp_projector(
            jax.random.PRNGKey(0),
            vit_cfg.hidden_size,
            self.config.hidden_size,
            dtype=dtype or self.vit_cfg.dtype,
        )
        return {"embedder": tower, "projector": proj}

    def _normalize_wire(self, values: jax.Array) -> jax.Array:
        if values.dtype == jnp.uint8:
            # uint8 wire format: /255 + normalize here so XLA fuses it
            # into the tower's patchify matmul (same f32 math, same
            # order as the host path -> bit-identical activations)
            p = self.processor_class(self.config)
            x = values.astype(jnp.float32) / 255.0
            values = ((x - jnp.asarray(p._mean, jnp.float32))
                      / jnp.asarray(p._std, jnp.float32))
        return values

    def encode(self, params: Dict[str, Any], values: jax.Array) -> jax.Array:
        values = self._normalize_wire(values)
        embedder = params["embedder"]
        if "wqkv_q" in embedder:
            # fused-Pallas W8A8 tower (quantize_params(..., fused=True)):
            # int32 accumulators, quantize epilogues, LN and residuals stay
            # in VMEM (ops/vit_int8_fused.py)
            from multimeditron_tpu.ops.vit_int8_fused import vit_forward_int8_fused

            feats = vit_forward_int8_fused(
                embedder, self.vit_cfg, values, params["act_scales"],
                drop_cls=True,
            )
        elif "q_proj_q" in embedder.get("layers", {}):
            # int8-quantized tower (see quantize_params / models/vit_quant.py)
            from multimeditron_tpu.models.vit_quant import vit_forward_int8

            feats = vit_forward_int8(
                embedder, self.vit_cfg, values, drop_cls=True,
                act_scales=params.get("act_scales"),
            )
        else:
            feats = vit_forward(embedder, self.vit_cfg, values, drop_cls=True)
        return mlp_projector_forward(params["projector"], feats)

    def quantize_params(
        self,
        params: Dict[str, Any],
        calibration_values: Optional[jax.Array] = None,
        fused: bool = False,
    ) -> Dict[str, Any]:
        """W8A8-quantize the tower for inference/serving (optional static
        activation calibration). The returned tree routes ``encode``
        through the int8 path automatically.

        ``fused=True`` packs the fully-fused Pallas layout
        (ops/vit_int8_fused.py) instead — faster, but requires
        ``calibration_values`` (the fused kernels take static per-layer
        activation scales). Also used by the trainer's
        ``quantize_frozen_towers`` option: a frozen tower is pure forward,
        so the serving path is legal during training."""
        if fused:
            from multimeditron_tpu.ops.vit_int8_fused import (
                calibrate_vit_int8_fused,
                pack_vit_int8_fused,
                smooth_vit_params,
            )

            if calibration_values is None:
                raise ValueError(
                    "fused int8 quantization needs calibration_values "
                    "(static per-layer activation scales)"
                )
            calib = self._normalize_wire(jnp.asarray(calibration_values))
            out = dict(params)
            # one compiled call (eager per-op dispatch is ~30-40 ms each
            # through the TPU relay; the calibration pass has thousands).
            # SmoothQuant-style outlier migration first: exact folds that
            # condition the per-tensor static activation scales (real CLIP
            # towers have outlier channels; tests/test_vit_int8_fused.py
            # shows the unsmoothed path losing fidelity on them).
            emb = jax.jit(
                smooth_vit_params, static_argnums=(1,)
            )(params["embedder"], self.vit_cfg, calib)
            out["act_scales"] = jax.jit(
                calibrate_vit_int8_fused, static_argnums=(1,)
            )(emb, self.vit_cfg, calib)
            out["embedder"] = jax.jit(pack_vit_int8_fused)(emb)
            return out

        from multimeditron_tpu.models.vit_quant import (
            calibrate_act_scales,
            quantize_vit_params,
        )

        out = dict(params)
        out["embedder"] = quantize_vit_params(params["embedder"])
        if calibration_values is not None:
            out["act_scales"] = calibrate_act_scales(
                params["embedder"], self.vit_cfg, calibration_values
            )
        return out

    def trainable_mask(
        self, params: Dict[str, Any], train_embedder: bool, train_projector: bool
    ) -> Dict[str, Any]:
        return {
            "embedder": jax.tree.map(lambda _: train_embedder, params["embedder"]),
            "projector": jax.tree.map(lambda _: train_projector, params["projector"]),
        }


@dataclasses.dataclass
class SigLIPImageConfig(ImageConfig):
    """SigLIP tower defaults (BASELINE config #3: SigLIP + Llama SFT)."""

    tower: str = "siglip"
    clip_name: str = "google/siglip-base-patch16-224"
    patch_size: int = 16
    vision_hidden_size: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vision_intermediate_size: int = 3072


@AutoModality.register("meditron_siglip")
class SigLIPImageModality(ImageModality):
    config_class = SigLIPImageConfig
    processor_class = ImageProcessor
