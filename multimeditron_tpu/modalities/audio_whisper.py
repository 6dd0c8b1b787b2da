"""Whisper audio modality (``whisper_audio``).

Extends the modality plugin set beyond the reference's image family to
mixed audio/image conversations (BASELINE.json config #4). The processor
computes log-mel features on host; the encoder tower runs on device and an
optional average-pool ``downsample`` shrinks the 1500 encoder frames to a
budget-friendly token count before projection.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimeditron_tpu.constants import MODALITY_VALUE_KEY, NUM_EMBEDDINGS_KEY
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
from multimeditron_tpu.models.whisper import (
    WhisperConfig,
    init_whisper_encoder,
    log_mel_spectrogram,
    whisper_encode,
)


@dataclasses.dataclass
class WhisperAudioConfig(BaseModalityConfig):
    modality_type: str = "audio"
    hidden_size: int = 4096
    whisper_name: str = "openai/whisper-tiny"
    downsample: int = 5  # 1500 frames -> 300 attachment tokens
    num_mel_bins: int = 80
    audio_hidden_size: int = 384
    audio_layers: int = 4
    audio_heads: int = 6
    audio_intermediate_size: int = 1536
    param_dtype: str = "bfloat16"

    def whisper_config(self) -> WhisperConfig:
        return WhisperConfig(
            num_mel_bins=self.num_mel_bins,
            hidden_size=self.audio_hidden_size,
            num_layers=self.audio_layers,
            num_heads=self.audio_heads,
            intermediate_size=self.audio_intermediate_size,
            dtype=getattr(jnp, self.param_dtype),
        )


class WhisperAudioProcessor(BaseModalityProcessor):
    """Raw 16 kHz audio (array / {array, sampling_rate}) -> log-mel."""

    FRAMES = 3000

    def __init__(self, config: WhisperAudioConfig):
        super().__init__(config)

    @property
    def num_embeddings(self) -> int:
        return (self.FRAMES // 2) // self.config.downsample

    @property
    def value_shape(self) -> tuple:
        return (self.config.num_mel_bins, self.FRAMES)

    def process(self, modality: Dict[str, Any]) -> Dict[str, Any]:
        out = modality.copy()
        value = modality[MODALITY_VALUE_KEY]
        if isinstance(value, dict):
            value = value.get("array", value)
        audio = np.asarray(value, np.float32)
        out[MODALITY_VALUE_KEY] = log_mel_spectrogram(
            audio, n_mels=self.config.num_mel_bins, target_frames=self.FRAMES
        )
        out[NUM_EMBEDDINGS_KEY] = self.num_embeddings
        return out


@AutoModality.register("whisper_audio")
class WhisperAudioModality(BaseModality):
    config_class = WhisperAudioConfig
    processor_class = WhisperAudioProcessor

    def __init__(self, config: WhisperAudioConfig):
        super().__init__(config)
        self.whisper_cfg = config.whisper_config()

    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        k1, k2 = jax.random.split(key)
        return {
            "embedder": init_whisper_encoder(k1, self.whisper_cfg),
            "projector": init_mlp_projector(
                k2, self.whisper_cfg.hidden_size, self.config.hidden_size,
                dtype=self.whisper_cfg.dtype,
            ),
        }

    def load_pretrained_params(self, dtype=None) -> Optional[Dict[str, Any]]:
        import os

        path = self.config.whisper_name
        if not (os.path.isdir(path) and os.path.exists(os.path.join(path, "config.json"))):
            return None
        from multimeditron_tpu.models.hf_import import load_hf_config, load_hf_state_dict
        from multimeditron_tpu.models.whisper import whisper_params_from_state_dict

        hf_cfg = load_hf_config(path)
        self.whisper_cfg = dataclasses.replace(
            WhisperConfig.from_hf_dict(hf_cfg), dtype=self.whisper_cfg.dtype
        )
        state = load_hf_state_dict(path)
        prefix = (
            "model.encoder." if any(k.startswith("model.encoder.") for k in state)
            else "encoder."
        )
        tower = whisper_params_from_state_dict(state, self.whisper_cfg, prefix=prefix)
        proj = init_mlp_projector(
            jax.random.PRNGKey(0), self.whisper_cfg.hidden_size,
            self.config.hidden_size, dtype=self.whisper_cfg.dtype,
        )
        return {"embedder": tower, "projector": proj}

    def encode(self, params: Dict[str, Any], values: jax.Array) -> jax.Array:
        feats = whisper_encode(params["embedder"], self.whisper_cfg, values)
        ds = self.config.downsample
        if ds > 1:
            N, S, D = feats.shape
            feats = feats[:, : (S // ds) * ds].reshape(N, S // ds, ds, D).mean(axis=2)
        return mlp_projector_forward(params["projector"], feats)

    def trainable_mask(self, params, train_embedder: bool, train_projector: bool):
        return {
            "embedder": jax.tree.map(lambda _: train_embedder, params["embedder"]),
            "projector": jax.tree.map(lambda _: train_projector, params["projector"]),
        }
