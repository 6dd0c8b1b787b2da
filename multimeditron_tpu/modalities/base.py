"""Modality plugin framework.

Capability parity with the reference's modality layer
(``model/modalities/base.py``): a config class, a host-side processor
(raw value -> fixed-shape arrays + num_embeddings), and the modality
"model". Re-designed functionally for TPU:

- a modality owns no torch modules; it exposes ``init_params`` and a pure
  ``encode(params, values) -> (N, num_embeddings, llm_dim)`` that the
  multimodal forward jits and fuses with the LLM graph;
- freeze modes become parameter-tree masks: ``trainable_mask`` labels each
  subtree "embedder" or "projector" and the trainer turns that into an
  ``optax.masked`` transform (replacing requires_grad flips,
  ``model/model.py:310-377``).

The ``AutoModality`` registry keys the same ``model_type`` strings as the
reference (``meditron_clip``, ``moe_meditron_clip``, ...) so reference YAML
configs load unchanged.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Any, Dict, Optional

import jax
import numpy as np

from multimeditron_tpu.registry import Registry


@dataclasses.dataclass
class BaseModalityConfig:
    model_type: str = ""
    modality_type: str = ""
    hidden_size: int = 4096  # LLM embedding dim (projection target)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "BaseModalityConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


class BaseModalityProcessor(abc.ABC):
    """Host-side: raw modality value -> numpy arrays the device consumes."""

    def __init__(self, config: BaseModalityConfig):
        self.config = config

    @abc.abstractmethod
    def process(self, modality: Dict[str, Any]) -> Dict[str, Any]:
        """Return a copy of ``modality`` with ``value`` as a fixed-shape
        numpy array and ``num_embeddings`` set (reference contract,
        ``model/modalities/base.py:56-67``)."""

    def __call__(self, modality: Dict[str, Any]) -> Dict[str, Any]:
        return self.process(modality)

    @property
    @abc.abstractmethod
    def value_shape(self) -> tuple:
        """Static per-item array shape (used to pad modality batches)."""

    @property
    @abc.abstractmethod
    def num_embeddings(self) -> int:
        """Tokens contributed per item (may be overridden per-sample)."""


class BaseModality(abc.ABC):
    """Device-side: pure encode function + parameter management."""

    config_class: type = BaseModalityConfig
    processor_class: type = None

    def __init__(self, config: BaseModalityConfig):
        self.config = config

    @abc.abstractmethod
    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        ...

    @abc.abstractmethod
    def encode(self, params: Dict[str, Any], values: jax.Array) -> jax.Array:
        """(N, *value_shape) -> (N, num_embeddings, llm_hidden)."""

    @abc.abstractmethod
    def trainable_mask(self, params: Dict[str, Any], train_embedder: bool,
                       train_projector: bool) -> Dict[str, Any]:
        """Bool pytree matching params: True where trainable."""

    def make_processor(self) -> BaseModalityProcessor:
        return type(self).processor_class(self.config)

    @property
    def num_embeddings(self) -> int:
        return self.make_processor().num_embeddings

    def load_pretrained_params(self, dtype=None) -> Optional[Dict[str, Any]]:
        """Load embedder weights from pretrained checkpoints (bootstrap).
        Returns None if unavailable; caller falls back to init_params."""
        return None


class _ModalityRegistry(Registry):
    def config_from_dict(self, d: dict) -> BaseModalityConfig:
        if "model_type" not in d:
            raise ValueError("Modality config dict must contain 'model_type'")
        cls = self.get(d["model_type"])
        cfg = cls.config_class.from_dict(d)
        cfg.model_type = d["model_type"]
        return cfg

    def from_config(self, cfg: BaseModalityConfig) -> BaseModality:
        return self.get(cfg.model_type)(cfg)


AutoModality = _ModalityRegistry("modality", BaseModality)
