"""The multimodal causal LM: modality embeddings spliced into the token
stream at attachment positions.

Capability parity with the reference's ``MultiModalModelForCausalLM``
(``model/model.py:205-671``), re-designed as one jitted XLA graph:

- ``embed_modalities_with_text`` (reference ``model.py:410-446``) becomes a
  functional gather + modality encode + scatter: padded modality slots
  carry out-of-range batch indices and are dropped by the scatter
  (``mode="drop"``), so the batch shape is static and recompile-free;
- staged freezing (``freeze_for_alignment/lm/end2end/unfreeze``,
  ``model.py:310-377``) becomes ``trainable_mask`` — a bool pytree consumed
  by ``optax.masked`` in the trainer;
- truncation policy (``model.py:505-514``) is enforced in the collator
  (host) so device shapes stay static.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from multimeditron_tpu.constants import IGNORE_TOKEN_INDEX
from multimeditron_tpu.modalities import AutoModality  # registers built-ins
from multimeditron_tpu.modalities.base import BaseModalityConfig
from multimeditron_tpu.models.common import cross_entropy_loss
from multimeditron_tpu.models.llama import (
    LlamaConfig,
    embed_tokens,
    init_llama_params,
    llama_forward,
)

Params = Dict[str, Any]


class TrainingMode(str, enum.Enum):
    """Staged SFT modes (reference ``train/trainer.py:16-26``)."""

    ALIGNMENT = "ALIGNMENT"  # projector only
    END2END = "END2END"      # llm + projectors
    LM_ONLY = "LM_ONLY"      # llm only
    FULL = "FULL"            # everything


@dataclasses.dataclass
class MultimodalConfig:
    """Parity with reference ``MultimodalConfig`` (``model/model.py:103-202``)."""

    llm: LlamaConfig
    modalities: List[BaseModalityConfig] = dataclasses.field(default_factory=list)
    vocab_size: Optional[int] = None
    pad_token_idx: int = 0
    eos_token_idx: int = 0
    padding_side: str = "right"
    truncation: bool = False
    max_sequence_length: Optional[int] = None
    llm_path: str = ""
    dtype: str = "bfloat16"

    def to_dict(self) -> dict:
        llm_dtype = getattr(self.llm.dtype, "__name__", str(self.llm.dtype))
        return {
            "model_type": "multimodal",
            "llm": dataclasses.asdict(self.llm) | {"dtype": llm_dtype},
            "modalities": [m.to_dict() for m in self.modalities],
            "vocab_size": self.vocab_size,
            "pad_token_idx": self.pad_token_idx,
            "eos_token_idx": self.eos_token_idx,
            "padding_side": self.padding_side,
            "truncation": self.truncation,
            "max_sequence_length": self.max_sequence_length,
            "llm_path": self.llm_path,
            "dtype": self.dtype,
        }

    @staticmethod
    def from_dict(d: dict) -> "MultimodalConfig":
        import jax.numpy as jnp_

        llm_d = dict(d["llm"])
        dtype = llm_d.pop("dtype", d.get("dtype", "bfloat16"))
        llm = LlamaConfig(**{**llm_d, "dtype": getattr(jnp_, dtype)})
        mods = [AutoModality.config_from_dict(m) for m in d.get("modalities", [])]
        return MultimodalConfig(
            llm=llm,
            modalities=mods,
            vocab_size=d.get("vocab_size"),
            pad_token_idx=d.get("pad_token_idx", 0),
            eos_token_idx=d.get("eos_token_idx", 0),
            padding_side=d.get("padding_side", "right"),
            truncation=d.get("truncation", False),
            max_sequence_length=d.get("max_sequence_length"),
            llm_path=d.get("llm_path", ""),
            dtype=dtype,
        )


class MultimodalModel:
    """Static structure (configs + modality objects) around pure functions."""

    def __init__(self, config: MultimodalConfig):
        self.config = config
        if config.vocab_size is not None and config.vocab_size != config.llm.vocab_size:
            config.llm = dataclasses.replace(config.llm, vocab_size=config.vocab_size)
        self.modalities = {}
        for mc in config.modalities:
            if mc.modality_type in self.modalities:
                raise ValueError(
                    f"Modality type {mc.modality_type!r} registered twice"
                )
            self.modalities[mc.modality_type] = AutoModality.from_config(mc)

    # ------------------------------------------------------------------
    # Params
    # ------------------------------------------------------------------
    def init_params(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, 1 + len(self.modalities))
        return {
            "llm": init_llama_params(keys[0], self.config.llm),
            "modalities": {
                mtype: mod.init_params(k)
                for k, (mtype, mod) in zip(keys[1:], self.modalities.items())
            },
        }

    def bootstrap_params(self, key: jax.Array) -> Params:
        """Pretrained LLM + pretrained towers + random projectors
        (reference ``bootstrap``, ``model.py:643-671``). Falls back to random
        init for components without a local checkpoint."""
        import os

        params = self.init_params(key)
        has_llm_ckpt = (
            self.config.llm_path
            and os.path.isdir(self.config.llm_path)
            and os.path.exists(os.path.join(self.config.llm_path, "config.json"))
            and any(
                f.endswith(".safetensors")
                for f in os.listdir(self.config.llm_path)
            )
        )
        if has_llm_ckpt:
            from multimeditron_tpu.models.hf_import import load_llama

            llm_cfg, llm_params = load_llama(self.config.llm_path)
            if self.config.vocab_size and self.config.vocab_size != llm_cfg.vocab_size:
                llm_params = resize_embeddings(
                    llm_params, llm_cfg, self.config.vocab_size
                )
                llm_cfg = dataclasses.replace(
                    llm_cfg, vocab_size=self.config.vocab_size
                )
            self.config.llm = llm_cfg
            params["llm"] = llm_params
        for mtype, mod in self.modalities.items():
            pretrained = mod.load_pretrained_params()
            if pretrained is not None:
                params["modalities"][mtype] = pretrained
        return params

    # ------------------------------------------------------------------
    # Forward
    # ------------------------------------------------------------------
    def embed(
        self,
        params: Params,
        input_ids: jax.Array,
        mm_inputs: Optional[Dict[str, Dict[str, jax.Array]]] = None,
    ) -> jax.Array:
        """Token embed + per-modality encode + scatter at attachment spans
        (reference ``embed_modalities_with_text``, ``model.py:410-446``).

        ``mm_inputs[mtype]`` holds:
          values:    (N, *value_shape) padded item batch
          batch_idx: (N * num_embeddings,) int32 — row in the batch, or >= B
                     for padded slots (dropped)
          token_pos: (N * num_embeddings,) int32 — position in the sequence
        """
        embeds = embed_tokens(params["llm"], input_ids)
        if not mm_inputs:
            return embeds
        for mtype, pack in mm_inputs.items():
            mod = self.modalities[mtype]
            projected = mod.encode(params["modalities"][mtype], pack["values"])
            flat = projected.reshape(-1, projected.shape[-1]).astype(embeds.dtype)
            embeds = embeds.at[pack["batch_idx"], pack["token_pos"]].set(
                flat, mode="drop"
            )
        return embeds

    def forward(
        self,
        params: Params,
        batch: Dict[str, Any],
        attn_impl: Optional[str] = None,
        remat: bool = False,
        mesh: Optional[Any] = None,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Returns (logits, loss_or_None). ``batch`` comes from the collator.
        ``mesh`` is required only when the LLM runs pipeline-parallel
        (``LlamaConfig.pipeline_parallel > 1``, parallel/pipeline.py)."""
        inputs_embeds = self.embed(
            params, batch["input_ids"], batch.get("mm_inputs")
        )
        logits, _ = llama_forward(
            params["llm"],
            self.config.llm,
            inputs_embeds=inputs_embeds,
            attention_mask=batch.get("attention_mask"),
            position_ids=batch.get("position_ids"),
            attn_impl=attn_impl,
            remat=remat,
            mesh=mesh,
        )
        loss = None
        if batch.get("labels") is not None:
            loss = cross_entropy_loss(logits, batch["labels"], IGNORE_TOKEN_INDEX)
        return logits, loss

    # ------------------------------------------------------------------
    # Freeze modes
    # ------------------------------------------------------------------
    def trainable_mask(self, params: Params, mode: TrainingMode) -> Params:
        mode = TrainingMode(mode)
        train_llm = mode in (TrainingMode.END2END, TrainingMode.LM_ONLY, TrainingMode.FULL)
        train_proj = mode in (TrainingMode.ALIGNMENT, TrainingMode.END2END, TrainingMode.FULL)
        train_embedder = mode == TrainingMode.FULL
        return {
            "llm": jax.tree.map(lambda _: train_llm, params["llm"]),
            "modalities": {
                mtype: self.modalities[mtype].trainable_mask(
                    params["modalities"][mtype], train_embedder, train_proj
                )
                for mtype in params["modalities"]
            },
        }

    def processors(self) -> Dict[str, Any]:
        """Modality-type -> host processor (reference ``model.processors()``)."""
        return {m: mod.make_processor() for m, mod in self.modalities.items()}


def resize_embeddings(
    llm_params: Params, cfg: LlamaConfig, new_vocab: int, key=None
) -> Params:
    """Grow (or shrink) token embeddings / lm_head to ``new_vocab`` rows
    (reference ``resize_token_embeddings`` call, ``model.py:262``). New rows
    are mean-initialized like HF's default."""
    params = dict(llm_params)
    old = params["embed_tokens"]
    V, D = old.shape
    if new_vocab == V:
        return params
    if new_vocab < V:
        params["embed_tokens"] = old[:new_vocab]
        if "lm_head" in params:
            params["lm_head"] = params["lm_head"][:, :new_vocab]
        return params
    mean_row = old.mean(axis=0, keepdims=True)
    extra = jnp.broadcast_to(mean_row, (new_vocab - V, D)).astype(old.dtype)
    params["embed_tokens"] = jnp.concatenate([old, extra], axis=0)
    if "lm_head" in params:
        head = params["lm_head"]
        mean_col = head.mean(axis=1, keepdims=True)
        extra_c = jnp.broadcast_to(mean_col, (D, new_vocab - V)).astype(head.dtype)
        params["lm_head"] = jnp.concatenate([head, extra_c], axis=1)
    return params
