"""Shared CLI plumbing: config loading with dotted overrides, tokenizer and
model construction from the reference's YAML schema
(``docs/source/guides/configuration.rst``)."""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional, Tuple

import yaml

logger = logging.getLogger(__name__)


def load_config(path: str, overrides: Optional[List[str]] = None) -> Dict[str, Any]:
    """YAML + Hydra-style dotted CLI overrides (``a.b.c=value``)."""
    with open(path) as f:
        cfg = yaml.safe_load(f)
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"Override {ov!r} must be key.path=value")
        key, value = ov.split("=", 1)
        value = yaml.safe_load(value)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return cfg


def build_tokenizer(config: Dict[str, Any]):
    """HF tokenizer + chat-template special tokens + attachment token
    (reference ``cli/train.py:94-104``)."""
    from transformers import AutoTokenizer

    from multimeditron_tpu.data.chat_template import ChatTemplate
    from multimeditron_tpu.data.tokenizer import HFTokenizer

    chat_template = ChatTemplate.from_name(config["tokenizer_type"])
    hf_tok = AutoTokenizer.from_pretrained(
        config["base_llm"], padding_side="right", use_fast=True
    )
    hf_tok.pad_token = hf_tok.eos_token
    special = list(chat_template.special_tokens.values())
    special.append(config["attachment_token"])
    hf_tok.add_special_tokens({"additional_special_tokens": special})
    return HFTokenizer(hf_tok), chat_template


def build_model(config: Dict[str, Any], vocab_size: Optional[int] = None,
                eos_token_idx: int = 0):
    """MultimodalModel from the train-config schema."""
    import jax.numpy as jnp

    from multimeditron_tpu.modalities import AutoModality
    from multimeditron_tpu.models.llama import LlamaConfig
    from multimeditron_tpu.models.multimodal import MultimodalConfig, MultimodalModel

    base_llm = config.get("base_llm", "")
    if "llm" in config:
        llm_d = dict(config["llm"])
        dtype = getattr(jnp, llm_d.pop("dtype", "bfloat16"))
        llm_cfg = LlamaConfig(**llm_d, dtype=dtype)
    elif os.path.isdir(base_llm):
        from multimeditron_tpu.models.hf_import import load_hf_config

        llm_cfg = LlamaConfig.from_hf_dict(load_hf_config(base_llm))
    else:
        raise ValueError(
            "Config needs either a local HF checkpoint dir in 'base_llm' or "
            "an inline 'llm' config block (offline environments cannot fetch "
            f"{base_llm!r} from the Hub)"
        )

    modality_cfgs = []
    for m in config.get("modalities", []):
        m = dict(m)
        m.setdefault("hidden_size", config.get("token_size", llm_cfg.hidden_size))
        modality_cfgs.append(AutoModality.config_from_dict(m))

    mm_cfg = MultimodalConfig(
        llm=llm_cfg,
        modalities=modality_cfgs,
        vocab_size=vocab_size,
        eos_token_idx=eos_token_idx,
        truncation=config.get("truncation", False),
        max_sequence_length=config.get("max_sequence_length"),
        llm_path=base_llm,
    )
    return MultimodalModel(mm_cfg)


def build_loaders(config: Dict[str, Any]) -> Dict[str, Any]:
    """Modality loaders from config (reference ``cli/train.py:113-118``)."""
    from multimeditron_tpu.data.loaders import AutoModalityLoader

    loaders = {}
    for loader in config.get("loaders", []):
        loader = dict(loader)
        loader_type = loader.pop("loader_type")
        modality_type = loader.pop("modality_type")
        loaders[modality_type] = AutoModalityLoader.create(loader_type, **loader)
    return loaders


def build_collator(config: Dict[str, Any], model, tokenizer, chat_template,
                   add_generation_prompt: bool = False):
    from multimeditron_tpu.data.collator import DataCollatorForMultimodal

    ccfg = config.get("collator", {})
    return DataCollatorForMultimodal(
        tokenizer=tokenizer,
        modality_processors=model.processors(),
        modality_loaders=build_loaders(config),
        attachment_token=config["attachment_token"],
        chat_template=chat_template,
        add_generation_prompt=add_generation_prompt,
        use_2d_position_ids=ccfg.get("use_2d_position_ids", False),
        pad_to_multiple=ccfg.get("pad_to_multiple", 128),
        fixed_seq_len=ccfg.get("fixed_seq_len"),
        truncation=config.get("truncation", False),
        max_sequence_length=config.get("max_sequence_length"),
        modality_budgets=ccfg.get("modality_budgets"),
    )


def engine_config_from_cfg(config: Dict[str, Any], **overrides):
    """EngineConfig from the YAML ``serve:`` section.

    Every ``EngineConfig`` field may appear under ``serve:`` (e.g.
    ``quantize_llm: true``, ``kv_mode: paged``, ``decode_chunk: 16``,
    ``top_p: 0.95``); explicit keyword overrides (CLI flags) win.
    ``max_seq_len`` falls back to the top-level ``max_sequence_length``.
    Unknown ``serve:`` keys raise, so typos don't silently no-op."""
    import dataclasses

    from multimeditron_tpu.serve.engine import EngineConfig

    fields = {f.name for f in dataclasses.fields(EngineConfig)}
    serve = dict(config.get("serve", {}))
    unknown = set(serve) - fields
    if unknown:
        raise ValueError(
            f"Unknown serve: config keys {sorted(unknown)}; "
            f"valid keys: {sorted(fields)}"
        )
    kwargs: Dict[str, Any] = {}
    if config.get("max_sequence_length"):
        kwargs["max_seq_len"] = config["max_sequence_length"]
    kwargs.update(serve)
    kwargs.update({k: v for k, v in overrides.items() if v is not None})
    if "prefill_buckets" in kwargs:
        kwargs["prefill_buckets"] = tuple(kwargs["prefill_buckets"])
    return EngineConfig(**kwargs)
