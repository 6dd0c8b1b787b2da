"""Weight-only int8 quantization of the Llama decoder (serving).

Per-output-channel symmetric int8 on every projection weight (q/k/v/o,
gate/up/down, lm_head). Activations, norms, rope and the embedding
gather stay bf16 — this is W8A16 in the usual taxonomy, the standard
near-lossless serving quantization (decode is weight-read bound, so
halving weight bytes ≈ halves the per-step floor; see
``ops/wo_matmul.py``). Opt-in via ``EngineConfig.quantize_llm``; the
training path never sees quantized trees.

Reference role: sglang's weight-only quantized serving
(``/root/reference/pyproject.toml`` sglang extra).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from multimeditron_tpu.models.llama import LlamaConfig

Params = Dict[str, Any]

_PROJ_KEYS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
)


def _quantize_stacked(w: jax.Array):
    """(L, K, N) stacked weights -> int8 values + (L, N) f32 scales."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2) / 127.0          # (L, N)
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(
        jnp.round(w / scale[:, None, :]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantize_llama_params(params: Params, cfg: LlamaConfig) -> Params:
    """Return a serving tree: projections as ``{key}_q``/``{key}_s``,
    ``lm_head_q``/``lm_head_s`` (built from the tied embedding when the
    model has no separate head), everything else untouched."""
    lp = params["layers"]
    qlayers = dict(lp)
    for key in _PROJ_KEYS:
        if key not in lp:  # e.g. Apertus' gateless MLP has no gate_proj
            continue
        q, s = _quantize_stacked(lp[key])
        qlayers[key + "_q"] = q
        qlayers[key + "_s"] = s
        del qlayers[key]
    out = dict(params)
    out["layers"] = qlayers

    head = (
        params["embed_tokens"].T if cfg.tie_word_embeddings
        else params["lm_head"]
    )  # (D, V)
    hq, hs = _quantize_stacked(head[None])
    out["lm_head_q"] = hq[0]
    out["lm_head_s"] = hs[0]
    out.pop("lm_head", None)
    return out


def is_quantized(params: Params) -> bool:
    return "q_proj_q" in params.get("layers", {})
