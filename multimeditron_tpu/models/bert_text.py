"""Functional BERT text encoder (PubMedBERT-compatible).

Text tower for the BiomedCLIP fine-tuning workflow: the reference's
``scripts/biomed_train.py`` contrastively fine-tunes
``microsoft/BiomedCLIP-PubMedBERT_256-vit_base_patch16_224`` — a timm
ViT-B/16 vision tower (``modalities/image_biomed.py`` here) paired with a
PubMedBERT text tower pooled at CLS and linearly projected into the shared
embedding space. This module provides that text tower with HF
``BertModel`` numerics (post-LN residuals, learned absolute positions,
token-type embeddings, exact GELU, tanh pooler), layers stacked on a
leading axis and scanned — same decoder conventions as ``clip_text.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimeditron_tpu.models.common import gelu, layer_norm
from multimeditron_tpu.ops.attention import attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class BertTextConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_dict(d: dict) -> "BertTextConfig":
        return BertTextConfig(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=d["num_attention_heads"],
            intermediate_size=d["intermediate_size"],
            max_positions=d.get("max_position_embeddings", 512),
            type_vocab_size=d.get("type_vocab_size", 2),
            layer_norm_eps=d.get("layer_norm_eps", 1e-12),
        )


def init_bert_text_params(key: jax.Array, cfg: BertTextConfig) -> Params:
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    ks = iter(jax.random.split(key, 10))

    def dense(k, shape, fan_in):
        return (
            jax.random.normal(k, shape, jnp.float32) / fan_in ** 0.5
        ).astype(cfg.dtype)

    return {
        "word_embeddings": dense(next(ks), (cfg.vocab_size, D), D),
        "position_embeddings": dense(next(ks), (cfg.max_positions, D), D),
        "token_type_embeddings": dense(next(ks), (cfg.type_vocab_size, D), D),
        "embed_ln_w": jnp.ones((D,), cfg.dtype),
        "embed_ln_b": jnp.zeros((D,), cfg.dtype),
        "layers": {
            "q_proj": dense(next(ks), (L, D, D), D),
            "q_bias": jnp.zeros((L, D), cfg.dtype),
            "k_proj": dense(next(ks), (L, D, D), D),
            "k_bias": jnp.zeros((L, D), cfg.dtype),
            "v_proj": dense(next(ks), (L, D, D), D),
            "v_bias": jnp.zeros((L, D), cfg.dtype),
            "o_proj": dense(next(ks), (L, D, D), D),
            "o_bias": jnp.zeros((L, D), cfg.dtype),
            "attn_ln_w": jnp.ones((L, D), cfg.dtype),
            "attn_ln_b": jnp.zeros((L, D), cfg.dtype),
            "fc1": dense(next(ks), (L, D, F), D),
            "fc1_bias": jnp.zeros((L, F), cfg.dtype),
            "fc2": dense(next(ks), (L, F, D), F),
            "fc2_bias": jnp.zeros((L, D), cfg.dtype),
            "out_ln_w": jnp.ones((L, D), cfg.dtype),
            "out_ln_b": jnp.zeros((L, D), cfg.dtype),
        },
        "pooler_w": dense(next(ks), (D, D), D),
        "pooler_b": jnp.zeros((D,), cfg.dtype),
    }


def bert_text_forward(
    params: Params,
    cfg: BertTextConfig,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    token_type_ids: Optional[jax.Array] = None,
    attn_impl=None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (last_hidden (B,S,D), pooled (B,D)).

    ``pooled`` is the tanh pooler over the CLS (position-0) hidden state —
    HF ``BertModel`` semantics; BiomedCLIP's open_clip wrapper pools CLS
    from the last hidden state, which callers get as ``last_hidden[:, 0]``.
    """
    B, S = input_ids.shape
    D, Hn = cfg.hidden_size, cfg.num_heads
    Dh = D // Hn

    x = jnp.take(params["word_embeddings"], input_ids, axis=0)
    x = x + params["position_embeddings"][:S]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    x = x + jnp.take(params["token_type_embeddings"], token_type_ids, axis=0)
    x = layer_norm(x, params["embed_ln_w"], params["embed_ln_b"],
                   cfg.layer_norm_eps)

    kv_mask = attention_mask

    def layer(x, lp):
        q = (x @ lp["q_proj"] + lp["q_bias"]).reshape(B, S, Hn, Dh)
        k = (x @ lp["k_proj"] + lp["k_bias"]).reshape(B, S, Hn, Dh)
        v = (x @ lp["v_proj"] + lp["v_bias"]).reshape(B, S, Hn, Dh)
        o = attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), kv_mask=kv_mask, causal=False,
            impl=attn_impl,
        )
        o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
        # post-LN: LayerNorm AFTER each residual add (BERT convention)
        x = layer_norm(
            x + (o @ lp["o_proj"] + lp["o_bias"]),
            lp["attn_ln_w"], lp["attn_ln_b"], cfg.layer_norm_eps,
        )
        h = gelu(x @ lp["fc1"] + lp["fc1_bias"])
        x = layer_norm(
            x + (h @ lp["fc2"] + lp["fc2_bias"]),
            lp["out_ln_w"], lp["out_ln_b"], cfg.layer_norm_eps,
        )
        return x, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    pooled = jnp.tanh(x[:, 0] @ params["pooler_w"] + params["pooler_b"])
    return x, pooled


# ----------------------------------------------------------------------
# HF import
# ----------------------------------------------------------------------
def bert_text_params_from_state_dict(
    state, cfg: BertTextConfig, prefix: str = "", dtype=None
) -> Params:
    """Map an HF ``BertModel`` state dict to our pytree."""
    from multimeditron_tpu.models.hf_import import _np

    dtype = dtype or cfg.dtype
    g = lambda k: _np(state[prefix + k])
    t = lambda w: np.ascontiguousarray(w.T)
    ident = lambda w: w
    L = cfg.num_layers

    def stack(fmt, transform):
        return jnp.asarray(
            np.stack([transform(g(fmt.format(i))) for i in range(L)]),
            dtype=dtype,
        )

    return {
        "word_embeddings": jnp.asarray(
            g("embeddings.word_embeddings.weight"), dtype=dtype),
        "position_embeddings": jnp.asarray(
            g("embeddings.position_embeddings.weight"), dtype=dtype),
        "token_type_embeddings": jnp.asarray(
            g("embeddings.token_type_embeddings.weight"), dtype=dtype),
        "embed_ln_w": jnp.asarray(g("embeddings.LayerNorm.weight"), dtype=dtype),
        "embed_ln_b": jnp.asarray(g("embeddings.LayerNorm.bias"), dtype=dtype),
        "layers": {
            "q_proj": stack("encoder.layer.{}.attention.self.query.weight", t),
            "q_bias": stack("encoder.layer.{}.attention.self.query.bias", ident),
            "k_proj": stack("encoder.layer.{}.attention.self.key.weight", t),
            "k_bias": stack("encoder.layer.{}.attention.self.key.bias", ident),
            "v_proj": stack("encoder.layer.{}.attention.self.value.weight", t),
            "v_bias": stack("encoder.layer.{}.attention.self.value.bias", ident),
            "o_proj": stack("encoder.layer.{}.attention.output.dense.weight", t),
            "o_bias": stack("encoder.layer.{}.attention.output.dense.bias", ident),
            "attn_ln_w": stack(
                "encoder.layer.{}.attention.output.LayerNorm.weight", ident),
            "attn_ln_b": stack(
                "encoder.layer.{}.attention.output.LayerNorm.bias", ident),
            "fc1": stack("encoder.layer.{}.intermediate.dense.weight", t),
            "fc1_bias": stack("encoder.layer.{}.intermediate.dense.bias", ident),
            "fc2": stack("encoder.layer.{}.output.dense.weight", t),
            "fc2_bias": stack("encoder.layer.{}.output.dense.bias", ident),
            "out_ln_w": stack("encoder.layer.{}.output.LayerNorm.weight", ident),
            "out_ln_b": stack("encoder.layer.{}.output.LayerNorm.bias", ident),
        },
        "pooler_w": jnp.asarray(t(g("pooler.dense.weight")), dtype=dtype),
        "pooler_b": jnp.asarray(g("pooler.dense.bias"), dtype=dtype),
    }
