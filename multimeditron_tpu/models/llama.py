"""Functional Llama-architecture decoder (Llama-2/3, Qwen-compatible GQA).

TPU-native replacement for the HF ``AutoModelForCausalLM`` the reference
wraps (``model/model.py:253-262``): parameters are a pytree with layers
STACKED on a leading axis and the forward pass is a single
``lax.scan`` over layers — one XLA graph regardless of depth, friendly to
``jax.checkpoint`` remat policies and GSPMD sharding rules.

Supports:
- grouped-query attention via the Pallas flash kernel;
- RoPE incl. HF llama3 scaling and optional Qwen-style QK-norm;
- splice-ready ``inputs_embeds`` entry (multimodal embedding injection);
- KV cache with per-sample lengths for batched decode;
- 1-D or 2-D position ids (axis-split rotary).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimeditron_tpu.models.common import apply_rope, rms_norm, rope_frequencies
from multimeditron_tpu.ops.attention import attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_layers: int = 16
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: Optional[int] = None
    rope_theta: float = 500000.0
    rope_scaling: Optional[dict] = None
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 8192
    use_qk_norm: bool = False  # Qwen3-style per-head RMSNorm on q/k
    attention_bias: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @staticmethod
    def from_hf_dict(d: dict) -> "LlamaConfig":
        """Build from an HF ``config.json`` dict (llama/qwen3 families)."""
        return LlamaConfig(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=d["num_attention_heads"],
            num_kv_heads=d.get("num_key_value_heads", d["num_attention_heads"]),
            head_dim=d.get("head_dim"),
            rope_theta=d.get("rope_theta", 10000.0),
            rope_scaling=d.get("rope_scaling"),
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            max_position_embeddings=d.get("max_position_embeddings", 8192),
            use_qk_norm=d.get("model_type") == "qwen3",
            attention_bias=d.get("attention_bias", False),
        )


# ----------------------------------------------------------------------
# Init
# ----------------------------------------------------------------------
def init_llama_params(key: jax.Array, cfg: LlamaConfig) -> Params:
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    Dh = cfg.head_dim_
    H, Hkv = cfg.num_heads, cfg.num_kv_heads
    keys = jax.random.split(key, 8)

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / (fan_in ** 0.5)).astype(
            cfg.dtype
        )

    params: Params = {
        "embed_tokens": dense(keys[0], (cfg.vocab_size, D), D),
        "layers": {
            "input_norm": jnp.ones((L, D), cfg.dtype),
            "q_proj": dense(keys[1], (L, D, H * Dh), D),
            "k_proj": dense(keys[2], (L, D, Hkv * Dh), D),
            "v_proj": dense(keys[3], (L, D, Hkv * Dh), D),
            "o_proj": dense(keys[4], (L, H * Dh, D), H * Dh),
            "post_attn_norm": jnp.ones((L, D), cfg.dtype),
            "gate_proj": dense(keys[5], (L, D, F), D),
            "up_proj": dense(keys[6], (L, D, F), D),
            "down_proj": dense(keys[7], (L, F, D), F),
        },
        "final_norm": jnp.ones((D,), cfg.dtype),
    }
    if cfg.use_qk_norm:
        params["layers"]["q_norm"] = jnp.ones((L, Dh), cfg.dtype)
        params["layers"]["k_norm"] = jnp.ones((L, Dh), cfg.dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(jax.random.fold_in(key, 99), (D, cfg.vocab_size), D)
    return params


# ----------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------
def init_kv_cache(
    cfg: LlamaConfig, batch: int, max_len: int, dtype: Any = None
) -> Dict[str, jax.Array]:
    Dh = cfg.head_dim_
    dtype = dtype or cfg.dtype
    return {
        "k": jnp.zeros((cfg.num_layers, batch, cfg.num_kv_heads, max_len, Dh), dtype),
        "v": jnp.zeros((cfg.num_layers, batch, cfg.num_kv_heads, max_len, Dh), dtype),
        "length": jnp.zeros((batch,), jnp.int32),
    }


def init_paged_kv_cache(
    cfg: LlamaConfig,
    num_pages: int,
    page_size: int,
    pages_max: int,
    batch: int,
    dtype: Any = None,
) -> Dict[str, jax.Array]:
    """Paged KV pool + per-slot page tables (serving engine decode path).

    Page 0 is reserved as the TRASH page: never allocated to a slot, it
    absorbs writes for padded positions so scatter shapes stay static.
    """
    Dh = cfg.head_dim_
    dtype = dtype or cfg.dtype
    return {
        "k": jnp.zeros((cfg.num_layers, cfg.num_kv_heads, num_pages, page_size, Dh), dtype),
        "v": jnp.zeros((cfg.num_layers, cfg.num_kv_heads, num_pages, page_size, Dh), dtype),
        "page_table": jnp.zeros((batch, pages_max), jnp.int32),
        "length": jnp.zeros((batch,), jnp.int32),
    }


def _layer(
    carry: Tuple[jax.Array, ...],
    layer_params: Params,
    layer_cache: Optional[Dict[str, jax.Array]],
    cfg: LlamaConfig,
    attn_impl: Optional[str],
    prefill: bool = False,
    page_table: Optional[jax.Array] = None,
    page_size: Optional[int] = None,
) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
    x, position_ids, attention_mask, cache_lengths, inv_freq = carry
    B, S, D = x.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_

    h = rms_norm(x, layer_params["input_norm"], cfg.rms_norm_eps)
    q = (h @ layer_params["q_proj"]).reshape(B, S, H, Dh)
    k = (h @ layer_params["k_proj"]).reshape(B, S, Hkv, Dh)
    v = (h @ layer_params["v_proj"]).reshape(B, S, Hkv, Dh)
    if cfg.use_qk_norm:
        q = rms_norm(q, layer_params["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, layer_params["k_norm"], cfg.rms_norm_eps)
    q = q.transpose(0, 2, 1, 3)  # (B,H,S,Dh)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    q = apply_rope(q, position_ids, inv_freq)
    k = apply_rope(k, position_ids, inv_freq)

    new_cache = None
    if layer_cache is not None and page_table is not None:
        # Paged decode (serving engine): single-token step against a shared
        # page pool. Write this step's K/V into the slot's current page at
        # (length // P, length % P), then attend over the slot's page-table
        # pages via the paged attention kernel (no slab materialization).
        assert S == 1, f"paged decode supports single-token steps, got S={S}"
        from multimeditron_tpu.ops.paged_attention import paged_attention

        cache_k, cache_v = layer_cache["k"], layer_cache["v"]  # (Hkv,np,P,Dh)
        P = page_size
        b_idx = jnp.arange(B)
        page_idx = page_table[b_idx, cache_lengths // P]       # (B,)
        off = cache_lengths % P
        k_new = k[:, :, 0, :].astype(cache_k.dtype)            # (B,Hkv,Dh)
        v_new = v[:, :, 0, :].astype(cache_v.dtype)
        # adjacent advanced indices at axes 1,2 -> result (Hkv, B, Dh)
        cache_k = cache_k.at[:, page_idx, off, :].set(k_new.transpose(1, 0, 2))
        cache_v = cache_v.at[:, page_idx, off, :].set(v_new.transpose(1, 0, 2))
        out = paged_attention(
            q[:, :, 0, :], cache_k, cache_v, page_table, cache_lengths + 1,
            impl=attn_impl,
        )[:, :, None, :]
        new_cache = {"k": cache_k, "v": cache_v}
    elif layer_cache is not None:
        # Write this step's K/V at each sample's current length, then attend
        # over the whole (masked) cache. Decode path: S is 1 (or a small
        # speculative block); cache length advances by S.
        cache_k, cache_v = layer_cache["k"], layer_cache["v"]
        max_len = cache_k.shape[2]
        pos = cache_lengths[:, None] + jnp.arange(S)[None, :]  # (B,S)
        b_idx = jnp.arange(B)[:, None]
        cache_k = cache_k.at[b_idx, :, pos, :].set(
            k.transpose(0, 2, 1, 3).astype(cache_k.dtype)
        )
        cache_v = cache_v.at[b_idx, :, pos, :].set(
            v.transpose(0, 2, 1, 3).astype(cache_v.dtype)
        )
        kv_mask = (
            jnp.arange(max_len)[None, :] < (cache_lengths + S)[:, None]
        ).astype(jnp.int32)
        # Decode (S small, causal irrelevant within the step): plain masked
        # attention over the cache. Prefill-into-cache: causal with the
        # per-sample cache length as offset (0 for fresh slots; chunked
        # prefill continues at the already-written prefix length).
        out = attention(
            q, cache_k, cache_v, kv_mask=kv_mask,
            causal=prefill, causal_offset=cache_lengths if prefill else None,
            impl=attn_impl,
        )
        new_cache = {"k": cache_k, "v": cache_v}
    else:
        kv_mask = attention_mask
        out = attention(q, k, v, kv_mask=kv_mask, causal=True, impl=attn_impl)

    out = out.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)
    x = x + out @ layer_params["o_proj"]

    h = rms_norm(x, layer_params["post_attn_norm"], cfg.rms_norm_eps)
    gate = jax.nn.silu((h @ layer_params["gate_proj"]).astype(jnp.float32))
    up = (h @ layer_params["up_proj"]).astype(jnp.float32)
    x = x + ((gate * up).astype(h.dtype) @ layer_params["down_proj"])
    return x, new_cache


def llama_forward(
    params: Params,
    cfg: LlamaConfig,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    kv_cache: Optional[Dict[str, jax.Array]] = None,
    attn_impl: Optional[str] = None,
    remat: bool = False,
    prefill: bool = False,
    page_size: Optional[int] = None,
) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
    """Run the decoder. Returns (logits, updated_kv_cache_or_None).

    A ``kv_cache`` carrying a ``page_table`` runs the PAGED decode path
    (``page_size`` must then be passed as a STATIC int — it shapes the
    Pallas grid and must not be a traced leaf of the cache pytree)."""
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(params, input_ids)
    x = inputs_embeds
    B, S, _ = x.shape

    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)
    if position_ids is None:
        if kv_cache is not None:
            position_ids = kv_cache["length"][:, None] + jnp.arange(S)[None, :]
        else:
            position_ids = jnp.cumsum(attention_mask, axis=-1) - 1
            position_ids = jnp.where(attention_mask == 0, 0, position_ids)

    inv_freq = rope_frequencies(cfg.head_dim_, cfg.rope_theta, cfg.rope_scaling)
    cache_lengths = kv_cache["length"] if kv_cache is not None else None
    carry_consts = (position_ids, attention_mask, cache_lengths, inv_freq)
    page_table = kv_cache.get("page_table") if kv_cache is not None else None
    if page_table is not None and page_size is None:
        raise ValueError("paged kv_cache requires a static page_size argument")

    def scan_body(x, layer_inputs):
        layer_params, layer_cache = layer_inputs
        x, new_cache = _layer(
            (x, *carry_consts), layer_params, layer_cache, cfg, attn_impl,
            prefill=prefill, page_table=page_table, page_size=page_size,
        )
        return x, new_cache

    body = jax.checkpoint(scan_body) if remat else scan_body

    layer_caches = None
    if kv_cache is not None:
        layer_caches = {"k": kv_cache["k"], "v": kv_cache["v"]}
    x, new_caches = jax.lax.scan(
        body, x, (params["layers"], layer_caches)
    )

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        logits = x @ params["embed_tokens"].T
    else:
        logits = x @ params["lm_head"]

    new_kv_cache = None
    if kv_cache is not None:
        new_kv_cache = {
            "k": new_caches["k"],
            "v": new_caches["v"],
            "length": kv_cache["length"] + S,
        }
        if page_table is not None:
            new_kv_cache["page_table"] = page_table
    return logits, new_kv_cache


def embed_tokens(params: Params, input_ids: jax.Array) -> jax.Array:
    return jnp.take(params["embed_tokens"], input_ids, axis=0)
