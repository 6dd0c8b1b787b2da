"""Functional multi-head cross attention (queries over concatenated expert
contexts) — parity with the reference ``CrossAttention``
(``model/attention.py:5-101``): separate q/k/v/out projections, bool or
additive masks, optional dropout on attention weights and output.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def init_cross_attention(
    key: jax.Array, dim: int, qkv_bias: bool = True, dtype=jnp.float32
) -> Params:
    ks = jax.random.split(key, 4)

    def dense(k):
        return (jax.random.normal(k, (dim, dim), jnp.float32) * dim ** -0.5).astype(dtype)

    p = {
        "q_proj": dense(ks[0]),
        "k_proj": dense(ks[1]),
        "v_proj": dense(ks[2]),
        "out_proj": dense(ks[3]),
        "out_bias": jnp.zeros((dim,), dtype),
    }
    if qkv_bias:
        p.update(
            q_bias=jnp.zeros((dim,), dtype),
            k_bias=jnp.zeros((dim,), dtype),
            v_bias=jnp.zeros((dim,), dtype),
        )
    return p


def cross_attention_forward(
    params: Params,
    x: jax.Array,                     # (B, Nq, C) queries
    contexts: List[jax.Array],        # list of (B, Ni, C)
    num_heads: int,
    attention_mask: Optional[jax.Array] = None,  # bool or additive, broadcastable to (B, h, Nq, Nkv)
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    B, Nq, C = x.shape
    Dh = C // num_heads
    context = jnp.concatenate(contexts, axis=1)
    Nkv = context.shape[1]

    def proj(t, w, b):
        out = t @ params[w]
        if b in params:
            out = out + params[b]
        return out

    q = proj(x, "q_proj", "q_bias").reshape(B, Nq, num_heads, Dh).transpose(0, 2, 1, 3)
    k = proj(context, "k_proj", "k_bias").reshape(B, Nkv, num_heads, Dh).transpose(0, 2, 1, 3)
    v = proj(context, "v_proj", "v_bias").reshape(B, Nkv, num_heads, Dh).transpose(0, 2, 1, 3)

    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    attn = attn * (Dh ** -0.5)
    if attention_mask is not None:
        if attention_mask.dtype == jnp.bool_:
            attn = jnp.where(attention_mask, attn, -jnp.inf)
        else:
            attn = attn + attention_mask
    attn = jax.nn.softmax(attn, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
    return out @ params["out_proj"] + params["out_bias"]
