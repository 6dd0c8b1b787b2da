"""Attention dispatch + pure-XLA reference implementation.

``attention`` is the single entry point the models call; it routes to the
Pallas flash kernel on TPU and to a fused-by-XLA reference everywhere else
(CPU tests, interpret debugging). This replaces the reference framework's
dependency on the flash-attn 2 CUDA extension (``model/model.py:253``,
``pyproject.toml:39-41``) with a TPU-native kernel.

All implementations share one contract:
  q: (B, H, Sq, D)   k, v: (B, Hkv, Skv, D) with H % Hkv == 0 (GQA)
  kv_mask: optional (B, Skv) bool — True for valid key/value positions
  causal: lower-triangular masking aligned to the END of the kv sequence
          when Sq != Skv (decode: the query block sits at the end).
Returns (B, H, Sq, D) in q.dtype. Rows with no valid keys return zeros.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    causal_offset: Optional[int] = None,
) -> jax.Array:
    """Reference attention in plain XLA ops (fp32 softmax accumulation)."""
    B, H, Sq, D = q.shape
    _, Hkv, Skv, _ = k.shape
    assert H % Hkv == 0, f"GQA requires H % Hkv == 0, got {H=} {Hkv=}"
    group = H // Hkv
    if sm_scale is None:
        sm_scale = D ** -0.5

    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)

    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * sm_scale

    mask = jnp.ones((B, 1, Sq, Skv), dtype=bool)
    if causal:
        # Default: align the causal diagonal to the end of the kv axis so a
        # decode step (Sq=1, Skv=cache_len) attends to the whole prefix.
        # Prefill-into-cache passes causal_offset = per-sample cache length
        # (0 for fresh slots; the chunked-prefill continuation passes the
        # already-written prefix length).
        offset = (Skv - Sq) if causal_offset is None else causal_offset
        offset = jnp.asarray(offset)
        if offset.ndim == 1:  # (B,) per-sample offsets
            q_pos = offset[:, None, None] + jnp.arange(Sq)[None, :, None]
            k_pos = jnp.arange(Skv)[None, None, :]
            mask = mask & (q_pos >= k_pos)[:, None]
        else:
            q_pos = jnp.arange(Sq)[:, None] + offset
            k_pos = jnp.arange(Skv)[None, :]
            mask = mask & (q_pos >= k_pos)[None, None]
    if kv_mask is not None:
        mask = mask & kv_mask[:, None, None, :].astype(bool)

    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # Fully-masked rows (l == 0 after exp underflow of NEG_INF-NEG_INF=0...)
    # are handled by zeroing: if every position was NEG_INF, p == 1 at the
    # masked slots; explicitly zero them instead.
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out / jnp.maximum(l, 1e-30)
    out = jnp.where(l > 0, out, 0.0)
    return out.astype(q.dtype)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    impl: Optional[str] = None,
    causal_offset: Optional[int] = None,
) -> jax.Array:
    """Dispatching attention entry point used by all models.

    Auto mode uses the Pallas flash kernel only where it wins: long
    sequences on TPU. For short sequences (ViT towers, short prompts) the
    materialized-scores XLA path is faster on the MXU (measured: ViT-L/14
    encode 508 vs 246 img/s on v5e), and the S^2 memory cost is small.
    Crossover measured on v5e at S=1024 D=128 causal: flash 54.6 vs
    XLA 36.2 TFLOP/s, so the kernel takes over from 1024 up.
    """
    if impl is None:
        long_seq = k.shape[2] >= 1024
        impl = "pallas" if (jax.default_backend() == "tpu" and long_seq) else "xla"
    if causal_offset is not None and getattr(causal_offset, "ndim", 0) >= 1:
        # Per-sample offsets (chunked prefill) are only lowered by the XLA
        # path; the flash kernel takes a static scalar offset.
        impl = "xla"
    if impl == "xla":
        return attention_xla(
            q, k, v, kv_mask=kv_mask, causal=causal, sm_scale=sm_scale,
            causal_offset=causal_offset,
        )
    if impl in ("pallas", "pallas_interpret"):
        from multimeditron_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v,
            kv_mask=kv_mask,
            causal=causal,
            sm_scale=sm_scale,
            causal_offset=causal_offset,
            interpret=(impl == "pallas_interpret"),
        )
    raise ValueError(f"Unknown attention impl {impl!r}")
