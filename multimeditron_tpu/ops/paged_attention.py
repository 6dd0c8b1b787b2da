"""Pallas TPU paged attention for single-step decode.

TPU-native replacement for the paged-KV-cache attention inside the
reference's sglang serving dependency (SURVEY.md §2.3: sglang/sgl_kernel
provide continuous batching + paged KV on CUDA; vendored at
``.gitmodules:5-7``, ``verl_trainer.yaml:62``). The serving engine stores
KV in a global pool of fixed-size PAGES and each slot owns a page table;
this kernel computes one decode step's attention directly against the
pooled pages — no gather/copy of the slot's KV is materialized, so decode
stays at the HBM-bandwidth roof.

Layout (pool shared by all slots):
  q:        (B, H, D)           one query token per slot
  k_pages:  (Hkv, n_pages, P, D)
  v_pages:  (Hkv, n_pages, P, D)
  page_table: (B, pages_max) int32 — pool page id of each slot page
  lengths:  (B,) int32 — valid tokens per slot (incl. the token just
            written this step); 0 for inactive slots (returns zeros)

The kernel grid is (B, Hkv, pages_max) with the page axis innermost.
``page_table`` and ``lengths`` ride as scalar-prefetch operands so the
BlockSpec index maps can resolve pool pages before each DMA; page indices
past a slot's last used page are CLAMPED to the last used page, which
makes Pallas skip the redundant DMA (consecutive identical block indices
are fetched once) — short slots pay only for the pages they use, unlike a
contiguous slab masked to ``max_seq_len``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2_E = 1.4426950408889634  # base-2 softmax domain (see flash_attention)


# ======================================================================
# XLA reference / fallback (CPU tests, non-TPU backends)
# ======================================================================
def paged_attention_xla(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    page_table: jax.Array,
    lengths: jax.Array,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Gather-based paged attention: materializes each slot's KV.

    Same contract as ``paged_attention``. Used on CPU and as the parity
    reference for the Pallas kernel; on TPU it costs an extra HBM
    round-trip for the gathered copy.
    """
    B, H, D = q.shape
    Hkv, _, P, _ = k_pages.shape
    pm = page_table.shape[1]
    if sm_scale is None:
        sm_scale = D ** -0.5

    # (Hkv, B, pm, P, D) -> (B, Hkv, pm*P, D)
    k = jnp.take(k_pages, page_table, axis=1)
    v = jnp.take(v_pages, page_table, axis=1)
    k = k.transpose(1, 0, 2, 3, 4).reshape(B, Hkv, pm * P, D)
    v = v.transpose(1, 0, 2, 3, 4).reshape(B, Hkv, pm * P, D)

    group = H // Hkv
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)

    s = jnp.einsum("bhd,bhkd->bhk", q, k, preferred_element_type=jnp.float32)
    s = s * sm_scale
    mask = jnp.arange(pm * P)[None, None, :] < lengths[:, None, None]
    s = jnp.where(mask, s, MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.where(mask, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhk,bhkd->bhd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out / jnp.maximum(l, 1e-30)
    out = jnp.where(l > 0, out, 0.0)
    return out.astype(q.dtype)


# ======================================================================
# Pallas kernel
# ======================================================================
def _paged_kernel(
    table_ref, len_ref,          # scalar prefetch (SMEM)
    q_ref, k_ref, v_ref,         # VMEM blocks
    o_ref,
    m_scr, l_scr, acc_scr,
    *, sm_scale, page_size,
):
    b, j = pl.program_id(0), pl.program_id(2)
    npg = pl.num_programs(2)
    length = len_ref[b]

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(j * page_size < length)
    def _compute():
        q = q_ref[0, 0]          # (g, D)
        k = k_ref[0, 0]          # (P, D)
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (sm_scale * LOG2_E)  # (g, P)

        pos = j * page_size + lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < length, s, MASK_VALUE)

        m_prev = m_scr[...]                       # (g, LANES) replicated
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        p = jnp.exp2(s - m_next[:, :1])
        # the final page's masked tail underflows to 0 via exp2 whenever a
        # valid entry dominates the row max; a fully-masked page never runs
        # (j*P >= length), so no explicit zeroing pass is needed here.
        alpha = jnp.exp2(m_prev - m_next)
        l_next = jnp.sum(p, axis=1)[:, None] + alpha * l_prev
        m_scr[...] = m_next
        l_scr[...] = l_next
        v = v_ref[0, 0]
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == npg - 1)
    def _finalize():
        l = l_scr[...]
        l_safe = jnp.maximum(l, 1e-30)
        o = acc_scr[...] / l_safe[:, :1]
        o_ref[0, 0] = jnp.where(l[:, :1] > 0, o, 0.0).astype(o_ref.dtype)


def paged_attention_pallas(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    page_table: jax.Array,
    lengths: jax.Array,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    B, H, D = q.shape
    Hkv, n_pages, P, Dk = k_pages.shape
    pm = page_table.shape[1]
    assert D == Dk and v_pages.shape == k_pages.shape
    assert H % Hkv == 0, f"GQA requires H % Hkv == 0, got {H=} {Hkv=}"
    group = H // Hkv
    if sm_scale is None:
        sm_scale = D ** -0.5

    # lanes: D 64 runs native (as in flash_attention); otherwise pad to 128
    D_p = D if D == 64 else (D + LANES - 1) // LANES * LANES
    if D_p != D:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, D_p - D)))
        k_pages = jnp.pad(k_pages, ((0, 0), (0, 0), (0, 0), (0, D_p - D)))
        v_pages = jnp.pad(v_pages, ((0, 0), (0, 0), (0, 0), (0, D_p - D)))

    qg = q.reshape(B, Hkv, group, D_p)
    page_table = page_table.astype(jnp.int32)
    lengths = lengths.astype(jnp.int32)

    def q_index(b, h, j, table, lens):
        return (b, h, 0, 0)

    def kv_index(b, h, j, table, lens):
        # clamp past-the-end pages to the last used page: identical
        # consecutive block indices skip the DMA (see module docstring)
        last = jnp.maximum(pl.cdiv(lens[b], P), 1) - 1
        return (h, table[b, jnp.minimum(j, last)], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, pm),
        in_specs=[
            pl.BlockSpec((1, 1, group, D_p), q_index),
            pl.BlockSpec((1, 1, P, D_p), kv_index),
            pl.BlockSpec((1, 1, P, D_p), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, group, D_p), q_index),
        scratch_shapes=[
            pltpu.VMEM((group, LANES), jnp.float32),
            pltpu.VMEM((group, LANES), jnp.float32),
            pltpu.VMEM((group, D_p), jnp.float32),
        ],
    )

    import functools

    out = pl.pallas_call(
        functools.partial(
            _paged_kernel, sm_scale=float(sm_scale), page_size=P
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, group, D_p), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table, lengths, qg, k_pages, v_pages)

    out = out.reshape(B, H, D_p)
    if D_p != D:
        out = out[:, :, :D]
    return out


def paged_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    page_table: jax.Array,
    lengths: jax.Array,
    sm_scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """Dispatching entry point (mirrors ``ops.attention.attention``)."""
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return paged_attention_xla(q, k_pages, v_pages, page_table, lengths,
                                   sm_scale=sm_scale)
    if impl in ("pallas", "pallas_interpret"):
        return paged_attention_pallas(
            q, k_pages, v_pages, page_table, lengths, sm_scale=sm_scale,
            interpret=(impl == "pallas_interpret"),
        )
    raise ValueError(f"Unknown paged attention impl {impl!r}")
