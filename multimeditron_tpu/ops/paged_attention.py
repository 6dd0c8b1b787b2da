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
    if impl == "pallas" and q.shape[-1] % 128 != 0:
        # see ring_decode_attention: sub-128 head dims aren't expressible
        # as Mosaic page DMAs
        impl = "xla"
    if impl == "xla":
        return paged_attention_xla(q, k_pages, v_pages, page_table, lengths,
                                   sm_scale=sm_scale)
    if impl in ("pallas", "pallas_interpret"):
        return paged_attention_pallas(
            q, k_pages, v_pages, page_table, lengths, sm_scale=sm_scale,
            interpret=(impl == "pallas_interpret"),
        )
    raise ValueError(f"Unknown paged attention impl {impl!r}")


# ======================================================================
# Ring decode attention: paged prompt KV + contiguous decode-ring KV
# ======================================================================
#
# Decode writes are the paged design's hard part on TPU: scattering one
# KV row per slot per layer per step into the (8,128)-tiled page pool is
# both a slow XLA lowering (measured ~1.4 ms/step on a 1B model) and not
# expressible as a Mosaic DMA (sub-tile row writes). So the serving
# engine splits the cache:
#
#   - PAGES hold tokens that existed at the start of the current decode
#     chunk (prompt + previously folded tokens). During a chunk they are
#     READ-ONLY.
#   - A small RING buffer (L, B, Hkv, ring, D) holds the tokens generated
#     within the current chunk. Every step writes row ``t`` (the in-chunk
#     step index, uniform across slots) — a plain dynamic-update-slice
#     that XLA keeps in place inside the decode while-loop.
#   - At the END of each chunk the ring is FOLDED into the pages with one
#     scatter (amortized over the chunk's steps).
#
# This kernel computes one step's attention over [pages, ring] per slot:
#   q:          (B, H, D)
#   k/v_pages:  (L_layers, Hkv, n_pages, P, D)  — HBM, manual page DMAs
#   k/v_ring:   (L_layers, B, Hkv, ring, D)     — already contains this
#               step's token at row ``g_b = lengths_b - pages_len_b``
#   page_table: (B, pm) int32
#   pages_len:  (B,) int32 — tokens covered by pages (chunk-start length)
#   lengths:    (B,) int32 — tokens BEFORE this step's token
#   layer_index: scalar int32
# Valid keys per slot: pages positions < pages_len_b, ring rows
# r <= lengths_b - pages_len_b. Slots with garbage state (finished /
# inactive) produce garbage outputs the engine discards.


def ring_decode_attention_xla(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    k_ring: jax.Array,
    v_ring: jax.Array,
    page_table: jax.Array,
    pages_len: jax.Array,
    lengths: jax.Array,
    layer_index: jax.Array,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Gather-based reference: concat [gathered pages, ring] and attend."""
    B, H, D = q.shape
    _, Hkv, _, P, _ = k_pages.shape
    pm = page_table.shape[1]
    T = k_ring.shape[3]
    if sm_scale is None:
        sm_scale = D ** -0.5

    kl = jax.lax.dynamic_index_in_dim(k_pages, layer_index, 0, keepdims=False)
    vl = jax.lax.dynamic_index_in_dim(v_pages, layer_index, 0, keepdims=False)
    k = jnp.take(kl, page_table, axis=1).transpose(1, 0, 2, 3, 4)
    v = jnp.take(vl, page_table, axis=1).transpose(1, 0, 2, 3, 4)
    k = k.reshape(B, Hkv, pm * P, D)
    v = v.reshape(B, Hkv, pm * P, D)
    rk = jax.lax.dynamic_index_in_dim(k_ring, layer_index, 0, keepdims=False)
    rv = jax.lax.dynamic_index_in_dim(v_ring, layer_index, 0, keepdims=False)
    k = jnp.concatenate([k, rk.astype(k.dtype)], axis=2)
    v = jnp.concatenate([v, rv.astype(v.dtype)], axis=2)

    group = H // Hkv
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)

    page_mask = jnp.arange(pm * P)[None, :] < pages_len[:, None]
    ring_mask = jnp.arange(T)[None, :] <= (lengths - pages_len)[:, None]
    mask = jnp.concatenate([page_mask, ring_mask], axis=1)[:, None, :]

    s = jnp.einsum("bhd,bhkd->bhk", q, k, preferred_element_type=jnp.float32)
    s = jnp.where(mask, s * sm_scale, MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.where(mask, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhk,bhkd->bhd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


def ring_verify_attention_xla(
    q: jax.Array,              # (B, H, S, D) — the speculative block
    k_pages: jax.Array,
    v_pages: jax.Array,
    k_ring: jax.Array,
    v_ring: jax.Array,
    page_table: jax.Array,
    pages_len: jax.Array,
    lengths: jax.Array,
    layer_index: jax.Array,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Multi-query ring attention for SPECULATIVE verify blocks: query i
    sits at global position ``lengths + i``; it attends every page row
    (< pages_len <= lengths) and ring rows j with pages_len + j <=
    lengths + i — which makes the freshly-written block rows causal
    within the block (row of token i is ring row lengths-pages_len+i).
    Gather-based (the S=1 Pallas streaming kernel stays the plain-decode
    fast path; the verify block amortizes the gather over k+1 queries).
    """
    B, H, S, D = q.shape
    _, Hkv, _, P, _ = k_pages.shape
    pm = page_table.shape[1]
    T = k_ring.shape[3]
    if sm_scale is None:
        sm_scale = D ** -0.5

    kl = jax.lax.dynamic_index_in_dim(k_pages, layer_index, 0, keepdims=False)
    vl = jax.lax.dynamic_index_in_dim(v_pages, layer_index, 0, keepdims=False)
    k = jnp.take(kl, page_table, axis=1).transpose(1, 0, 2, 3, 4)
    v = jnp.take(vl, page_table, axis=1).transpose(1, 0, 2, 3, 4)
    k = k.reshape(B, Hkv, pm * P, D)
    v = v.reshape(B, Hkv, pm * P, D)
    rk = jax.lax.dynamic_index_in_dim(k_ring, layer_index, 0, keepdims=False)
    rv = jax.lax.dynamic_index_in_dim(v_ring, layer_index, 0, keepdims=False)
    k = jnp.concatenate([k, rk.astype(k.dtype)], axis=2)
    v = jnp.concatenate([v, rv.astype(v.dtype)], axis=2)

    # GQA WITHOUT materializing the head repeat (a jnp.repeat here cost
    # group x the gathered K/V bytes — ~6 GB of pure traffic per 8B
    # verify step): fold the group into the query tensor instead.
    group = H // Hkv
    qg = q.reshape(B, Hkv, group, S, D)

    qi = jnp.arange(S)[None, :, None]                       # (1, S, 1)
    page_mask = jnp.broadcast_to(
        (jnp.arange(pm * P)[None, None, :] < pages_len[:, None, None]),
        (B, S, pm * P))
    ring_mask = (jnp.arange(T)[None, None, :]
                 <= (lengths - pages_len)[:, None, None] + qi)
    mask = jnp.concatenate([page_mask, ring_mask],
                           axis=2)[:, None, None]           # (B,1,1,S,N)

    s = jnp.einsum("bigsd,bind->bigsn", qg, k,
                   preferred_element_type=jnp.float32)
    s = jnp.where(mask, s * sm_scale, MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.where(mask, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bigsn,bind->bigsd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out / jnp.maximum(l, 1e-30)
    return out.reshape(B, H, S, D).astype(q.dtype)


def _ring_decode_kernel(
    layer_ref, table_ref, plen_ref, len_ref,   # scalar prefetch (SMEM)
    q_ref, rk_ref, rv_ref,                     # VMEM blocks (per slot)
    kp_hbm, vp_hbm,                            # page pools (HBM)
    o_ref,
    k_buf, v_buf, copy_sems, m_scr, l_scr, acc_scr,  # scratch
    *, sm_scale, page_size, pages_max, group, pages_group, block_s=1,
):
    # ``block_s`` > 1: SPECULATIVE verify block — each q head contributes
    # block_s query rows (h-major, s-minor; ``group`` already includes
    # the x block_s fan-out). Pages are valid for every row; the ring
    # mask becomes per-row causal: row s attends ring rows r <= g + s
    # (the verify block's own rows sit at ring rows g..g+block_s-1).
    # Grid (B, ng): ng groups of ``pages_group`` pages per slot, streamed
    # through double-buffered VMEM group buffers with an online-softmax
    # accumulator across groups — VMEM use is bounded by the group size,
    # not max_seq_len (a slot's full page list no longer has to fit).
    b, jg = pl.program_id(0), pl.program_id(1)
    B, ng = pl.num_programs(0), pl.num_programs(1)
    P, pm, G = page_size, pages_max, pages_group
    li = layer_ref[0]
    Hkv = rk_ref.shape[2]

    def start_copies(slot, grp, buf):
        used = lax.min(pl.cdiv(plen_ref[slot], P), pm)
        base = grp * G
        for j in range(G):  # static unroll
            @pl.when(base + j < used)
            def _():
                pid = table_ref[slot, base + j]
                pltpu.make_async_copy(
                    kp_hbm.at[li, :, pid],
                    k_buf.at[buf, :, pl.ds(j * P, P), :],
                    copy_sems.at[buf, j, 0],
                ).start()
                pltpu.make_async_copy(
                    vp_hbm.at[li, :, pid],
                    v_buf.at[buf, :, pl.ds(j * P, P), :],
                    copy_sems.at[buf, j, 1],
                ).start()

            # Partially-used group: K garbage is masked before use, but
            # the PV dot multiplies ~0 probabilities by RAW v_buf data —
            # 0 * NaN would poison the row, so zero stale V pages of
            # groups that WILL be computed (base < used).
            @pl.when(jnp.logical_and(base < used, base + j >= used))
            def _zero():
                v_buf[buf, :, j * P:(j + 1) * P, :] = jnp.zeros(
                    (Hkv, P, v_buf.shape[3]), v_buf.dtype
                )

    def wait_copies(slot, grp, buf):
        used = lax.min(pl.cdiv(plen_ref[slot], P), pm)
        base = grp * G
        for j in range(G):
            @pl.when(base + j < used)
            def _():
                pltpu.make_async_copy(
                    kp_hbm.at[li, :, table_ref[slot, base + j]],
                    k_buf.at[buf, :, pl.ds(j * P, P), :],
                    copy_sems.at[buf, j, 0],
                ).wait()
                pltpu.make_async_copy(
                    vp_hbm.at[li, :, table_ref[slot, base + j]],
                    v_buf.at[buf, :, pl.ds(j * P, P), :],
                    copy_sems.at[buf, j, 1],
                ).wait()

    step = b * ng + jg
    buf = step % 2

    @pl.when(step == 0)
    def _first():
        start_copies(0, 0, 0)

    @pl.when(step + 1 < B * ng)
    def _prefetch():
        nxt = step + 1
        start_copies(nxt // ng, nxt % ng, nxt % 2)

    wait_copies(b, jg, buf)

    @pl.when(jg == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    plen = plen_ref[b]
    base_tok = jg * G * P
    scale = sm_scale * LOG2_E

    @pl.when(base_tok < plen)  # group holds at least one valid key
    def _compute():
        for h in range(Hkv):  # static loop over kv heads
            qh = q_ref[0, h * group:(h + 1) * group, :]      # (grp, D)
            kh = k_buf[buf, h]                               # (G*P, D)
            s = lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                        # (grp, G*P)
            pos = lax.broadcasted_iota(jnp.int32, s.shape, 1) + base_tok
            s = jnp.where(pos < plen, s, MASK_VALUE)

            m_prev = m_scr[h]                                # (grp, LANES)
            m_curr = jnp.max(s, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            p = jnp.exp2(s - m_next[:, :1])
            alpha = jnp.exp2(m_prev - m_next)
            l_scr[h] = alpha * l_scr[h] + jnp.sum(p, axis=1)[:, None]
            vh = v_buf[buf, h]
            acc_scr[h] = acc_scr[h] * alpha[:, :1] + lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[h] = m_next

    @pl.when(jg == ng - 1)
    def _ring_and_finalize():
        # fold the in-chunk ring rows (always >= 1 valid: row g holds this
        # step's token, so l > 0 at the end) and write the output
        g = len_ref[b] - plen
        for h in range(Hkv):
            qh = q_ref[0, h * group:(h + 1) * group, :]
            rk = rk_ref[0, 0, h]                             # (T, D)
            sr = lax.dot_general(
                qh, rk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                        # (grp, T)
            r = lax.broadcasted_iota(jnp.int32, sr.shape, 1)
            if block_s == 1:
                sr = jnp.where(r <= g, sr, MASK_VALUE)
            else:
                s_row = lax.broadcasted_iota(
                    jnp.int32, sr.shape, 0) % block_s
                sr = jnp.where(r <= g + s_row, sr, MASK_VALUE)

            m_prev = m_scr[h]
            m_next = jnp.maximum(m_prev, jnp.max(sr, axis=1)[:, None])
            pr = jnp.exp2(sr - m_next[:, :1])
            alpha = jnp.exp2(m_prev - m_next)
            l = alpha * l_scr[h] + jnp.sum(pr, axis=1)[:, None]
            rv = rv_ref[0, 0, h]
            acc = acc_scr[h] * alpha[:, :1] + lax.dot_general(
                pr.astype(rv.dtype), rv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, h * group:(h + 1) * group, :] = (
                acc / l[:, :1]
            ).astype(o_ref.dtype)


def ring_decode_attention_pallas(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    k_ring: jax.Array,
    v_ring: jax.Array,
    page_table: jax.Array,
    pages_len: jax.Array,
    lengths: jax.Array,
    layer_index: jax.Array,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
    pages_group: Optional[int] = None,
) -> jax.Array:
    B, H, D = q.shape
    L_layers, Hkv, n_pages, P, Dk = k_pages.shape
    pm = page_table.shape[1]
    T = k_ring.shape[3]
    assert D == Dk and v_pages.shape == k_pages.shape
    assert k_ring.shape == (L_layers, B, Hkv, T, D)
    assert H % Hkv == 0
    group = H // Hkv
    if sm_scale is None:
        sm_scale = D ** -0.5

    import functools

    # Pages per streamed group: bound the double-buffered k/v group
    # buffers to ~8 MB of VMEM so max_seq_len never drives VMEM pressure
    # (2 buffers x 2 arrays x G*P tokens x Hkv*D lanes).
    dsize = jnp.dtype(k_pages.dtype).itemsize
    page_bytes = Hkv * P * D * dsize
    G = pages_group or max(1, int((8 * 1024 * 1024) // (4 * page_bytes)))
    G = min(G, pm)
    ng = -(-pm // G)

    def ring_index(b, jg, layer, *_):
        return (layer[0], b, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, ng),
        in_specs=[
            pl.BlockSpec((1, H, D), lambda b, jg, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T, D), ring_index),
            pl.BlockSpec((1, 1, Hkv, T, D), ring_index),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, H, D), lambda b, jg, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Hkv, G * P, D), k_pages.dtype),
            pltpu.VMEM((2, Hkv, G * P, D), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, G, 2)),
            pltpu.VMEM((Hkv, group, LANES), jnp.float32),
            pltpu.VMEM((Hkv, group, LANES), jnp.float32),
            pltpu.VMEM((Hkv, group, D), jnp.float32),
        ],
    )

    return pl.pallas_call(
        functools.partial(
            _ring_decode_kernel,
            sm_scale=float(sm_scale), page_size=P, pages_max=pm, group=group,
            pages_group=G,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer_index, jnp.int32).reshape(1),
        page_table.astype(jnp.int32),
        pages_len.astype(jnp.int32),
        lengths.astype(jnp.int32),
        q, k_ring, v_ring, k_pages, v_pages,
    )


def ring_verify_attention_pallas(
    q: jax.Array,              # (B, H, S, D) speculative block
    k_pages: jax.Array,
    v_pages: jax.Array,
    k_ring: jax.Array,
    v_ring: jax.Array,
    page_table: jax.Array,
    pages_len: jax.Array,
    lengths: jax.Array,
    layer_index: jax.Array,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
    pages_group: Optional[int] = None,
) -> jax.Array:
    """Streaming Pallas verify: the S=1 decode kernel generalized to
    ``block_s`` query rows per head (h-major, s-minor layout) — pages
    stream through the same double-buffered VMEM groups, and only the
    per-row ring mask differs. Replaces the XLA gather path's ~6.7 ms
    marginal at 8B dims (it materialized every gathered page)."""
    B, H, S, D = q.shape
    L_layers, Hkv, n_pages, P, Dk = k_pages.shape
    pm = page_table.shape[1]
    T = k_ring.shape[3]
    assert D == Dk and v_pages.shape == k_pages.shape
    assert H % Hkv == 0
    group = H // Hkv
    if sm_scale is None:
        sm_scale = D ** -0.5

    import functools

    dsize = jnp.dtype(k_pages.dtype).itemsize
    page_bytes = Hkv * P * D * dsize
    G = pages_group or max(1, int((8 * 1024 * 1024) // (4 * page_bytes)))
    G = min(G, pm)
    ng = -(-pm // G)
    q2 = q.reshape(B, H * S, D)
    grp_eff = group * S

    def ring_index(b, jg, layer, *_):
        return (layer[0], b, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, ng),
        in_specs=[
            pl.BlockSpec((1, H * S, D), lambda b, jg, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T, D), ring_index),
            pl.BlockSpec((1, 1, Hkv, T, D), ring_index),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, H * S, D), lambda b, jg, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Hkv, G * P, D), k_pages.dtype),
            pltpu.VMEM((2, Hkv, G * P, D), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, G, 2)),
            pltpu.VMEM((Hkv, grp_eff, LANES), jnp.float32),
            pltpu.VMEM((Hkv, grp_eff, LANES), jnp.float32),
            pltpu.VMEM((Hkv, grp_eff, D), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _ring_decode_kernel,
            sm_scale=float(sm_scale), page_size=P, pages_max=pm,
            group=grp_eff, pages_group=G, block_s=S,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H * S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer_index, jnp.int32).reshape(1),
        page_table.astype(jnp.int32),
        pages_len.astype(jnp.int32),
        lengths.astype(jnp.int32),
        q2, k_ring, v_ring, k_pages, v_pages,
    )
    return out.reshape(B, H, S, D)


def ring_verify_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    k_ring: jax.Array,
    v_ring: jax.Array,
    page_table: jax.Array,
    pages_len: jax.Array,
    lengths: jax.Array,
    layer_index: jax.Array,
    sm_scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """Dispatching entry point for the speculative verify block."""
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas" and q.shape[-1] % 128 != 0:
        impl = "xla"
    args = (q, k_pages, v_pages, k_ring, v_ring, page_table, pages_len,
            lengths, layer_index, sm_scale)
    if impl == "xla":
        return ring_verify_attention_xla(*args)
    if impl in ("pallas", "pallas_interpret"):
        return ring_verify_attention_pallas(
            *args, interpret=(impl == "pallas_interpret"))
    raise ValueError(f"Unknown verify attention impl {impl!r}")


def ring_decode_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    k_ring: jax.Array,
    v_ring: jax.Array,
    page_table: jax.Array,
    pages_len: jax.Array,
    lengths: jax.Array,
    layer_index: jax.Array,
    sm_scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """Dispatching entry point for the paged+ring decode step."""
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas" and q.shape[-1] % 128 != 0:
        # Mosaic page DMAs slice the lane axis; head dims that don't fill
        # a 128-lane tile can't be expressed (tiny eval models) — the
        # gather-based XLA path is cheap at those sizes anyway.
        impl = "xla"
    if impl == "xla":
        return ring_decode_attention_xla(
            q, k_pages, v_pages, k_ring, v_ring, page_table, pages_len,
            lengths, layer_index, sm_scale=sm_scale)
    if impl in ("pallas", "pallas_interpret"):
        return ring_decode_attention_pallas(
            q, k_pages, v_pages, k_ring, v_ring, page_table, pages_len,
            lengths, layer_index, sm_scale=sm_scale,
            interpret=(impl == "pallas_interpret"))
    raise ValueError(f"Unknown ring decode attention impl {impl!r}")


def _fold_kernel(
    table_ref, plen_ref, len_ref,              # scalar prefetch (SMEM)
    rk_ref, rv_ref,                            # ring blocks (VMEM)
    kp_hbm, vp_hbm,                            # page pools (ANY, aliased)
    okp_hbm, ovp_hbm,                          # outputs (alias of kp/vp)
    kbuf, vbuf, sems,                          # scratch
    *, page_size, pages_max, ring_size,
):
    # One grid step folds slot b's ring rows into its pages for layer li:
    # read-modify-write of the 1-2 pages the rows land in (whole-page
    # DMAs; the merge happens in VMEM). Replaces an XLA scatter whose
    # cost scaled with the POOL size (measured ~28 ms/chunk at a
    # 513-page pool vs ~1 ms here).
    li, b = pl.program_id(0), pl.program_id(1)
    P, pm, T = page_size, pages_max, ring_size
    plen = plen_ref[b]
    nrows = lax.min(lax.max(len_ref[b] - plen, 0), T)
    p0 = lax.min(plen // P, pm - 1)
    o0 = plen % P
    pid0 = table_ref[b, p0]
    pid1 = table_ref[b, lax.min(p0 + 1, pm - 1)]
    two = (o0 + nrows) > P  # rows spill into the next page

    @pl.when(nrows > 0)
    def _fold():
        r0k = pltpu.make_async_copy(
            kp_hbm.at[li, :, pid0], kbuf.at[:, pl.ds(0, P), :], sems.at[0])
        r0v = pltpu.make_async_copy(
            vp_hbm.at[li, :, pid0], vbuf.at[:, pl.ds(0, P), :], sems.at[1])
        r0k.start(); r0v.start()

        @pl.when(two)
        def _start_p1():
            pltpu.make_async_copy(
                kp_hbm.at[li, :, pid1], kbuf.at[:, pl.ds(P, P), :],
                sems.at[2]).start()
            pltpu.make_async_copy(
                vp_hbm.at[li, :, pid1], vbuf.at[:, pl.ds(P, P), :],
                sems.at[3]).start()

        r0k.wait(); r0v.wait()

        @pl.when(two)
        def _wait_p1():
            pltpu.make_async_copy(
                kp_hbm.at[li, :, pid1], kbuf.at[:, pl.ds(P, P), :],
                sems.at[2]).wait()
            pltpu.make_async_copy(
                vp_hbm.at[li, :, pid1], vbuf.at[:, pl.ds(P, P), :],
                sems.at[3]).wait()

        # Place ring row r at position o0 + r of the two-page window: pad
        # the T rows to the window width and rotate by o0 (dynamic shift).
        pos = lax.broadcasted_iota(jnp.int32, (1, 2 * P, 1), 1)
        mask = jnp.logical_and(pos >= o0, pos < o0 + nrows)

        def merge(buf, ring):  # ring: (Hkv, T, D)
            pad = jnp.pad(ring, ((0, 0), (0, 2 * P - T), (0, 0)))
            # Mosaic only implements dynamic rotates on 32-bit lanes; the
            # roll is along the sublane (token) axis, so widening bf16 to
            # f32 is exact and shape-preserving.
            rolled = pltpu.roll(pad.astype(jnp.float32), o0, 1)
            buf[...] = jnp.where(mask, rolled.astype(buf.dtype), buf[...])

        merge(kbuf, rk_ref[0, 0])
        merge(vbuf, rv_ref[0, 0])

        w0k = pltpu.make_async_copy(
            kbuf.at[:, pl.ds(0, P), :], okp_hbm.at[li, :, pid0], sems.at[0])
        w0v = pltpu.make_async_copy(
            vbuf.at[:, pl.ds(0, P), :], ovp_hbm.at[li, :, pid0], sems.at[1])
        w0k.start(); w0v.start()

        @pl.when(two)
        def _write_p1():
            pltpu.make_async_copy(
                kbuf.at[:, pl.ds(P, P), :], okp_hbm.at[li, :, pid1],
                sems.at[2]).start()
            pltpu.make_async_copy(
                vbuf.at[:, pl.ds(P, P), :], ovp_hbm.at[li, :, pid1],
                sems.at[3]).start()

        w0k.wait(); w0v.wait()

        @pl.when(two)
        def _wait_w1():
            pltpu.make_async_copy(
                kbuf.at[:, pl.ds(P, P), :], okp_hbm.at[li, :, pid1],
                sems.at[2]).wait()
            pltpu.make_async_copy(
                vbuf.at[:, pl.ds(P, P), :], ovp_hbm.at[li, :, pid1],
                sems.at[3]).wait()


def fold_ring_into_pages_pallas(
    k_pages: jax.Array,
    v_pages: jax.Array,
    k_ring: jax.Array,
    v_ring: jax.Array,
    page_table: jax.Array,
    pages_len: jax.Array,
    rows: int,
    lengths: jax.Array,
    interpret: bool = False,
):
    """Pallas page-RMW fold (see ``_fold_kernel``). ``rows`` is accepted
    for signature parity with the XLA fold; the per-slot row count comes
    from ``lengths - pages_len`` (clamped to the ring size)."""
    import functools

    L, Hkv, n_pages, P, D = k_pages.shape
    B, pm = page_table.shape
    T = k_ring.shape[3]
    assert T <= P, f"ring ({T}) must fit within one page ({P})"

    def ring_index(li, b, *_):
        return (li, b, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(L, B),
        in_specs=[
            pl.BlockSpec((1, 1, Hkv, T, D), ring_index),
            pl.BlockSpec((1, 1, Hkv, T, D), ring_index),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((Hkv, 2 * P, D), k_pages.dtype),
            pltpu.VMEM((Hkv, 2 * P, D), v_pages.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    return pl.pallas_call(
        functools.partial(
            _fold_kernel, page_size=P, pages_max=pm, ring_size=T,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ],
        # inputs (incl. 3 scalar-prefetch args): rk=3, rv=4, kp=5, vp=6
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        page_table.astype(jnp.int32),
        pages_len.astype(jnp.int32),
        lengths.astype(jnp.int32),
        k_ring, v_ring, k_pages, v_pages,
    )


def fold_ring_into_pages(
    k_pages: jax.Array,
    v_pages: jax.Array,
    k_ring: jax.Array,
    v_ring: jax.Array,
    page_table: jax.Array,
    pages_len: jax.Array,
    rows: int,
    lengths: Optional[jax.Array] = None,
    impl: Optional[str] = None,
):
    """Scatter the first ``rows`` ring rows into the page pool (end of a
    decode chunk). Ring row r of slot b lands at position pages_len_b + r;
    positions past a slot's reserved pages resolve to table entries that
    are 0 (trash page) — released/overflowing slots fold harmlessly.
    ``lengths`` (per-slot token counts AFTER the chunk) additionally sends
    rows at positions >= lengths_b to the trash page: slots that
    deactivated mid-chunk (or whose page_table row is stale because the
    scheduler keeps it device-resident) fold only their real tokens.
    Returns updated (k_pages, v_pages).

    On TPU with ``lengths`` given, dispatches to the Pallas page-RMW fold
    (XLA's scatter re-materializes the whole pool — its cost scales with
    pool size, not rows written)."""
    B, pm = page_table.shape
    P = k_pages.shape[3]
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if (impl == "pallas" and lengths is not None
            and k_pages.shape[-1] % 128 == 0
            and k_ring.shape[3] <= P):
        return fold_ring_into_pages_pallas(
            k_pages, v_pages, k_ring, v_ring, page_table, pages_len,
            rows, lengths)
    pos = pages_len[:, None] + jnp.arange(rows)[None, :]      # (B, rows)
    page_idx = jnp.minimum(pos // P, pm - 1)
    pid = jnp.take_along_axis(page_table, page_idx, axis=1)   # (B, rows)
    if lengths is not None:
        pid = jnp.where(pos < lengths[:, None], pid, 0)
    off = pos % P
    # values: (L, B, Hkv, rows, D) -> (L, Hkv, B, rows, D) to match the
    # advanced-index result layout of kp[:, :, pid, off, :]
    kv = k_ring[:, :, :, :rows].transpose(0, 2, 1, 3, 4)
    vv = v_ring[:, :, :, :rows].transpose(0, 2, 1, 3, 4)
    k_pages = k_pages.at[:, :, pid, off, :].set(kv.astype(k_pages.dtype))
    v_pages = v_pages.at[:, :, pid, off, :].set(vv.astype(v_pages.dtype))
    return k_pages, v_pages
