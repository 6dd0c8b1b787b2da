"""Pallas TPU flash attention (forward + backward).

First-party replacement for the reference framework's flash-attn 2 CUDA
dependency (``/root/reference/pyproject.toml:39-41``,
``model/model.py:253``), written MXU-first:

- online-softmax forward with fp32 accumulators in VMEM scratch, grid
  ``(B, H, nq, nk)`` with the kv dimension innermost ("arbitrary"), causal
  blocks above the diagonal skipped and their DMAs remapped away;
- backward as two kernels (dq over kv blocks; dk/dv over grouped q heads ×
  q blocks) recomputing p from the saved logsumexp residual;
- native grouped-query attention: q heads index kv heads through the
  BlockSpec index maps — no materialized ``jnp.repeat`` of K/V;
- optional kv padding mask (B, Skv) for left-padded inference batches;
- causal masking aligned to the END of the kv axis so the same kernel
  serves training (Sq == Skv) and single-step decode (Sq == 1).

Rows with no valid key return zeros (and zero gradients), which makes fully
padded queries safe.

Shapes: q (B, H, Sq, D); k, v (B, Hkv, Skv, D); H % Hkv == 0.
Sq/Skv must be multiples of the block sizes and D a multiple of 128 —
``flash_attention`` pads and unpads automatically.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2_E = 1.4426950408889634  # scores are kept in the base-2 domain: one
# fused scale (sm_scale * log2e) replaces scale-then-exp, and exp2 skips
# the multiply hidden inside exp's lowering. lse is stored in base-2.


def _head_pack(H: int, group: int) -> tuple[int, bool]:
    """Head-pack width and kv-sharing rule, shared by forward and dq bwd.

    Packs ``hp`` q heads per grid step. For GQA (group > 1) the packed heads
    must all map to ONE kv head (hp | group), so kv blocks stay (1, 1, ...);
    for MHA each packed head brings its own kv block. MMT_FLASH_HP overrides
    the pack width for tuning sweeps (capped by the divisibility rules).
    """
    hp_want = int(os.environ.get("MMT_FLASH_HP", "2"))
    hp = 1
    for cand in range(hp_want, 0, -1):
        if H % cand == 0 and (group == 1 or group % cand == 0):
            hp = cand
            break
    kv_shared = hp > 1 and group > 1
    return hp, kv_shared


def _below_or_on_diag(iq, block_q, ik, block_k, offset):
    """True if kv block ik intersects the causal region of q block iq.

    ``offset`` realigns q positions when Sq != Skv (q global position =
    local position + offset, with offset = Skv - Sq for end alignment).
    """
    q_max = (iq + 1) * block_q - 1 + offset
    return q_max >= ik * block_k


def _block_mask(iq, ik, block_q, block_k, offset, causal, kv_mask_blk):
    """Combined (block_q, block_k) bool mask for one tile, or None."""
    mask = None
    if causal:
        q_pos = lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = (q_pos + iq * block_q + offset) >= (k_pos + ik * block_k)
    if kv_mask_blk is not None:
        kvm = kv_mask_blk != 0  # (1, block_k)
        mask = kvm if mask is None else jnp.logical_and(mask, kvm)
    return mask


# ======================================================================
# Forward
# ======================================================================
def _fwd_kernel(
    q_ref, k_ref, v_ref, kv_mask_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, sm_scale, causal, offset, block_q, block_k, head_pack, kv_shared,
):
    # ``head_pack`` q heads are processed per grid step as fully independent
    # online-softmax chains; Mosaic overlaps the MXU dots of one chain with
    # the VPU softmax of the other, which a single serialized
    # QK^T -> softmax -> PV chain cannot do. The causal mask is built once
    # and shared across the packed heads (identical geometry).
    iq, ik = pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    should_run = (
        _below_or_on_diag(iq, block_q, ik, block_k, offset) if causal else True
    )

    def _compute_body(build_causal_mask: bool):
        kv_blk = kv_mask_ref[0, :1, :] if kv_mask_ref is not None else None
        mask = _block_mask(iq, ik, block_q, block_k, offset,
                           causal and build_causal_mask, kv_blk)

        s_all = []
        for a in range(head_pack):
            q = q_ref[0, a]  # (block_q, D)
            k = k_ref[0, 0 if kv_shared else a]  # (block_k, D)
            s = lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # sm_scale None: q arrived pre-scaled by sm_scale*log2e (the
            # wrapper folds it in once) — the per-step multiply pass over
            # every (block_q, block_k) score tile disappears.
            s_all.append(s if sm_scale is None else s * (sm_scale * LOG2_E))

        for a in range(head_pack):
            s = s_all[a]
            if mask is not None:
                s = jnp.where(mask, s, MASK_VALUE)

            m_prev = m_scr[a]            # (block_q, LANES), lanes replicated
            l_prev = l_scr[a]
            m_curr = jnp.max(s, axis=1)[:, None]       # (block_q, 1)
            m_next = jnp.maximum(m_prev, m_curr)       # (block_q, LANES)

            p = jnp.exp2(s - m_next[:, :1])
            # Masked entries underflow to exact zeros via exp2 unless a
            # whole row can be masked while its running max is still -inf
            # (kv padding masks / negative offsets) — only then pay the
            # explicit zeroing pass.
            if mask is not None and (
                kv_mask_ref is not None or offset < 0 or not causal
            ):
                p = jnp.where(mask, p, 0.0)

            alpha = jnp.exp2(m_prev - m_next)          # (block_q, LANES)
            l_corr = alpha * l_prev
            l_next = jnp.sum(p, axis=1)[:, None] + l_corr

            m_scr[a] = m_next
            l_scr[a] = l_next
            v = v_ref[0, 0 if kv_shared else a]
            acc_scr[a] = acc_scr[a] * alpha[:, :1] + lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    if causal:
        # Diagonal split (flash_floor_probe: +2.2 TFLOP/s, exact-match):
        # blocks strictly below the diagonal are fully valid — skip the
        # iota mask construction and the where pass there (60% of the
        # executed tiles at 1024-blocks). The kv padding mask, when
        # present, still applies on both branches.
        full_valid = (iq * block_q + offset) >= ((ik + 1) * block_k - 1)

        @pl.when(should_run & full_valid)
        def _compute_below_diag():
            _compute_body(False)

        @pl.when(should_run & jnp.logical_not(full_valid))
        def _compute_diag():
            _compute_body(True)
    else:

        @pl.when(should_run)
        def _compute():
            _compute_body(True)

    @pl.when(ik == nk - 1)
    def _finalize():
        for a in range(head_pack):
            l = l_scr[a]              # (block_q, LANES)
            m = m_scr[a]
            l_safe = jnp.maximum(l, 1e-30)
            o = acc_scr[a] / l_safe[:, :1]
            o = jnp.where(l[:, :1] > 0, o, 0.0)
            o_ref[0, a] = o.astype(o_ref.dtype)
            lse = jnp.where(l > 0, m + jnp.log2(l_safe), MASK_VALUE)
            lse_ref[0, a] = lse.astype(lse_ref.dtype)


def _fwd(q, k, v, kv_mask, causal, sm_scale, offset, block_q, block_k, interpret):
    B, H, Sq, D = q.shape
    _, Hkv, Skv, _ = k.shape
    group = H // Hkv
    nq, nk = Sq // block_q, Skv // block_k

    # Fold sm_scale*log2e into q once (exact up to one bf16 re-rounding of
    # q): scores leave the MXU already in the base-2 softmax domain and the
    # kernel skips a full VPU multiply pass per score tile.
    if os.environ.get("MMT_FLASH_PRESCALE", "1") != "0":
        q = (q.astype(jnp.float32) * (sm_scale * LOG2_E)).astype(q.dtype)
        sm_scale = None

    hp, kv_shared = _head_pack(H, group)
    grid = (B, H // hp, nq, nk)

    def remap_k(iq, ik):
        if causal:
            return lax.select(
                _below_or_on_diag(iq, block_q, ik, block_k, offset), ik, 0
            )
        return ik

    if kv_shared:
        kv_index = lambda b, h, iq, ik: (b, (h * hp) // group, remap_k(iq, ik), 0)
        kv_block = (1, 1, block_k, D)
    else:
        # Non-shared: either MHA (group == 1, block covers hp own kv heads)
        # or hp == 1 GQA (block index is the kv head h // group).
        kv_index = lambda b, h, iq, ik: (b, h // group, remap_k(iq, ik), 0)
        kv_block = (1, hp, block_k, D)

    def kv_mask_index(b, h, iq, ik):
        return (b, 0, remap_k(iq, ik))

    in_specs = [
        pl.BlockSpec((1, hp, block_q, D), lambda b, h, iq, ik: (b, h, iq, 0)),
        pl.BlockSpec(kv_block, kv_index),
        pl.BlockSpec(kv_block, kv_index),
    ]
    inputs = [q, k, v]
    if kv_mask is not None:
        kvm = jnp.broadcast_to(
            kv_mask.astype(jnp.int32)[:, None, :], (B, SUBLANES, Skv)
        )
        in_specs.append(pl.BlockSpec((1, SUBLANES, block_k), kv_mask_index))
        inputs.append(kvm)

    def kernel(*refs):
        if kv_mask is None:
            refs = refs[:3] + (None,) + refs[3:]
        _fwd_kernel(
            *refs,
            sm_scale=sm_scale, causal=causal, offset=offset,
            block_q=block_q, block_k=block_k,
            head_pack=hp, kv_shared=kv_shared,
        )

    out_shape = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((B, H, Sq, LANES), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, hp, block_q, D), lambda b, h, iq, ik: (b, h, iq, 0)),
        pl.BlockSpec((1, hp, block_q, LANES), lambda b, h, iq, ik: (b, h, iq, 0)),
    ]
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((hp, block_q, LANES), jnp.float32),
            pltpu.VMEM((hp, block_q, LANES), jnp.float32),
            pltpu.VMEM((hp, block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    return o, lse


# ======================================================================
# Backward: dq
# ======================================================================
def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, kv_mask_ref,
    dq_ref,
    dq_scr,
    *, sm_scale, causal, offset, block_q, block_k, head_pack, kv_shared,
):
    # Like the forward, ``head_pack`` q heads run as independent chains per
    # grid step so Mosaic can overlap one head's MXU dots with the other's
    # VPU softmax/elementwise work.
    iq, ik = pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    should_run = (
        _below_or_on_diag(iq, block_q, ik, block_k, offset) if causal else True
    )

    def _compute_body(build_causal_mask: bool):
        kv_blk = kv_mask_ref[0, :1, :] if kv_mask_ref is not None else None
        mask = _block_mask(iq, ik, block_q, block_k, offset,
                           causal and build_causal_mask, kv_blk)

        for a in range(head_pack):
            q = q_ref[0, a]
            k = k_ref[0, 0 if kv_shared else a]
            v = v_ref[0, 0 if kv_shared else a]
            do = do_ref[0, a]
            lse = lse_ref[0, a]   # (block_q, LANES) replicated
            di = di_ref[0, a]

            s = lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * (sm_scale * LOG2_E)
            if mask is not None:
                s = jnp.where(mask, s, MASK_VALUE)

            p = jnp.exp2(s - lse[:, :1])
            if mask is not None and (
                kv_mask_ref is not None or offset < 0 or not causal
            ):
                p = jnp.where(mask, p, 0.0)

            dp = lax.dot_general(
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = p * (dp - di[:, :1]) * sm_scale
            dq_scr[a] += lax.dot_general(
                ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    if causal:
        # diagonal split as in the forward: below-diagonal blocks skip
        # the causal mask build/apply (kv padding mask still applies)
        full_valid = (iq * block_q + offset) >= ((ik + 1) * block_k - 1)

        @pl.when(should_run & full_valid)
        def _compute_below_diag():
            _compute_body(False)

        @pl.when(should_run & jnp.logical_not(full_valid))
        def _compute_diag():
            _compute_body(True)
    else:

        @pl.when(should_run)
        def _compute():
            _compute_body(True)

    @pl.when(ik == nk - 1)
    def _finalize():
        for a in range(head_pack):
            dq_ref[0, a] = dq_scr[a].astype(dq_ref.dtype)


# ======================================================================
# Backward: dk, dv
# ======================================================================
def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, kv_mask_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, sm_scale, causal, offset, block_q, block_k,
):
    # grid: (B, Hkv, nk, G, nq) — accumulate over grouped q heads and q blocks
    ik = pl.program_id(2)
    g, iq = pl.program_id(3), pl.program_id(4)
    n_g, nq = pl.num_programs(3), pl.num_programs(4)

    @pl.when(jnp.logical_and(g == 0, iq == 0))
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    should_run = (
        _below_or_on_diag(iq, block_q, ik, block_k, offset) if causal else True
    )

    def _compute_body(build_causal_mask: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        di = di_ref[0, 0]

        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (sm_scale * LOG2_E)
        kv_blk = kv_mask_ref[0, :1, :] if kv_mask_ref is not None else None
        mask = _block_mask(iq, ik, block_q, block_k, offset,
                           causal and build_causal_mask, kv_blk)
        if mask is not None:
            s = jnp.where(mask, s, MASK_VALUE)

        p = jnp.exp2(s - lse[:, :1])
        if mask is not None and (
            kv_mask_ref is not None or offset < 0 or not causal
        ):
            p = jnp.where(mask, p, 0.0)

        # dv += p^T @ do
        dv_scr[...] += lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di[:, :1]) * sm_scale
        # dk += ds^T @ q
        dk_scr[...] += lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        full_valid = (iq * block_q + offset) >= ((ik + 1) * block_k - 1)

        @pl.when(should_run & full_valid)
        def _compute_below_diag():
            _compute_body(False)

        @pl.when(should_run & jnp.logical_not(full_valid))
        def _compute_diag():
            _compute_body(True)
    else:

        @pl.when(should_run)
        def _compute():
            _compute_body(True)

    @pl.when(jnp.logical_and(g == n_g - 1, iq == nq - 1))
    def _finalize():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


# ======================================================================
# custom_vjp plumbing
# ======================================================================
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash(q, k, v, kv_mask, causal, sm_scale, offset, block_q, block_k, interpret):
    o, _ = _fwd(q, k, v, kv_mask, causal, sm_scale, offset, block_q, block_k, interpret)
    return o


def _flash_fwd(q, k, v, kv_mask, causal, sm_scale, offset, block_q, block_k, interpret):
    o, lse = _fwd(q, k, v, kv_mask, causal, sm_scale, offset, block_q, block_k, interpret)
    return o, (q, k, v, kv_mask, o, lse)


def _flash_bwd(causal, sm_scale, offset, block_q, block_k, interpret, res, do):
    q, k, v, kv_mask, o, lse = res
    B, H, Sq, D = q.shape
    _, Hkv, Skv, _ = k.shape
    group = H // Hkv
    nq, nk = Sq // block_q, Skv // block_k

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[..., None], (B, H, Sq, LANES))

    kv_mask_in = None
    if kv_mask is not None:
        kv_mask_in = jnp.broadcast_to(
            kv_mask.astype(jnp.int32)[:, None, :], (B, SUBLANES, Skv)
        )

    def remap_k(iq, ik):
        if causal:
            return lax.select(
                _below_or_on_diag(iq, block_q, ik, block_k, offset), ik, 0
            )
        return ik

    # ---------------- dq ----------------
    hp, kv_shared = _head_pack(H, group)

    if kv_shared:
        kv_index = lambda b, h, iq, ik: (b, (h * hp) // group, remap_k(iq, ik), 0)
        kv_block = (1, 1, block_k, D)
    else:
        kv_index = lambda b, h, iq, ik: (b, h // group, remap_k(iq, ik), 0)
        kv_block = (1, hp, block_k, D)

    def kv_mask_index(b, h, iq, ik):
        return (b, 0, remap_k(iq, ik))

    q_index = lambda b, h, iq, ik: (b, h, iq, 0)

    dq_in_specs = [
        pl.BlockSpec((1, hp, block_q, D), q_index),
        pl.BlockSpec(kv_block, kv_index),
        pl.BlockSpec(kv_block, kv_index),
        pl.BlockSpec((1, hp, block_q, D), q_index),
        pl.BlockSpec((1, hp, block_q, LANES), q_index),
        pl.BlockSpec((1, hp, block_q, LANES), q_index),
    ]
    dq_inputs = [q, k, v, do, lse, di]
    if kv_mask_in is not None:
        dq_in_specs.append(pl.BlockSpec((1, SUBLANES, block_k), kv_mask_index))
        dq_inputs.append(kv_mask_in)

    def dq_kernel(*refs):
        if kv_mask_in is None:
            refs = refs[:6] + (None,) + refs[6:]
        _dq_kernel(
            *refs,
            sm_scale=sm_scale, causal=causal, offset=offset,
            block_q=block_q, block_k=block_k,
            head_pack=hp, kv_shared=kv_shared,
        )

    dq = pl.pallas_call(
        dq_kernel,
        grid=(B, H // hp, nq, nk),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, hp, block_q, D), q_index),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((hp, block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*dq_inputs)

    # ---------------- dk/dv ----------------
    # grid: (B, Hkv, nk, G, nq); q head = kvh * group + g
    def remap_q(ik, iq):
        if causal:
            # first valid q block for this kv column
            first_valid = (ik * block_k - offset) // block_q
            first_valid = jnp.clip(first_valid, 0, nq - 1)
            return lax.select(
                _below_or_on_diag(iq, block_q, ik, block_k, offset),
                iq, first_valid,
            )
        return iq

    qh_index = lambda b, kvh, ik, g, iq: (b, kvh * group + g, remap_q(ik, iq), 0)
    kv2_index = lambda b, kvh, ik, g, iq: (b, kvh, ik, 0)
    kvm2_index = lambda b, kvh, ik, g, iq: (b, 0, ik)

    dkv_in_specs = [
        pl.BlockSpec((1, 1, block_q, D), qh_index),
        pl.BlockSpec((1, 1, block_k, D), kv2_index),
        pl.BlockSpec((1, 1, block_k, D), kv2_index),
        pl.BlockSpec((1, 1, block_q, D), qh_index),
        pl.BlockSpec((1, 1, block_q, LANES), qh_index),
        pl.BlockSpec((1, 1, block_q, LANES), qh_index),
    ]
    dkv_inputs = [q, k, v, do, lse, di]
    if kv_mask_in is not None:
        dkv_in_specs.append(pl.BlockSpec((1, SUBLANES, block_k), kvm2_index))
        dkv_inputs.append(kv_mask_in)

    def dkv_kernel(*refs):
        if kv_mask_in is None:
            refs = refs[:6] + (None,) + refs[6:]
        _dkv_kernel(
            *refs,
            sm_scale=sm_scale, causal=causal, offset=offset,
            block_q=block_q, block_k=block_k,
        )

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B, Hkv, nk, group, nq),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), kv2_index),
            pl.BlockSpec((1, 1, block_k, D), kv2_index),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary", "arbitrary",
            ),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*dkv_inputs)

    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


# ======================================================================
# Public entry point
# ======================================================================
def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
    causal_offset: Optional[int] = None,
) -> jax.Array:
    """Flash attention with automatic padding to kernel tile constraints.

    See module docstring for the shape contract. ``causal_offset`` overrides
    the default end-alignment (q global position = local + offset); prefill
    into a longer cache passes 0.
    """
    B, H, Sq, D = q.shape
    _, Hkv, Skv, Dk = k.shape
    assert D == Dk and v.shape == k.shape
    assert H % Hkv == 0, f"GQA requires H % Hkv == 0, got {H=} {Hkv=}"
    if sm_scale is None:
        sm_scale = D ** -0.5

    # Tuned on v5e (S=4096, D=128): 1024x1024 blocks reach 44 TFLOP/s fwd
    # vs 35 at 512 and 10.5 at 128; larger head dims fall back to 512 to
    # stay inside VMEM.
    if block_q is None:
        block_q = 1024 if D <= LANES else 512
    if block_k is None:
        block_k = 1024 if D <= LANES else 512

    block_q = min(block_q, _round_up(Sq, SUBLANES))
    block_k = min(block_k, _round_up(Skv, LANES))

    Sq_p = _round_up(Sq, block_q)
    Skv_p = _round_up(Skv, block_k)
    D_p = D if D == 64 else _round_up(D, LANES)

    # causal alignment: q global position = local + (Skv - Sq), computed on
    # ORIGINAL lengths; q/k padding goes at the end and is masked off.
    offset = (Skv - Sq) if causal_offset is None else int(causal_offset)

    needs_kv_pad = Skv_p != Skv
    if needs_kv_pad and kv_mask is None:
        kv_mask = jnp.ones((B, Skv), dtype=jnp.int32)

    if Sq_p != Sq or D_p != D:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, D_p - D)))
    if needs_kv_pad or D_p != D:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, D_p - D)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, D_p - D)))
    if kv_mask is not None and Skv_p != Skv:
        kv_mask = jnp.pad(kv_mask.astype(jnp.int32), ((0, 0), (0, Skv_p - Skv)))

    out = _flash(
        q, k, v, kv_mask, causal, float(sm_scale), offset, block_q, block_k,
        interpret,
    )
    if Sq_p != Sq or D_p != D:
        out = out[:, :, :Sq, :D]
    return out
