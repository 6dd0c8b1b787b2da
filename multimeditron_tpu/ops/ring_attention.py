"""Ring attention over a sequence-parallel mesh axis (TPU, ICI).

Long-context attention where activations stay sharded along the sequence
axis: each device holds its (B, H, S/n, D) slice of q/k/v, and k/v
shards travel around the ring (one `lax.ppermute` hop per step — nearest
-neighbour traffic that rides ICI) while every device accumulates its
queries' attention over the full sequence with an online-softmax merge.
Peak memory per device stays O(S/n); no device ever materializes the
full K/V.

Builds on the first-party flash kernels (`ops/flash_attention.py`):

- forward: per ring step the existing `_fwd` kernel produces a partial
  (o_j, lse_j) for this device's queries against the visiting k/v shard;
  partials merge online in f32 (the standard m/l rescale — exactly the
  math the flash kernel itself uses across kv blocks).
- backward: softmax gradients decompose additively per kv shard GIVEN
  the global logsumexp and delta = sum(o*do), so the custom VJP replays
  the ring calling the flash `_flash_bwd` kernels per step with the
  *global* lse: dq accumulates locally; dk/dv accumulate on the carry
  and travel the full ring back to their owner.

Causality across shards falls into three static classes per step
(diagonal shard -> causal kernel with offset 0; past shard -> full
attention; future shard -> no contribution), so the kernels never need a
device-dependent static offset: future shards are computed and gated to
zero weight. This plain (non-zigzag) layout therefore does up to 2x the
causal-optimal FLOPs on the gated half of the ring — the standard
trade-off of un-permuted ring attention; a zigzag layout can remove it
later without changing this API.

The reference framework has no long-context story beyond truncation
(`/root/reference/src/multimeditron/model/model.py` max_sequence_length);
this op is beyond-parity, complementing the DeepSpeed-Ulysses-style
`sequence_parallel` path (all-to-all, S must fit per-device after the
head split) with a true O(S/n)-memory alternative.

Usage (inside shard_map over the "sp" axis):

    out = ring_attention(q_shard, k_shard, v_shard, axis_name="sp",
                         causal=True)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from multimeditron_tpu.ops.flash_attention import (
    LANES,
    MASK_VALUE,
    _flash_bwd,
    _fwd,
    _round_up,
)


def _merge(m, w, acc, lse_j, o_j, gate):
    """Online-softmax merge of one partial (o_j, lse_j) into the carry.

    m: running max-lse (B, H, L, LANES); w: running sum of 2^(lse - m);
    acc: running sum of o_j * 2^(lse_j - m) in f32. ``gate`` (0/1 f32
    scalar) zeroes the contribution of future (causal-masked) shards.
    """
    lse_j = jnp.where(gate > 0, lse_j, MASK_VALUE)
    m_new = jnp.maximum(m, lse_j)
    # Rows with no valid key yet keep m == m_new == MASK_VALUE; a naive
    # exp2(lse_j - m_new) would then be exp2(0) = 1 for a gated/empty
    # partial, admitting its (ungated-garbage) o_j into acc. Weight only
    # REAL partials: lse_j > MASK_VALUE/2 means the kernel saw >=1 valid
    # key (real lse magnitudes are nowhere near -1e38).
    alpha = jnp.exp2(m - m_new)
    wj = jnp.where(lse_j > MASK_VALUE * 0.5,
                   jnp.exp2(lse_j - m_new), 0.0)
    w_new = w * alpha + wj
    acc_new = acc * alpha[..., :1] + o_j.astype(jnp.float32) * wj[..., :1]
    return m_new, w_new, acc_new


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10)
)
def _ring(q, k, v, kv_mask, axis_name, n, causal, sm_scale, block_q,
          block_k, interpret):
    out, _ = _ring_fwd(q, k, v, kv_mask, axis_name, n, causal, sm_scale,
                       block_q, block_k, interpret)
    return out


def _ring_steps(q, k, v, kv_mask, axis_name, n, causal, sm_scale,
                block_q, block_k, interpret):
    """Shared fwd loop returning global (o, lse). kv_mask (B, L) rides
    the ring alongside its k/v shard."""
    B, H, L, D = q.shape
    idx = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    mask0 = (jnp.ones((B, L), jnp.int32) if kv_mask is None
             else kv_mask.astype(jnp.int32))

    # step 0: the diagonal shard — true causal geometry, static offset 0.
    o0, lse0 = _fwd(q, k, v, kv_mask, causal, sm_scale, 0, block_q,
                    block_k, interpret)
    m = jnp.full((B, H, L, LANES), MASK_VALUE, jnp.float32)
    w = jnp.zeros((B, H, L, LANES), jnp.float32)
    acc = jnp.zeros((B, H, L, D), jnp.float32)
    m, w, acc = _merge(m, w, acc, lse0, o0, jnp.float32(1.0))

    def step(carry, t):
        k_cur, v_cur, mask_cur, m, w, acc = carry
        k_cur = lax.ppermute(k_cur, axis_name, perm)
        v_cur = lax.ppermute(v_cur, axis_name, perm)
        mask_cur = lax.ppermute(mask_cur, axis_name, perm)
        # at step t this device holds the k/v shard of device (idx - t).
        if causal:
            gate = (t <= idx).astype(jnp.float32)
        else:
            gate = jnp.float32(1.0)
        o_j, lse_j = _fwd(q, k_cur, v_cur,
                          mask_cur if kv_mask is not None else None,
                          False, sm_scale, 0, block_q, block_k, interpret)
        m, w, acc = _merge(m, w, acc, lse_j, o_j, gate)
        return (k_cur, v_cur, mask_cur, m, w, acc), None

    if n > 1:
        (k_cur, v_cur, mask_cur, m, w, acc), _ = lax.scan(
            step, (k, v, mask0, m, w, acc), jnp.arange(1, n))
    w_safe = jnp.maximum(w, 1e-30)
    out = jnp.where(w[..., :1] > 0, acc / w_safe[..., :1], 0.0)
    lse = jnp.where(w > 0, m + jnp.log2(w_safe), MASK_VALUE)
    return out.astype(q.dtype), lse


def _ring_fwd(q, k, v, kv_mask, axis_name, n, causal, sm_scale, block_q,
              block_k, interpret):
    out, lse = _ring_steps(q, k, v, kv_mask, axis_name, n, causal,
                           sm_scale, block_q, block_k, interpret)
    return out, (q, k, v, kv_mask, out, lse)


def _ring_bwd(axis_name, n, causal, sm_scale, block_q, block_k, interpret,
              res, do):
    q, k, v, kv_mask, out, lse = res
    # Sanitize rows with NO valid key anywhere (global lse == MASK_VALUE,
    # e.g. left-padded causal batches): replaying _flash_bwd with that lse
    # gives p = exp2(s - MASK_VALUE) = inf and NaNs that the dk/dv ring
    # would spread to every device. Push their lse to +big so p underflows
    # to exactly 0 in-kernel, and zero their do rows (delta = 0) — those
    # rows then contribute zero to dq/dk/dv on every shard.
    dead = lse <= MASK_VALUE * 0.5  # (B, H, L, LANES)
    lse = jnp.where(dead, jnp.float32(1e30), lse)
    do = jnp.where(dead[..., :1], 0.0, do).astype(do.dtype)
    idx = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    mask0 = (jnp.ones(k.shape[::2], jnp.int32).reshape(k.shape[0], k.shape[2])
             if kv_mask is None else kv_mask.astype(jnp.int32))

    # diagonal shard: causal kernel, static offset 0.
    dq, dk0, dv0 = _flash_bwd(
        causal, sm_scale, 0, block_q, block_k, interpret,
        (q, k, v, kv_mask, out, lse), do)[:3]

    def step(carry, t):
        k_cur, v_cur, mask_cur, dk_acc, dv_acc, dq_acc = carry
        # dk/dv accumulators travel WITH their shard so each lands back
        # on its owner after the full circle.
        k_cur = lax.ppermute(k_cur, axis_name, perm)
        v_cur = lax.ppermute(v_cur, axis_name, perm)
        mask_cur = lax.ppermute(mask_cur, axis_name, perm)
        dk_acc = lax.ppermute(dk_acc, axis_name, perm)
        dv_acc = lax.ppermute(dv_acc, axis_name, perm)
        gate = (t <= idx) if causal else jnp.bool_(True)
        dq_j, dk_j, dv_j = _flash_bwd(
            False, sm_scale, 0, block_q, block_k, interpret,
            (q, k_cur, v_cur,
             mask_cur if kv_mask is not None else None, out, lse), do)[:3]
        # where-gate, not multiply: a gated shard's replay can contain
        # inf/NaN (future keys never entered the forward lse) and
        # 0 * inf = NaN would poison the accumulator.
        dq_acc = dq_acc + jnp.where(gate, dq_j.astype(jnp.float32), 0.0)
        dk_acc = dk_acc + jnp.where(gate, dk_j.astype(jnp.float32), 0.0)
        dv_acc = dv_acc + jnp.where(gate, dv_j.astype(jnp.float32), 0.0)
        return (k_cur, v_cur, mask_cur, dk_acc, dv_acc, dq_acc), None

    dq_acc = dq.astype(jnp.float32)
    dk_acc = dk0.astype(jnp.float32)
    dv_acc = dv0.astype(jnp.float32)
    if n > 1:
        (k_cur, v_cur, mask_cur, dk_acc, dv_acc, dq_acc), _ = lax.scan(
            step, (k, v, mask0, dk_acc, dv_acc, dq_acc), jnp.arange(1, n))
        # after n-1 hops the accumulators sit one hop short of home.
        dk_acc = lax.ppermute(dk_acc, axis_name, perm)
        dv_acc = lax.ppermute(dv_acc, axis_name, perm)
    return (dq_acc.astype(q.dtype), dk_acc.astype(k.dtype),
            dv_acc.astype(v.dtype), None)


_ring.defvjp(_ring_fwd, _ring_bwd)


# ======================================================================
# Zigzag layout: reclaim the gated-future-shard FLOPs
# ======================================================================
# Plain-ring causal attention computes every visiting shard and GATES
# future ones to zero weight, so each of the n steps costs one full
# shard-pair attention on some device while the gated devices idle in
# the collective — up to 2x the causal-optimal FLOPs. The zigzag layout
# splits the sequence into 2n chunks and gives device i chunks
# (i, 2n-1-i): at every ring step EVERY device then has exactly two
# live chunk-pairs (one unconditional, one picked by a lax.cond on the
# rank comparison), each 1/4 the shard-pair work — total 2 * C^2 per
# step vs 4 * C^2 for the plain ring, i.e. the causal-optimal schedule
# with perfect load balance. Requires an even ring size (odd n falls
# back to the plain ring).


def _zig_perms(n: int):
    """(perm_a, perm_b) moving local contiguous chunk slots 0/1 into the
    zigzag layout. Contiguous: device i holds global chunks (2i, 2i+1);
    zigzag: device d holds (d, 2n-1-d). Receiver parity decides which
    incoming array is its slot 0 (even: perm_a's) vs slot 1."""
    perm_a = [(i, 2 * i) if i < n // 2 else (i, 2 * n - 1 - 2 * i)
              for i in range(n)]
    perm_b = [(i, 2 * i + 1) if i < n // 2 else (i, 2 * n - 2 - 2 * i)
              for i in range(n)]
    return perm_a, perm_b


def _zig_relayout(x, axis_name, n, axis=-2):
    """Contiguous -> zigzag chunk relayout along ``axis``."""
    C = x.shape[axis] // 2
    lo = lax.slice_in_dim(x, 0, C, axis=axis)
    hi = lax.slice_in_dim(x, C, 2 * C, axis=axis)
    perm_a, perm_b = _zig_perms(n)
    a = lax.ppermute(lo, axis_name, perm_a)
    b = lax.ppermute(hi, axis_name, perm_b)
    even = (lax.axis_index(axis_name) % 2) == 0
    zlo = jnp.where(even, a, b)
    zhi = jnp.where(even, b, a)
    return zlo, zhi


def _zig_unlayout(zlo, zhi, axis_name, n, axis=-2):
    """Zigzag -> contiguous inverse relayout: four half-permutations
    (a ppermute is one-to-one, and each zig slot fans out to both
    contiguous slots depending on the sender's parity); non-destination
    devices receive zeros, so the pair of halves just adds."""
    def half(x, pairs):
        return lax.ppermute(x, axis_name, pairs)

    ne = [j for j in range(n) if j % 2 == 0]
    no = [j for j in range(n) if j % 2 == 1]
    # zig slot0 of device j holds global chunk j -> contiguous device
    # j//2, slot j%2; zig slot1 holds chunk 2n-1-j -> device (2n-1-j)//2,
    # slot (2n-1-j)%2.
    lo = (half(zlo, [(j, j // 2) for j in ne])
          + half(zhi, [(j, n - (j + 1) // 2) for j in no]))
    hi = (half(zlo, [(j, j // 2) for j in no])
          + half(zhi, [(j, n - 1 - j // 2) for j in ne]))
    return jnp.concatenate([lo, hi], axis=axis)


def _zig_pair(q, k, v, mask, sm_scale, block_q, block_k,
              interpret, causal):
    o, lse = _fwd(q, k, v, mask, causal, sm_scale,
                  0, block_q, block_k, interpret)
    return o, lse


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9)
)
def _zig(q, k, v, kv_mask, axis_name, n, sm_scale, block_q, block_k,
         interpret):
    out, _ = _zig_fwd(q, k, v, kv_mask, axis_name, n, sm_scale, block_q,
                      block_k, interpret)
    return out


def _zig_fwd(q, k, v, kv_mask, axis_name, n, sm_scale, block_q, block_k,
             interpret):
    B, H, L, D = q.shape
    idx = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    q_lo, q_hi = _zig_relayout(q, axis_name, n)
    k_lo, k_hi = _zig_relayout(k, axis_name, n)
    v_lo, v_hi = _zig_relayout(v, axis_name, n)
    # absent mask -> all-ones placeholder: it rides the ring and feeds
    # both fwd and bwd uniformly (a ZEROS placeholder would read as
    # "every key invalid" in the backward replay)
    mask_full = (jnp.ones((B, L), jnp.int32) if kv_mask is None
                 else kv_mask.astype(jnp.int32))
    m_lo, m_hi = _zig_relayout(mask_full, axis_name, n, axis=-1)

    C = L // 2
    pair = functools.partial(
        _zig_pair, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, interpret=interpret)

    def fresh():
        return (jnp.full((B, H, C, LANES), MASK_VALUE, jnp.float32),
                jnp.zeros((B, H, C, LANES), jnp.float32),
                jnp.zeros((B, H, C, D), jnp.float32))

    acc_lo, acc_hi = fresh(), fresh()
    one = jnp.float32(1.0)

    # step 0: local chunks — lo diag (causal), hi vs lo (full), hi diag.
    o, lse = pair(q_lo, k_lo, v_lo, m_lo, causal=True)
    acc_lo = _merge(*acc_lo, lse, o, one)
    o, lse = pair(q_hi, k_lo, v_lo, m_lo, causal=False)
    acc_hi = _merge(*acc_hi, lse, o, one)
    o, lse = pair(q_hi, k_hi, v_hi, m_hi, causal=True)
    acc_hi = _merge(*acc_hi, lse, o, one)

    def step(carry, t):
        k_lo, v_lo, m_lo, k_hi, v_hi, m_hi, acc_lo, acc_hi = carry
        k_lo, v_lo, m_lo, k_hi, v_hi, m_hi = (
            lax.ppermute(a, axis_name, perm)
            for a in (k_lo, v_lo, m_lo, k_hi, v_hi, m_hi))
        # the visiting shard belongs to device j = idx - t (mod n),
        # holding global chunks (j, 2n-1-j)
        # unconditional pair: q_hi (chunk 2n-1-idx) vs visiting lo
        # (chunk j < n <= 2n-1-idx): always causally live, full kernel.
        o2, lse2 = pair(q_hi, k_lo, v_lo, m_lo, causal=False)
        acc_hi_n = _merge(*acc_hi, lse2, o2, one)
        # conditional pair, balanced by construction: exactly one of
        # {q_lo vs visiting-lo (j < idx), q_hi vs visiting-hi (j > idx)}
        # is live — lax.cond executes only the live kernel.
        sel = t <= idx  # j = idx - t >= 0 (no wraparound) => j < idx

        def lo_branch(_):
            return pair(q_lo, k_lo, v_lo, m_lo, causal=False)

        def hi_branch(_):
            return pair(q_hi, k_hi, v_hi, m_hi, causal=False)

        oc, lsec = lax.cond(sel, lo_branch, hi_branch, None)
        g = sel.astype(jnp.float32)
        acc_lo_n = _merge(*acc_lo, lsec, oc, g)
        acc_hi_n = _merge(*acc_hi_n, lsec, oc, one - g)
        return (k_lo, v_lo, m_lo, k_hi, v_hi, m_hi,
                acc_lo_n, acc_hi_n), None

    if n > 1:
        (k_lo, v_lo, m_lo, k_hi, v_hi, m_hi, acc_lo, acc_hi), _ = lax.scan(
            step, (k_lo, v_lo, m_lo, k_hi, v_hi, m_hi, acc_lo, acc_hi),
            jnp.arange(1, n))

    def finish(m, w, acc):
        w_safe = jnp.maximum(w, 1e-30)
        out = jnp.where(w[..., :1] > 0, acc / w_safe[..., :1], 0.0)
        lse = jnp.where(w > 0, m + jnp.log2(w_safe), MASK_VALUE)
        return out.astype(q.dtype), lse

    o_lo, lse_lo = finish(*acc_lo)
    o_hi, lse_hi = finish(*acc_hi)
    out = _zig_unlayout(o_lo, o_hi, axis_name, n)
    res = (q_lo, q_hi, k_lo, v_lo, m_lo, k_hi, v_hi, m_hi,
           o_lo, o_hi, lse_lo, lse_hi)
    return out, res


def _zig_bwd(axis_name, n, sm_scale, block_q, block_k, interpret, res, do):
    (q_lo, q_hi, k_lo, v_lo, m_lo, k_hi, v_hi, m_hi,
     o_lo, o_hi, lse_lo, lse_hi) = res
    # NOTE: k/v/m arrived home after the forward's full ring (n-1 hops
    # land them one short; the scan left them mid-ring only if n > 1 —
    # re-derive: after n-1 permutes a shard sits at (owner + n-1) mod n,
    # one hop short of home. Push them the final hop so each device
    # again holds ITS OWN zig chunks.
    perm = [(i, (i + 1) % n) for i in range(n)]
    if n > 1:
        k_lo, v_lo, m_lo, k_hi, v_hi, m_hi = (
            lax.ppermute(a, axis_name, perm)
            for a in (k_lo, v_lo, m_lo, k_hi, v_hi, m_hi))
    idx = lax.axis_index(axis_name)

    # sanitize dead rows (no valid key anywhere) exactly as the plain
    # ring backward does
    def sanitize(lse, do_c, o_c):
        dead = lse <= MASK_VALUE * 0.5
        lse = jnp.where(dead, jnp.float32(1e30), lse)
        do_c = jnp.where(dead[..., :1], 0.0, do_c).astype(do_c.dtype)
        return lse, do_c, o_c

    do_lo, do_hi = _zig_relayout(do, axis_name, n)
    lse_lo, do_lo, o_lo = sanitize(lse_lo, do_lo, o_lo)
    lse_hi, do_hi, o_hi = sanitize(lse_hi, do_hi, o_hi)

    def bwd_pair(qc, kc, vc, mc, oc, lsec, doc, causal):
        return _flash_bwd(
            causal, sm_scale, 0, block_q, block_k, interpret,
            (qc, kc, vc, mc, oc, lsec), doc)[:3]

    f32 = lambda a: a.astype(jnp.float32)

    # step 0: local pairs
    dq1, dk1, dv1 = bwd_pair(q_lo, k_lo, v_lo, m_lo, o_lo, lse_lo, do_lo,
                             True)
    dq2, dk2, dv2 = bwd_pair(q_hi, k_lo, v_lo, m_lo, o_hi, lse_hi, do_hi,
                             False)
    dq3, dk3, dv3 = bwd_pair(q_hi, k_hi, v_hi, m_hi, o_hi, lse_hi, do_hi,
                             True)
    dq_lo = f32(dq1)
    dq_hi = f32(dq2) + f32(dq3)
    dk_lo_acc = f32(dk1) + f32(dk2)
    dv_lo_acc = f32(dv1) + f32(dv2)
    dk_hi_acc = f32(dk3)
    dv_hi_acc = f32(dv3)

    def step(carry, t):
        (k_lo, v_lo, m_lo, k_hi, v_hi, m_hi,
         dk_lo_acc, dv_lo_acc, dk_hi_acc, dv_hi_acc,
         dq_lo, dq_hi) = carry
        k_lo, v_lo, m_lo, k_hi, v_hi, m_hi = (
            lax.ppermute(a, axis_name, perm)
            for a in (k_lo, v_lo, m_lo, k_hi, v_hi, m_hi))
        dk_lo_acc, dv_lo_acc, dk_hi_acc, dv_hi_acc = (
            lax.ppermute(a, axis_name, perm)
            for a in (dk_lo_acc, dv_lo_acc, dk_hi_acc, dv_hi_acc))
        # unconditional: q_hi vs visiting lo
        dq2, dk2, dv2 = bwd_pair(q_hi, k_lo, v_lo, m_lo, o_hi, lse_hi,
                                 do_hi, False)
        dq_hi = dq_hi + f32(dq2)
        dk_lo_acc = dk_lo_acc + f32(dk2)
        dv_lo_acc = dv_lo_acc + f32(dv2)
        sel = t <= idx

        def lo_branch(_):
            return bwd_pair(q_lo, k_lo, v_lo, m_lo, o_lo, lse_lo, do_lo,
                            False)

        def hi_branch(_):
            return bwd_pair(q_hi, k_hi, v_hi, m_hi, o_hi, lse_hi, do_hi,
                            False)

        dqc, dkc, dvc = lax.cond(sel, lo_branch, hi_branch, None)
        # where-gate (NOT multiply): the dead branch's values are live
        # here — cond ran exactly one kernel — but route by sel.
        dq_lo = dq_lo + jnp.where(sel, f32(dqc), 0.0)
        dq_hi = dq_hi + jnp.where(sel, 0.0, f32(dqc))
        dk_lo_acc = dk_lo_acc + jnp.where(sel, f32(dkc), 0.0)
        dv_lo_acc = dv_lo_acc + jnp.where(sel, f32(dvc), 0.0)
        dk_hi_acc = dk_hi_acc + jnp.where(sel, 0.0, f32(dkc))
        dv_hi_acc = dv_hi_acc + jnp.where(sel, 0.0, f32(dvc))
        return (k_lo, v_lo, m_lo, k_hi, v_hi, m_hi,
                dk_lo_acc, dv_lo_acc, dk_hi_acc, dv_hi_acc,
                dq_lo, dq_hi), None

    if n > 1:
        (k_lo, v_lo, m_lo, k_hi, v_hi, m_hi,
         dk_lo_acc, dv_lo_acc, dk_hi_acc, dv_hi_acc,
         dq_lo, dq_hi), _ = lax.scan(
            step,
            (k_lo, v_lo, m_lo, k_hi, v_hi, m_hi,
             dk_lo_acc, dv_lo_acc, dk_hi_acc, dv_hi_acc, dq_lo, dq_hi),
            jnp.arange(1, n))
        # accumulators sit one hop short of home after n-1 hops
        dk_lo_acc, dv_lo_acc, dk_hi_acc, dv_hi_acc = (
            lax.ppermute(a, axis_name, perm)
            for a in (dk_lo_acc, dv_lo_acc, dk_hi_acc, dv_hi_acc))

    dq = _zig_unlayout(dq_lo, dq_hi, axis_name, n)
    dk = _zig_unlayout(dk_lo_acc, dk_hi_acc, axis_name, n)
    dv = _zig_unlayout(dv_lo_acc, dv_hi_acc, axis_name, n)
    return (dq.astype(q_lo.dtype), dk.astype(k_lo.dtype),
            dv.astype(v_lo.dtype), None)


_zig.defvjp(_zig_fwd, _zig_bwd)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    kv_mask: Optional[jax.Array] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    zigzag: Optional[bool] = None,
) -> jax.Array:
    """Ring attention for sequence-sharded q/k/v (call inside shard_map).

    q, k, v: (B, H, L, D) per-device shards, L = S / n over ``axis_name``.
    The sequence must be evenly sharded and identically laid out for
    q and k/v (shard i holds global positions [i*L, (i+1)*L)).
    ``kv_mask`` (B, L) per-device shard of the key validity mask (1 =
    attend) for left/right-padded batches; it travels the ring with its
    k/v shard.

    ``zigzag`` (default: auto) picks the load-balanced layout for causal
    rings with an even size: each device holds sequence chunks
    (i, 2n-1-i), so every ring step runs exactly two quarter-size
    kernels instead of one gated full-shard kernel — half the FLOPs,
    the causal-optimal schedule. Internal relayout; the external
    contiguous-shard contract is unchanged.
    """
    B, H, L, D = q.shape
    if sm_scale is None:
        sm_scale = D ** -0.5
    n = lax.psum(1, axis_name)
    if not isinstance(n, int):
        # inside shard_map the axis size is static
        n = int(n)
    Dp = _round_up(D, 128)
    if Dp != D:
        pad = [(0, 0)] * 3 + [(0, Dp - D)]
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))

    C = L // 2
    zig_ok = (causal and n > 1 and n % 2 == 0 and L % 2 == 0
              and C % min(block_q, _round_up(C, 128)) == 0
              and C % min(block_k, _round_up(C, 128)) == 0)
    if zigzag is None:
        zigzag = zig_ok
    elif zigzag and not zig_ok:
        raise ValueError(
            f"zigzag requires causal, even ring size and chunkable L "
            f"(got causal={causal} n={n} L={L} q{q.shape} k{k.shape})")

    if zigzag:
        bq = min(block_q, _round_up(C, 128))
        bk = min(block_k, _round_up(C, 128))
        out = _zig(q, k, v, kv_mask, axis_name, n, sm_scale, bq, bk,
                   interpret)
        return out[..., :D] if Dp != D else out

    block_q = min(block_q, _round_up(L, 128))
    block_k = min(block_k, _round_up(L, 128))
    if L % block_q or L % block_k:
        raise ValueError(
            f"per-device sequence {L} must be a multiple of the block "
            f"sizes ({block_q}, {block_k})")
    out = _ring(q, k, v, kv_mask, axis_name, n, causal, sm_scale,
                block_q, block_k, interpret)
    return out[..., :D] if Dp != D else out
