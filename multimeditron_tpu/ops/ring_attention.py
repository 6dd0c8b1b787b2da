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
) -> jax.Array:
    """Ring attention for sequence-sharded q/k/v (call inside shard_map).

    q, k, v: (B, H, L, D) per-device shards, L = S / n over ``axis_name``.
    The sequence must be evenly sharded and identically laid out for
    q and k/v (shard i holds global positions [i*L, (i+1)*L)).
    ``kv_mask`` (B, L) per-device shard of the key validity mask (1 =
    attend) for left/right-padded batches; it travels the ring with its
    k/v shard.
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
    block_q = min(block_q, _round_up(L, 128))
    block_k = min(block_k, _round_up(L, 128))
    if L % block_q or L % block_k:
        raise ValueError(
            f"per-device sequence {L} must be a multiple of the block "
            f"sizes ({block_q}, {block_k})")
    out = _ring(q, k, v, kv_mask, axis_name, n, causal, sm_scale,
                block_q, block_k, interpret)
    return out[..., :D] if Dp != D else out
