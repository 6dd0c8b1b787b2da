"""Fully-fused W8A8 ViT encoder layers (Pallas, TPU).

Round-1 profiling showed the statically-calibrated int8 ViT-L/14 encode is
*not* MXU-bound: XLA materializes every int8 matmul's int32 accumulator to
HBM and runs the requantize epilogue as a separate pass, capping dependent
K=1024 matmuls at ~114 TFLOP/s while a Pallas kernel with the epilogue
fused in VMEM sustains ~370 TFLOP/s on the same shape.  This module
restructures one encoder layer into five Pallas calls whose intermediates
(int32 accumulators, LayerNorm statistics, quantize/dequantize steps,
residual adds) never leave VMEM:

    1. ``ln_quant``        x  -> ln1(x) quantized int8        (layer 0 only)
    2. ``qkv_int8``        xq -> q, k, v (bf16, model layout)
    3. ``encoder_attention``  (existing Pallas kernel, bf16)
    4. ``oproj_ln_quant``  o, x -> x' = x + oW_o; ln2(x') quantized
    5. ``fc1_gelu_quant``  xq2 -> act(xq2 W_1) quantized int8
    6. ``fc2_res_ln_quant``hq, x' -> x'' = x' + hq W_2; ln1_next(x'')
                           quantized for the *next* layer (fusing away
                           step 1 for layers 1..L-1)

Numerics match :func:`multimeditron_tpu.models.vit_quant.vit_forward_int8`
(static-calibrated scales path): per-output-channel weight scales,
per-tensor static activation scales, f32 LayerNorm/activation math, bf16
residual stream.  Parity is asserted in ``tests/test_vit_int8_fused.py``.

Reference tower being accelerated: CLIP-ViT-L/14 as used by
``/root/reference/src/multimeditron/model/modalities/image_modality.py:124-133``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimeditron_tpu.models.vit import ViTConfig, _act, patchify
from multimeditron_tpu.models.common import layer_norm
from multimeditron_tpu.ops.encoder_attention import (
    encoder_attention,
    encoder_attention_int8,
)

Params = Dict[str, Any]

_VMEM_LIMIT = 100 * 1024 * 1024


def _row_block(m: int, target: int = 1056) -> int:
    """Largest divisor of ``m`` that is <= target (rows per grid step).

    Mosaic requires the sublane dimension of a block to be divisible by 8
    unless the block spans the whole array, so only 8-multiples qualify;
    if none exists the whole array becomes a single block."""
    best = 0
    i = 1
    while i * i <= m:
        if m % i == 0:
            for d in (i, m // i):
                if d % 8 == 0 and d <= target and d > best:
                    best = d
        i += 1
    return best if best else m


def _use_interpret(interpret: Optional[bool]) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _ln_f32(x32: jax.Array, w: jax.Array, b: jax.Array, eps: float,
            moments: bool = False) -> jax.Array:
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    if moments:
        # One-read variance: E[x^2] - mean^2. The two reductions share a
        # single pass over x (the two-pass form's second reduction DEPENDS
        # on the first and cannot overlap it). f32 cancellation costs
        # ~1e-4 relative on residual-stream magnitudes — below the int8
        # quantize step this feeds.
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - jnp.square(mean)
        var = jnp.maximum(var, 0.0)
    else:
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    h = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return h * w + b


def _quant_f32(h32: jax.Array, inv_s) -> jax.Array:
    return jnp.clip(jnp.round(h32 * inv_s), -127, 127).astype(jnp.int8)


def _i8dot(xq: jax.Array, wq: jax.Array) -> jax.Array:
    return jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------
def _ln_quant_kernel(x_ref, w_ref, b_ref, inv_s_ref, out_ref, *, eps):
    h = _ln_f32(x_ref[:].astype(jnp.float32),
                w_ref[:].astype(jnp.float32), b_ref[:].astype(jnp.float32), eps)
    out_ref[:] = _quant_f32(h, inv_s_ref[0, 0])


def _qkv_kernel(x_ref, w_ref, ws_ref, b_ref, s_ref, inv_ref, q_ref, k_ref,
                v_ref):
    # x (bm, K) int8; w (3, K, D) int8; ws/b (3, 1, D) f32; inv (3, 1) f32.
    # Three separate outputs so the consumer can view each (M, D) tensor
    # as (B, S, D) without XLA materializing slice copies. When the output
    # refs are int8, q/k/v are re-quantized with the static scales in
    # ``inv`` for the int8 attention kernel.
    s0 = s_ref[0, 0]
    for j, out_ref in enumerate((q_ref, k_ref, v_ref)):
        acc = _i8dot(x_ref[:], w_ref[j])
        val = acc.astype(jnp.float32) * (ws_ref[j] * s0) + b_ref[j]
        if out_ref.dtype == jnp.int8:
            out_ref[:] = _quant_f32(val, inv_ref[j, 0])
        else:
            out_ref[:] = val.astype(out_ref.dtype)


def _oproj_ln_kernel(o_ref, xres_ref, w_ref, ws_ref, b_ref, lnw_ref, lnb_ref,
                     s1_ref, inv_s2_ref, xout_ref, xq_ref, *, eps,
                     fast_ln=False):
    s1 = s1_ref[0, 0]
    # int8 o arrives pre-quantized by the attention kernel's epilogue
    # (same static scale s1): the whole quantize chain is skipped.
    oq = (o_ref[:] if o_ref.dtype == jnp.int8
          else _quant_f32(o_ref[:].astype(jnp.float32), 1.0 / s1))
    acc = _i8dot(oq, w_ref[:])
    x32 = (acc.astype(jnp.float32) * (ws_ref[:] * s1) + b_ref[:]
           + xres_ref[:].astype(jnp.float32))
    xout_ref[:] = x32.astype(xout_ref.dtype)
    h = _ln_f32(x32, lnw_ref[:].astype(jnp.float32),
                lnb_ref[:].astype(jnp.float32), eps, moments=fast_ln)
    xq_ref[:] = _quant_f32(h, inv_s2_ref[0, 0])


def _fc1_kernel(x_ref, w_ref, ws_ref, b_ref, s2_ref, inv_s3_ref, out_ref, *, act):
    s2 = s2_ref[0, 0]
    acc = _i8dot(x_ref[:], w_ref[:])
    g32 = acc.astype(jnp.float32) * (ws_ref[:] * s2) + b_ref[:]
    if act == "quick_gelu_approx":
        # sigmoid via hardware exp2 + approx reciprocal: the exact
        # sigmoid's divide is the longest VPU op in this epilogue; the
        # ~2^-8 relative error sits below the int8 quantize step.
        g32 = g32 * pl.reciprocal(
            1.0 + jnp.exp2(-2.4554396102104056 * g32), approx=True)
    elif act == "quick_gelu":
        g32 = g32 * jax.nn.sigmoid(1.702 * g32)
    elif act in ("gelu_pytorch_tanh", "gelu_new"):
        g32 = jax.nn.gelu(g32, approximate=True)
    elif act == "gelu":
        g32 = jax.nn.gelu(g32, approximate=False)
    else:
        raise ValueError(f"Unknown activation {act!r}")
    out_ref[:] = _quant_f32(g32, inv_s3_ref[0, 0])


def _fc2_ln_kernel(h_ref, xres_ref, w_ref, ws_ref, b_ref, lnw_ref, lnb_ref,
                   s3_ref, inv_s0n_ref, xout_ref, xq_ref, *, eps,
                   fast_ln=False):
    s3 = s3_ref[0, 0]
    acc = _i8dot(h_ref[:], w_ref[:])
    x32 = (acc.astype(jnp.float32) * (ws_ref[:] * s3) + b_ref[:]
           + xres_ref[:].astype(jnp.float32))
    xout_ref[:] = x32.astype(xout_ref.dtype)
    h = _ln_f32(x32, lnw_ref[:].astype(jnp.float32),
                lnb_ref[:].astype(jnp.float32), eps, moments=fast_ln)
    xq_ref[:] = _quant_f32(h, inv_s0n_ref[0, 0])


def _mlp_fused_kernel(xq_ref, xres_ref, w1_ref, w1s_ref, b1_ref,
                      w2_ref, w2s_ref, b2_ref, lnw_ref, lnb_ref,
                      s2_ref, inv_s3_ref, s3_ref, inv_s0n_ref,
                      xout_ref, xq_out_ref, *, act, eps, block_cols):
    """fc1+gelu+quant+fc2+residual+LN+quant in ONE kernel: the (rows, F)
    int8 hidden never touches HBM (the split pair writes+reads it,
    ~8.6 MB per 1056-row block). The F axis is processed in
    ``block_cols`` chunks accumulated into fc2's int32 accumulator, so
    the f32 pre-activation stays (rows, block_cols) — the same reason
    fc1_gelu_quant blocks its N axis."""
    s2 = s2_ref[0, 0]
    inv_s3 = inv_s3_ref[0, 0]
    F = w1_ref.shape[-1]
    acc2 = None
    for j in range(0, F, block_cols):
        sl = slice(j, j + block_cols)
        acc = _i8dot(xq_ref[:], w1_ref[:, sl])
        g32 = acc.astype(jnp.float32) * (w1s_ref[:, sl] * s2) + b1_ref[:, sl]
        if act == "quick_gelu":
            g32 = g32 * jax.nn.sigmoid(1.702 * g32)
        elif act in ("gelu_pytorch_tanh", "gelu_new"):
            g32 = jax.nn.gelu(g32, approximate=True)
        elif act == "gelu":
            g32 = jax.nn.gelu(g32, approximate=False)
        else:
            raise ValueError(f"Unknown activation {act!r}")
        hq = _quant_f32(g32, inv_s3)
        part = _i8dot(hq, w2_ref[sl, :])
        acc2 = part if acc2 is None else acc2 + part
    s3 = s3_ref[0, 0]
    x32 = (acc2.astype(jnp.float32) * (w2s_ref[:] * s3) + b2_ref[:]
           + xres_ref[:].astype(jnp.float32))
    xout_ref[:] = x32.astype(xout_ref.dtype)
    h = _ln_f32(x32, lnw_ref[:].astype(jnp.float32),
                lnb_ref[:].astype(jnp.float32), eps)
    xq_out_ref[:] = _quant_f32(h, inv_s0n_ref[0, 0])


def _qkv_attn_kernel(xq_ref, w_ref, ws_ref, b_ref, sc_ref, o_ref, s_scr,
                     aux_scr=None, *,
                     num_heads: int, kv_len: int, static_smax: bool = False,
                     fuse_l: bool = False, bf16_qk: bool = False,
                     store_p: bool = False, bf16_scores: bool = False,
                     ph_exp2: bool = False):
    """Merged QKV projection + int8 encoder attention for G images.

    One kernel per layer-half keeps q/k/v entirely in VMEM (never written
    to HBM). The per-image loop is software-pipelined over a DOUBLE-
    BUFFERED score scratch: image g+1's QK^T dots (MXU) are issued before
    image g's softmax + PV (VPU-heavy consume), so the two phases have no
    scratch hazard and Mosaic overlaps them (a single scratch serializes
    on the write-after-read: dots(g+1) must wait for softmax(g)).

    v and the softmax probabilities stay bf16: this half is VPU-bound
    (softmax volume over (H*Sp, Sp) scores), so the int8 round+convert
    of p and the requant of v cost more VPU passes than the tiny PV dot
    saves by running at int8 MXU rate. bf16 p/v is also strictly more
    accurate than the int8 path it replaces.

    With ``static_smax`` the row-max reduction over the score tensor is
    replaced by a CALIBRATED per-layer logit max (sc_ref row 3, base-2
    domain): softmax is shift-invariant, so any upper bound works as the
    stabilizer; exp2/f32 keeps full precision as long as a row's true max
    stays within ~120 of the bound (bf16/f32 share the 8-bit exponent).
    With ``fuse_l`` (static_smax, non-packed) two further VPU passes over
    the (H*Sp, Sp) score tensor are deleted:

    - the stabilizer subtraction: scores are stored to scratch already
      SHIFTED (``acc*a - m`` — one fused multiply-add at store time in the
      dots phase), so consume opens with a bare exp2;
    - the row-sum reduction: the PV dot's output tile is 128 lanes wide
      but each head only uses dh=64 of them — v is staged into a
      per-image (Sp, H*128) scratch with a ones column at lane dh, so the
      softmax denominator drops out of the SAME dot in otherwise-idle MXU
      lanes. Normalizing by the sum of the *bf16-rounded* p (the exact
      weights the PV dot consumed) is also slightly more faithful than
      dividing by the f32 sum.

    With ``bf16_qk`` q and k skip the int8 requant and stay bf16: the
    round-4 ablation probe (benchmarks/attn_floor_probe.py) measured the
    per-head int8 QK^T dots at ~50 TFLOP/s — a dh=64 contraction fills a
    quarter of the int8 MXU depth, so int8 is SLOWER than bf16 here (dh=64
    is half the bf16 depth) while also quantizing two extra activation
    points. Scores are likewise stored to scratch in bf16 (the probe
    attributed ~1.1 ms/layer to f32 score convert+store traffic); with the
    static stabilizer already subtracted at store time the stored values
    are <= the calibration margin, well inside bf16 range.

    sc_ref rows: [s0, 1/sq, 1/sk, smax*log2(e), sq*sk*sm_scale, unused]
    (with bf16_qk rows 1-2 are unused and row 4 is sm_scale alone)."""
    G, Sp, D = xq_ref.shape
    dh = D // num_heads
    x2 = xq_ref[:].reshape(G * Sp, D)
    s0 = sc_ref[0, 0]
    qkv = []
    for j in range(3):
        acc = _i8dot(x2, w_ref[j])
        val = acc.astype(jnp.float32) * (ws_ref[j] * s0) + b_ref[j]
        qkv.append(val.astype(jnp.bfloat16) if (j == 2 or bf16_qk)
                   else _quant_f32(val, sc_ref[1 + j, 0]))
    q8, k8, v16 = qkv
    qk_scale = sc_ref[4, 0]

    # Packed-key split (static path, Sp = 264): the 257-token key axis
    # pads to 264 lanes = THREE 128-lane VREG columns, so every softmax
    # VPU pass (scale, exp2, mask, sum, cast) runs at 384-effective-lane
    # width — 50% wasted volume on the VPU-bound half of the encoder.
    # Split the scores into an aligned (Sp, 256) main block (2 full VREG
    # columns, NO mask pass — all 256 keys real) plus a per-image tail
    # block holding key rows 256..263 (token 256 + pads) for ALL heads,
    # packed densely as (Sp, H*8) = (264, 128) so the tail's exp2/mask
    # passes cost 1/16th of a score column instead of a full one.
    packed = (static_smax and aux_scr is not None and not fuse_l
              and not store_p)
    tail = Sp - 256 if packed else 0
    fuse_l = fuse_l and static_smax and aux_scr is not None
    # store_p: the dots phase stores exp2(scores) bf16 (the PV operand)
    # instead of raw f32 scores — the consume phase's whole
    # read->exp2->cast->spill chain over the (H*Sp, Sp) tensor disappears;
    # PV dots read the scratch directly. Requires the static stabilizer
    # (shift folded into the dots-phase FMA) and the fuse_l denominator
    # (no f32 p remains to row-sum).
    store_p = store_p and static_smax and fuse_l

    # Scores are written to scratch PRE-SCALED into the base-2 softmax
    # domain and (non-packed path) PRE-MASKED: both passes run in the
    # dots phase, whose MXU work the double-buffered pipeline overlaps
    # with the previous image's VPU-bound consume — moving ~2 full VPU
    # passes over the score tensor off the critical path.
    a = qk_scale * 1.4426950408889634
    # fuse_l: scores land in scratch already shifted by the static
    # stabilizer (one FMA in the dots phase, overlapped with the MXU).
    # bf16_qk alone also pre-shifts: its scratch is bf16, and storing
    # large-magnitude base-2 scores unshifted would burn the 8-bit
    # mantissa's absolute precision before the consume exp2.
    # bf16_scores: int8 QK dots (unlike bf16_qk) but the score SCRATCH is
    # bf16 — the round-4 probe attributed ~1.1-1.2 ms/layer to f32 score
    # convert+store VREG/VMEM traffic in the dots phase; storing the
    # pre-shifted base-2 scores bf16 halves those bytes in BOTH phases
    # while keeping the dots/consume MXU/VPU balance that store_p broke
    # (store_p moved exp2 into the MXU-heavy dots phase and measured -4%
    # in the pipeline despite winning kernel isolation).
    pre_shifted = fuse_l or store_p or bf16_qk or bf16_scores
    shift = sc_ref[3, 0] if pre_shifted else 0.0
    maskrow = None
    if not packed and kv_len < Sp:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Sp), 1)
        maskrow = jnp.where(lane < kv_len, 0.0, -1e30)

    def dots(g, slot):
        rows = slice(g * Sp, (g + 1) * Sp)
        qg, kg = q8[rows], k8[rows]
        if fuse_l:
            vg = v16[rows]
            ones = jnp.ones((Sp, 1), v16.dtype)
            for h in range(num_heads):
                aux_scr[slot, :, h * 128:h * 128 + dh] = vg[:, h * dh:(h + 1) * dh]
                aux_scr[slot, :, h * 128 + dh:h * 128 + dh + 1] = ones
        for h in range(num_heads):
            sl = slice(h * dh, (h + 1) * dh)
            if packed:
                s_scr[slot, pl.ds(h * Sp, Sp), :] = jax.lax.dot_general(
                    qg[:, sl], kg[:256, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * a
                aux_scr[slot, :, h * tail:(h + 1) * tail] = jax.lax.dot_general(
                    qg[:, sl], kg[256:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * a
            else:
                raw = jax.lax.dot_general(
                    qg[:, sl], kg[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=(jnp.float32 if bf16_qk
                                            else jnp.int32),
                ).astype(jnp.float32) * a - shift
                if maskrow is not None:
                    raw = raw + maskrow
                if store_p:
                    raw = jnp.exp2(raw)
                s_scr[slot, pl.ds(h * Sp, Sp), :] = raw.astype(s_scr.dtype)

    def consume(g, slot):
        vg = v16[g * Sp:(g + 1) * Sp]
        # base-2 softmax: LOG2_E folded into the scalar scale, exp2
        # direct — exactly softmax (2^(x*log2e) = e^x), one fewer VPU
        # pass over the (H*Sp, Sp) scores than exp
        # int8 output: the normalize epilogue also quantizes by the
        # static attention-output scale (sc_ref row 5 = 1/s1), so the
        # o-proj kernel reads int8 directly and skips its quantize chain
        # (and the o tensor's HBM round-trip halves).
        def emit(h, val):
            if o_ref.dtype == jnp.int8:
                val = jnp.clip(jnp.round(val * sc_ref[5, 0]), -127, 127)
            o_ref[g, :, h * dh:(h + 1) * dh] = val.astype(o_ref.dtype)

        if store_p:
            # The scratch already holds bf16 p: consume is ONLY the PV
            # dots (reading scratch slices as MXU operands) + the tiny
            # per-head normalize epilogue. No VPU pass touches the
            # (H*Sp, Sp) tensor in this phase.
            for h in range(num_heads):
                acc = jax.lax.dot_general(
                    s_scr[slot, pl.ds(h * Sp, Sp), :],
                    aux_scr[slot, :, h * 128:(h + 1) * 128],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                linv = pl.reciprocal(
                    jnp.maximum(acc[:, dh:dh + 1], 1e-30), approx=True)
                emit(h, acc[:, :dh] * linv)
            return
        if fuse_l:
            # Scores arrive pre-shifted and pre-masked: one exp2 + bf16
            # cast is the whole softmax numerator pass. The denominator
            # comes out of the PV dot's ones column (lane dh of each
            # head's 128-lane group in aux_scr) — no VPU reduction.
            # ph_exp2: slice the scratch ref PER HEAD and exp2 each slice
            # right before its PV dot, instead of one monolithic
            # (H*Sp, Sp) exp2 pass up front — gives Mosaic head-granular
            # VPU/MXU units to interleave (exp2 of head h+1 against the
            # PV dot of head h).
            pb = (None if ph_exp2
                  else jnp.exp2(s_scr[slot]).astype(jnp.bfloat16))
            for h in range(num_heads):
                ph = (jnp.exp2(s_scr[slot, pl.ds(h * Sp, Sp), :])
                      .astype(jnp.bfloat16)
                      if ph_exp2 else pb[h * Sp:(h + 1) * Sp, :])
                acc = jax.lax.dot_general(
                    ph,
                    aux_scr[slot, :, h * 128:(h + 1) * 128],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                linv = pl.reciprocal(
                    jnp.maximum(acc[:, dh:dh + 1], 1e-30), approx=True)
                emit(h, acc[:, :dh] * linv)
            return
        sc = s_scr[slot]
        if packed:
            m = sc_ref[3, 0]
            p = jnp.exp2(sc - m)
            tc = aux_scr[slot]                        # (Sp, H*tail)
            lane = jax.lax.broadcasted_iota(jnp.int32, tc.shape, 1)
            # lane h*tail + j is key row 256+j of head h: real iff
            # 256 + j < kv_len
            pt = jnp.where(lane % tail < kv_len - 256,
                           jnp.exp2(tc - m), 0.0)     # (Sp, H*tail)
            l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
            pb = p.astype(jnp.bfloat16)
            ptb = pt.astype(jnp.bfloat16)
            for h in range(num_heads):
                sl = slice(h * dh, (h + 1) * dh)
                ts = slice(h * tail, (h + 1) * tail)
                acc = jax.lax.dot_general(
                    pb[h * Sp:(h + 1) * Sp, :], vg[:256, sl],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    ptb[:, ts], vg[256:, sl],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                lt = jnp.sum(pt[:, ts], axis=-1, keepdims=True)
                o_ref[g, :, sl] = (
                    acc / (l[h * Sp:(h + 1) * Sp] + lt)
                ).astype(o_ref.dtype)
            return
        if static_smax:
            # pre-shifted scratch (bf16_qk reaches here without fuse_l):
            # the static stabilizer was subtracted at store time already.
            m = 0.0 if pre_shifted else sc_ref[3, 0]
        else:
            m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp2(sc - m)
        # Floor the denominator: with a static per-layer stabilizer a row
        # whose true max sits >~126 base-2 below it underflows every p to
        # 0.0 and 0/0 would emit NaN; flooring degrades that row to zeros.
        # Reciprocal-multiply instead of divide: one VPU op per element
        # in the (Sp, dh) epilogue instead of a multi-op divide.
        linv = pl.reciprocal(
            jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30),
            approx=True)
        pb = p.astype(jnp.bfloat16)
        for h in range(num_heads):
            sl = slice(h * dh, (h + 1) * dh)
            acc = jax.lax.dot_general(
                pb[h * Sp:(h + 1) * Sp, :], vg[:, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[g, :, sl] = (acc * linv[h * Sp:(h + 1) * Sp]).astype(o_ref.dtype)

    dots(0, 0)
    for g in range(G):
        if g + 1 < G:
            dots(g + 1, (g + 1) % 2)
        consume(g, g % 2)


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------
def _cparams(n_grid: int = 1):
    return pltpu.CompilerParams(
        dimension_semantics=("parallel",) * n_grid,
        vmem_limit_bytes=_VMEM_LIMIT,
    )


def _smem_scalar():
    return pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)


def _full(shape_len: int):
    """A BlockSpec for an input replicated across the M grid."""
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _scalar(v) -> jax.Array:
    return jnp.asarray(v, jnp.float32).reshape(1, 1)


def ln_quant(x, ln_w, ln_b, scale, eps, *, block_rows: int = 1056,
             interpret: Optional[bool] = None):
    """(M, D) bf16 -> LayerNorm -> quantize by ``scale`` -> (M, D) int8."""
    M, D = x.shape
    bm = _row_block(M, block_rows)
    kern = functools.partial(_ln_quant_kernel, eps=eps)
    row = pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(M // bm,),
        in_specs=[row, vec, vec, _smem_scalar()],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.int8),
        compiler_params=_cparams(),
        interpret=_use_interpret(interpret),
    )(x, ln_w.reshape(1, D), ln_b.reshape(1, D), _scalar(1.0) / _scalar(scale))


def qkv_int8(xq, wq, ws, bias, s0, *, out_dtype=jnp.bfloat16,
             qkv_scales=None, block_rows: int = 1056,
             interpret: Optional[bool] = None):
    """xq (M, K) int8 @ wq (3, K, D) -> three (M, D) arrays (q, k, v).

    With ``qkv_scales`` (a (3,) array of static q/k/v activation scales)
    the outputs are re-quantized int8 for the int8 attention kernel."""
    M, K = xq.shape
    D = wq.shape[-1]
    bm = _row_block(M, block_rows)
    if qkv_scales is not None:
        out_dtype = jnp.int8
        inv = (1.0 / jnp.asarray(qkv_scales, jnp.float32)).reshape(3, 1)
    else:
        inv = jnp.ones((3, 1), jnp.float32)
    row = pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rowD = pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((M, D), out_dtype)
    return pl.pallas_call(
        _qkv_kernel,
        grid=(M // bm,),
        in_specs=[
            row,
            pl.BlockSpec((3, K, D), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, D), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, D), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            _smem_scalar(),
            pl.BlockSpec((3, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(rowD, rowD, rowD),
        out_shape=(out, out, out),
        compiler_params=_cparams(),
        interpret=_use_interpret(interpret),
    )(xq, wq, ws, bias, _scalar(s0), inv)


def oproj_ln_quant(o, x_res, wq, ws, bias, ln_w, ln_b, s1, s2, eps,
                   *, block_rows: int = 1056, fast_ln: bool = False,
                   interpret: Optional[bool] = None):
    """x' = x_res + dequant(quant(o) @ wq) + b;  also ln2(x') quantized.

    Returns (x' bf16 (M, D), xq2 int8 (M, D))."""
    M, D = o.shape
    bm = _row_block(M, block_rows)
    kern = functools.partial(_oproj_ln_kernel, eps=eps, fast_ln=fast_ln)
    row = pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(M // bm,),
        in_specs=[
            row, row,
            pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec, vec, vec, vec,
            _smem_scalar(), _smem_scalar(),
        ],
        out_specs=(row, row),
        out_shape=(
            jax.ShapeDtypeStruct((M, D), x_res.dtype),
            jax.ShapeDtypeStruct((M, D), jnp.int8),
        ),
        compiler_params=_cparams(),
        interpret=_use_interpret(interpret),
    )(o, x_res, wq, ws.reshape(1, D), bias.reshape(1, D),
      ln_w.reshape(1, D), ln_b.reshape(1, D),
      _scalar(s1), _scalar(1.0) / _scalar(s2))


def fc1_gelu_quant(xq, wq, ws, bias, s2, s3, act, *, block_rows: int = 1056,
                   block_cols: int = 2048, w_outer: bool = False,
                   interpret: Optional[bool] = None):
    """hq = quant(act(xq @ wq * ws * s2 + b), s3) -> (M, N) int8.

    N is blocked so the (bm, bn) f32 pre-activation stays small in VMEM —
    a full (bm, 4096) f32 intermediate measurably slows the kernel.

    ``w_outer`` iterates the N (weight-column) axis in the OUTER grid dim
    so each (K, bn) weight block is fetched once per sweep instead of once
    per row block: at ViT-L encode shapes the default order streams w1
    M/bm times (~256 MB/layer at batch 256) while w_outer streams the
    int8 activation N/bn times (~138 MB) — roughly half the HBM traffic
    of this kernel."""
    M, K = xq.shape
    N = wq.shape[-1]
    bm = _row_block(M, block_rows)
    bn = block_cols if N % block_cols == 0 else N
    kern = functools.partial(_fc1_kernel, act=act)
    smem2 = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    if w_outer:
        # grid dims are (j=N-block, i=row-block): inner i sweeps rows with
        # the weight block held resident.
        ix, iw, io = (lambda j, i: (i, 0), lambda j, i: (0, j),
                      lambda j, i: (i, j))
        grid = (N // bn, M // bm)
    else:
        ix, iw, io = (lambda i, j: (i, 0), lambda i, j: (0, j),
                      lambda i, j: (i, j))
        grid = (M // bm, N // bn)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), iw, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), iw, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), iw, memory_space=pltpu.VMEM),
            smem2, smem2,
        ],
        out_specs=pl.BlockSpec((bm, bn), io, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_use_interpret(interpret),
    )(xq, wq, ws.reshape(1, N), bias.reshape(1, N), _scalar(s2),
      _scalar(1.0) / _scalar(s3))


def fc2_res_ln_quant(hq, x_res, wq, ws, bias, ln_w, ln_b, s3, s0_next, eps,
                     *, block_rows: int = 1056, fast_ln: bool = False,
                     interpret: Optional[bool] = None):
    """x'' = x_res + dequant(hq @ wq) + b; also ln1_next(x'') quantized.

    Returns (x'' bf16 (M, D), xq_next int8 (M, D))."""
    M, K = hq.shape
    D = wq.shape[-1]
    bm = _row_block(M, block_rows)
    kern = functools.partial(_fc2_ln_kernel, eps=eps, fast_ln=fast_ln)
    rowD = pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            rowD,
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec, vec, vec, vec,
            _smem_scalar(), _smem_scalar(),
        ],
        out_specs=(rowD, rowD),
        out_shape=(
            jax.ShapeDtypeStruct((M, D), x_res.dtype),
            jax.ShapeDtypeStruct((M, D), jnp.int8),
        ),
        compiler_params=_cparams(),
        interpret=_use_interpret(interpret),
    )(hq, x_res, wq, ws.reshape(1, D), bias.reshape(1, D),
      ln_w.reshape(1, D), ln_b.reshape(1, D),
      _scalar(s3), _scalar(1.0) / _scalar(s0_next))


def mlp_fused(xq, x_res, w1, w1_s, b1, w2, w2_s, b2, ln_w, ln_b,
              s2, s3, s0_next, eps, act, *, block_rows: int = 1056,
              block_cols: int = 2048, interpret: Optional[bool] = None):
    """Merged fc1→act→quant→fc2→residual→LN→quant (one kernel for the
    whole MLP half; the int8 hidden stays in VMEM). Returns
    (x'' bf16 (M, D), xq_next int8 (M, D)) — drop-in for the
    fc1_gelu_quant + fc2_res_ln_quant pair."""
    M, K = xq.shape
    F = w1.shape[-1]
    D = w2.shape[-1]
    bm = _row_block(M, block_rows)
    bn = block_cols if F % block_cols == 0 else F
    kern = functools.partial(_mlp_fused_kernel, act=act, eps=eps,
                             block_cols=bn)
    rowD = pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vecD = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vecF = pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            rowD,
            pl.BlockSpec((K, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vecF, vecF,
            pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vecD, vecD, vecD, vecD,
            _smem_scalar(), _smem_scalar(), _smem_scalar(), _smem_scalar(),
        ],
        out_specs=(rowD, rowD),
        out_shape=(
            jax.ShapeDtypeStruct((M, D), x_res.dtype),
            jax.ShapeDtypeStruct((M, D), jnp.int8),
        ),
        compiler_params=_cparams(),
        interpret=_use_interpret(interpret),
    )(xq, x_res, w1, w1_s.reshape(1, F), b1.reshape(1, F),
      w2, w2_s.reshape(1, D), b2.reshape(1, D),
      ln_w.reshape(1, D), ln_b.reshape(1, D),
      _scalar(s2), _scalar(1.0) / _scalar(s3), _scalar(s3),
      _scalar(1.0) / _scalar(s0_next))


# ---------------------------------------------------------------------------
# Packing + forward
# ---------------------------------------------------------------------------
def pack_vit_int8_fused(params: Params) -> Params:
    """Pack bf16 ViT params into the fused-kernel layout.

    Per-layer stacks (leading axis L):
      wqkv_q (L,3,D,D) / wqkv_s (L,3,1,D) / qkv_b (L,3,1,D)
      wo_q (L,D,D) / wo_s (L,1,D) / o_b (L,1,D)
      w1_q (L,D,N) / w1_s (L,1,N) / b1 (L,1,N)
      w2_q (L,N,D) / w2_s (L,1,D) / b2 (L,1,D)
      ln1_w/ln1_b/ln2_w/ln2_b (L,D); ln1n_w/ln1n_b = ln1 rolled by -1.
    Non-layer params are carried through unchanged.
    """
    lp = params["layers"]

    def qstack(key):
        w = lp[key].astype(jnp.float32)  # (L, K, N)
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0,
                            1e-8)
        q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return q, scale

    q_q, q_s = qstack("q_proj")
    k_q, k_s = qstack("k_proj")
    v_q, v_s = qstack("v_proj")
    o_q, o_s = qstack("o_proj")
    f1_q, f1_s = qstack("fc1")
    f2_q, f2_s = qstack("fc2")

    def b(key):
        return lp[key].astype(jnp.float32)[:, None, :]  # (L, 1, N)

    packed = {
        "wqkv_q": jnp.stack([q_q, k_q, v_q], axis=1),
        "wqkv_s": jnp.stack([q_s, k_s, v_s], axis=1),
        "qkv_b": jnp.stack([b("q_bias"), b("k_bias"), b("v_bias")], axis=1),
        "wo_q": o_q, "wo_s": o_s, "o_b": b("o_bias"),
        "w1_q": f1_q, "w1_s": f1_s, "b1": b("fc1_bias"),
        "w2_q": f2_q, "w2_s": f2_s, "b2": b("fc2_bias"),
        "ln1_w": lp["ln1_w"], "ln1_b": lp["ln1_b"],
        "ln2_w": lp["ln2_w"], "ln2_b": lp["ln2_b"],
        "ln1n_w": jnp.roll(lp["ln1_w"], -1, axis=0),
        "ln1n_b": jnp.roll(lp["ln1_b"], -1, axis=0),
    }
    for key, val in params.items():
        if key != "layers":
            packed[key] = val
    return packed


def qkv_attn_int8(xq3, wq, ws, bias, scales6, num_heads, kv_len,
                  *, out_dtype=jnp.bfloat16, block_imgs: int = 8,
                  static_smax: bool = False, allow_packed: bool = True,
                  fuse_l: bool = True, bf16_qk: bool = False,
                  store_p: bool = False, bf16_scores: bool = False,
                  ph_exp2: bool = False,
                  interpret: Optional[bool] = None):
    """xq3 (B, Sp, D) int8 -> attention output (B, Sp, D) bf16, with the
    QKV projection and int8 attention fused into one kernel.

    ``bf16_qk`` (static-smax path): q/k stay bf16 and scores are stored
    bf16 — the caller must then build scales6 row 4 as sm_scale alone
    (no sq*sk factor) and rows 1-2 are ignored."""
    B, Sp, D = xq3.shape
    G = block_imgs
    while G > 1 and B % G:
        G //= 2
    # Packed-key split (see _qkv_attn_kernel): static-smax sequences a few
    # tokens past 256 lanes split into an aligned 256-lane main block plus
    # a densely head-packed tail — the second scratch's presence enables it.
    packed = allow_packed and static_smax and Sp > 256 and kv_len > 256
    fuse_l = (fuse_l and static_smax and not packed
              and D // num_heads < 128)
    bf16_qk = bf16_qk and static_smax and not packed
    store_p = store_p and static_smax and fuse_l
    # bf16 score scratch requires the pre-shifted store (static stabilizer
    # folded into the dots-phase FMA), hence static_smax; the packed path
    # keeps its own f32 main/tail scratch layout.
    bf16_scores = bf16_scores and static_smax and not packed
    if out_dtype == jnp.int8 and not (fuse_l or store_p):
        # Only the fuse_l/store_p consume paths run the quantize epilogue
        # (emit); the packed/generic paths astype() raw bf16-magnitude
        # values, which would silently truncate to garbage int8.
        raise ValueError(
            "qkv_attn_int8: int8 out_dtype requires the fuse_l (or "
            "store_p, which implies fuse_l) consume path after effective "
            "flag gating; got effective "
            f"fuse_l={fuse_l} store_p={store_p} packed={packed}")
    kern = functools.partial(_qkv_attn_kernel, num_heads=num_heads,
                             kv_len=kv_len, static_smax=static_smax,
                             fuse_l=fuse_l, bf16_qk=bf16_qk,
                             store_p=store_p, bf16_scores=bf16_scores,
                             ph_exp2=ph_exp2)
    spec = pl.BlockSpec((G, Sp, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM(
        (2, num_heads * Sp, 256 if packed else Sp),
        jnp.bfloat16 if (bf16_qk or store_p or bf16_scores)
        else jnp.float32)]
    if packed:
        scratch.append(
            pltpu.VMEM((2, Sp, num_heads * (Sp - 256)), jnp.float32))
    elif fuse_l:
        # v staged per image as (Sp, H*128): each head's dh columns plus a
        # ones column at lane dh feeding the free-lane denominator.
        scratch.append(pltpu.VMEM((2, Sp, num_heads * 128), jnp.bfloat16))
    return pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            spec,
            pl.BlockSpec((3, D, D), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, D), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, D), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, Sp, D), out_dtype),
        scratch_shapes=scratch,
        # "arbitrary" grid semantics (the requant roof chain's setting)
        # was tried here and did not finish compiling in 20 minutes —
        # Mosaic's cross-step pipeliner chokes on the big unrolled body.
        compiler_params=_cparams(),
        interpret=_use_interpret(interpret),
    )(xq3, wq, ws, bias, scales6)


def calibrate_vit_int8_fused(
    params: Params,
    cfg: ViTConfig,
    pixel_values: jax.Array,
    margin: float = 1.1,
) -> jax.Array:
    """bf16 calibration forward recording per-layer static activation
    scales at SEVEN quantized points: [ln1 out, attn out, ln2 out, act out,
    q, k, v]. Superset of ``vit_quant.calibrate_act_scales`` (first four
    columns identical semantics); the extra q/k/v columns feed the int8
    attention kernel. Column 7 is the per-layer MAX attention logit
    (q.k * sm_scale, natural-log domain, margin applied additively): the
    fused kernel uses it as a static softmax stabilizer, replacing the
    row-max reduction over the (H*Sp, Sp) score tensor. Returns (L, 8)."""
    B = pixel_values.shape[0]
    D, Hn = cfg.hidden_size, cfg.num_heads
    Dh = D // Hn

    x = patchify(pixel_values.astype(cfg.dtype), cfg.patch_size) @ params["patch_proj"]
    if cfg.patch_bias:
        x = x + params["patch_bias"]
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls_token"], (B, 1, D)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"]
    if cfg.use_pre_layernorm:
        x = layer_norm(x, params["pre_ln_w"], params["pre_ln_b"], cfg.layer_norm_eps)
    S = x.shape[1]

    def amax(h):
        return jnp.max(jnp.abs(h.astype(jnp.float32)))

    def layer(x, lp):
        h1 = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        q = h1 @ lp["q_proj"] + lp["q_bias"]
        k = h1 @ lp["k_proj"] + lp["k_bias"]
        v = h1 @ lp["v_proj"] + lp["v_bias"]
        o = encoder_attention(q, k, v, Hn)
        x = x + (o @ lp["o_proj"] + lp["o_bias"])
        h2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        g = _act(cfg.hidden_act, h2 @ lp["fc1"] + lp["fc1_bias"])
        x = x + (g @ lp["fc2"] + lp["fc2_bias"])
        stats = jnp.stack([amax(h1), amax(o), amax(h2), amax(g),
                           amax(q), amax(k), amax(v)])
        # Max attention logit (one image at a time: (H, S, S) not
        # (B, H, S, S), so calibration memory stays flat in B).
        qh = q.astype(jnp.float32).reshape(B, S, Hn, Dh)
        kh = k.astype(jnp.float32).reshape(B, S, Hn, Dh)
        smax = jnp.max(jax.lax.map(
            lambda qk: jnp.max(jnp.einsum("shd,thd->hst", qk[0], qk[1])),
            (qh, kh),
        )) * (Dh ** -0.5)
        # f32 smoothed params must not widen the scan carry (cfg.dtype).
        return x.astype(cfg.dtype), (stats, smax)

    _, (stats, smax) = jax.lax.scan(layer, x, params["layers"])
    scales = jnp.maximum(stats * margin / 127.0, 1e-8)  # (L, 7)
    # Additive margin on the logit max: softmax is shift-invariant, a
    # slack upper bound only shifts exp2 magnitudes (f32/bf16 exponent
    # range absorbs ~120 base-2 of slack).
    return jnp.concatenate([scales, smax[:, None] + 2.0], axis=1)  # (L, 8)


def smooth_vit_params(
    params: Params,
    cfg: ViTConfig,
    pixel_values: jax.Array,
    # alpha sweep on the outlier-injected test tower: 0.5 -> 0.9971,
    # 0.65 -> 0.9991, 0.8 -> 0.9991 cosine; 0.65 balances act-vs-weight
    # range pressure best.
    alpha: float = 0.65,
    clip: tuple = (0.0625, 16.0),
) -> Params:
    """SmoothQuant-style outlier migration for the static-W8A8 tower.

    Real CLIP towers carry per-channel activation outliers; with a
    per-TENSOR static activation scale, one hot channel starves every
    other channel of quantization levels. All four folds below are
    mathematically EXACT in the bf16 forward (they move a per-channel
    factor across a linearity), so fidelity of the quantized path
    improves at zero runtime cost — call this BEFORE
    ``calibrate_vit_int8_fused`` / ``pack_vit_int8_fused``:

      1. ln1 -> q/k/v:  h1/s enters the quantizer; s folds into ln1 gamma/
         beta (producer) and the qkv weight ROWS (consumer).
         s_j = c_act_j^alpha / c_w_j^(1-alpha) (Xiao et al., 2022),
         geomean-normalized per layer.
      2. q <-> k balance: QK^T contracts channels, so scaling q channel j
         by 1/t and k channel j by t is exact; t = sqrt(qc/kc) equalizes
         the two per-tensor quant ranges.
      3. v -> o: softmax-weighted sums preserve channel scaling, so a
         factor moved from v_proj output columns to o_proj input rows is
         exact across the attention; it conditions the o quant point.
      4. ln2 -> fc1: same as (1) for the MLP half.

    (The gelu-out -> fc2 point cannot be folded: gelu is not
    scale-equivariant.)  Ref: the CUDA int8 serving stacks this replaces
    (reference pyproject.toml sglang extra)."""
    B = pixel_values.shape[0]
    Hn = cfg.num_heads

    x = patchify(pixel_values.astype(cfg.dtype), cfg.patch_size) @ params["patch_proj"]
    if cfg.patch_bias:
        x = x + params["patch_bias"]
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(
            params["cls_token"], (B, 1, cfg.hidden_size)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"]
    if cfg.use_pre_layernorm:
        x = layer_norm(x, params["pre_ln_w"], params["pre_ln_b"],
                       cfg.layer_norm_eps)

    def camax(h):  # per-channel abs max over batch and tokens
        return jnp.max(jnp.abs(h.astype(jnp.float32)), axis=(0, 1))

    def layer(x, lp):
        h1 = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        q = h1 @ lp["q_proj"] + lp["q_bias"]
        k = h1 @ lp["k_proj"] + lp["k_bias"]
        v = h1 @ lp["v_proj"] + lp["v_bias"]
        o = encoder_attention(q, k, v, Hn)
        x = x + (o @ lp["o_proj"] + lp["o_bias"])
        h2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        g = _act(cfg.hidden_act, h2 @ lp["fc1"] + lp["fc1_bias"])
        x = x + (g @ lp["fc2"] + lp["fc2_bias"])
        return x.astype(cfg.dtype), (camax(h1), camax(q), camax(k),
                                     camax(o), camax(h2))

    _, (c1, qc, kc, oc, c2) = jax.lax.scan(layer, x, params["layers"])

    lp = dict(params["layers"])
    eps = 1e-6

    def rowmax(*keys):  # (L, D): amax over output cols per input row
        return jnp.max(jnp.stack([
            jnp.max(jnp.abs(lp[k].astype(jnp.float32)), axis=-1)
            for k in keys
        ]), axis=0)

    def factor(c_act, c_w):
        s = (jnp.power(jnp.maximum(c_act, eps), alpha)
             / jnp.power(jnp.maximum(c_w, eps), 1.0 - alpha))
        s = s / jnp.exp(jnp.mean(jnp.log(s), axis=-1, keepdims=True))
        return jnp.clip(s, clip[0], clip[1])

    # Folded tensors stay f32: the consumers (pack_vit_int8_fused's int8
    # quantizer, the kernels' f32 LN math) cast from f32 anyway, and
    # re-rounding large fold factors through bf16 costs up to ~5e-3
    # cosine on heavy-outlier towers for nothing.
    def scale_rows(key, s):    # w (L, K, N): rows = input channels
        lp[key] = lp[key].astype(jnp.float32) * s[:, :, None]

    def scale_cols(key, bkey, s):  # output channels (and their bias)
        lp[key] = lp[key].astype(jnp.float32) * s[:, None, :]
        lp[bkey] = lp[bkey].astype(jnp.float32) * s

    def scale_vec(key, s):
        lp[key] = lp[key].astype(jnp.float32) * s

    # 1. ln1 -> qkv
    s1 = factor(c1, rowmax("q_proj", "k_proj", "v_proj"))
    scale_vec("ln1_w", 1.0 / s1)
    scale_vec("ln1_b", 1.0 / s1)
    for k in ("q_proj", "k_proj", "v_proj"):
        scale_rows(k, s1)
    # 2. q/k range balance (exact across the dot product)
    t = jnp.clip(jnp.sqrt(jnp.maximum(qc, eps) / jnp.maximum(kc, eps)),
                 clip[0], clip[1])
    scale_cols("q_proj", "q_bias", 1.0 / t)
    scale_cols("k_proj", "k_bias", t)
    # 3. v -> o (exact across softmax-weighted sums)
    so = factor(oc, rowmax("o_proj"))
    scale_cols("v_proj", "v_bias", 1.0 / so)
    scale_rows("o_proj", so)
    # 4. ln2 -> fc1
    s2 = factor(c2, rowmax("fc1"))
    scale_vec("ln2_w", 1.0 / s2)
    scale_vec("ln2_b", 1.0 / s2)
    scale_rows("fc1", s2)

    return {**params, "layers": lp}


def vit_forward_int8_fused(
    packed: Params,
    cfg: ViTConfig,
    pixel_values: jax.Array,
    act_scales: jax.Array,  # (L, 4) static; (L, 7) adds int8 attn; (L, 8)
    # additionally carries col 7 = per-layer max attention logit
    # (natural-log domain, +2.0 margin) enabling the static-smax kernel.
    drop_cls: bool = True,
    interpret: Optional[bool] = None,
    # In CHAINED isolation 528-row blocks look better for oproj (1,070
    # vs 1,145 us/layer) but the full pipeline measures 1,318-1,321
    # img/s at 528 vs 1,340+ at 1056 (fc1's N-blocked grid re-streams
    # w1 per row block: 2x the weight traffic at 528) — keep 1056.
    block_rows: int = 1056,
    # Round-4 interleaved A/Bs (benchmarks/attn_floor_probe.py for the
    # isolated kernel, benchmarks/vit_pipeline_ab.py for the pipeline —
    # cross-process runs drift 10-15% on this chip, so only same-process
    # round-robin comparisons are trusted):
    #   fuse_l   — softmax denominator from the PV dot's free output
    #              lanes (dh=64 of a 128-wide tile): no VPU row-sum.
    #              Pipeline 1,393 -> 1,446 img/s (+3.8%). DEFAULT ON.
    #   bf16_qk  — q/k skip the int8 requant; QK^T in bf16 (the dh=64
    #              int8 dots measure ~50 TFLOP/s) + bf16 score scratch.
    #              Wins the ISOLATED kernel A/B (-13% with store_p) and
    #              +2e-4 cosine, but measures -3% in the pipeline.
    #   store_p  — dots phase stores exp2(scores) bf16, consume phase is
    #              PV-dots-only. Isolated winner with bf16_qk; pipeline
    #              -4%. Both kept for the probe record / other shapes.
    #   attn_block_imgs — G=4 and G=2 tie in-pipeline; G=8 is -5%.
    bf16_qk: bool = False,
    fuse_l: bool = True,
    store_p: bool = False,
    # bf16_scores — int8 QK dots with a bf16 score scratch (pre-shifted
    # store): halves the score-traffic term the round-4 probe measured at
    # ~1.2 ms/layer without bf16_qk's dot swap or store_p's phase
    # imbalance. Round-5 pipeline A/B: see docs/known_issues.md.
    bf16_scores: bool = False,
    # ph_exp2 — per-head exp2 slices in the consume phase (see kernel).
    ph_exp2: bool = False,
    # fc1_w_outer — fc1 weight blocks ride the outer grid dim (fetched
    # once per sweep instead of once per row block; see fc1_gelu_quant).
    # Round-5 pipeline A/B: 1,545.6 -> 1,554.4 img/s (+0.6%, and ~180 MB
    # less HBM traffic per layer at batch 256). DEFAULT ON.
    fc1_w_outer: bool = True,
    # fc1_block_cols — fc1's N-block width (bn). With w_outer, bn=N makes
    # fc1 a single sweep (weight resident AND activation read once) at
    # the cost of a (bm, N) f32 pre-activation in VMEM. Round-5 A/B under
    # w_outer: 4096 is a wash (1,558.8 vs 1,559.8 img/s), 1024 slightly
    # worse (1,554.3) — the duplicate activation read was already
    # overlapped; keep 2048.
    fc1_block_cols: int = 2048,
    attn_block_imgs: int = 4,
    # int8_o: the attention epilogue quantizes its output by the static
    # attn-out scale (calibration col 1), the o-proj kernel consumes the
    # int8 directly — one quantize chain and half the o HBM round-trip
    # saved. Requires the fuse_l/store_p epilogue.
    # Pipeline A/B (vit_pipeline_ab.py): int8_o +1.1%, approx_gelu
    # +6.2% (fc1's exact-sigmoid divide was the longest VPU chain in the
    # MLP half); both fidelity-neutral (cosine vs the exact path 0.9998+).
    int8_o: bool = True,
    # approx_gelu: quick_gelu's sigmoid via exp2 + approx reciprocal.
    approx_gelu: bool = True,
    # fast_ln: one-read LN variance (E[x^2] - mean^2) in the oproj/fc2
    # epilogues.
    fast_ln: bool = False,
) -> jax.Array:
    """Fused-Pallas twin of ``vit_forward_int8`` (static-scales path)."""
    B = pixel_values.shape[0]
    D = cfg.hidden_size
    eps = cfg.layer_norm_eps

    x = patchify(pixel_values.astype(cfg.dtype), cfg.patch_size) @ packed["patch_proj"]
    if cfg.patch_bias:
        x = x + packed["patch_bias"]
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(packed["cls_token"], (B, 1, D)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
    x = x + packed["position_embedding"]
    if cfg.use_pre_layernorm:
        x = layer_norm(x, packed["pre_ln_w"], packed["pre_ln_b"], eps)

    # Pad the token axis to a sublane multiple: (B, Sp, D) and (B*Sp, D)
    # then share one physical layout, so the reshapes between the row-wise
    # kernels and the per-image attention kernel are free. With S=257 the
    # un-padded reshape is a real relayout (257 rows pad to 264 sublanes
    # per image) that cost ~0.7 ms per 128-image batch PER TENSOR.
    S = x.shape[1]
    Sp = (S + 7) // 8 * 8
    if Sp != S:
        x = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))
    M = B * Sp
    x2d = x.reshape(M, D)

    merged = act_scales.shape[-1] >= 7
    # (L, 8) calibrations carry the per-layer logit max (column 7): the
    # kernel then skips the row-max reduction over the score tensor.
    # Pad (L, 7) to (L, 8) BEFORE layer_stacks captures the array, so the
    # scan body's sc[7] index is in bounds on 7-column calibrations.
    static_smax = act_scales.shape[-1] >= 8
    if not static_smax:
        act_scales = jnp.concatenate(
            [act_scales, jnp.zeros((act_scales.shape[0], 1), act_scales.dtype)],
            axis=1)

    # s0 of layer 0; rolled so step l carries s0 of layer l+1.
    s0_next = jnp.roll(act_scales[:, 0], -1)
    xq0 = ln_quant(x2d, packed["ln1_w"][0], packed["ln1_b"][0],
                   act_scales[0, 0], eps, block_rows=block_rows,
                   interpret=interpret)

    layer_stacks = (
        packed["wqkv_q"], packed["wqkv_s"], packed["qkv_b"],
        packed["wo_q"], packed["wo_s"], packed["o_b"],
        packed["w1_q"], packed["w1_s"], packed["b1"],
        packed["w2_q"], packed["w2_s"], packed["b2"],
        packed["ln2_w"], packed["ln2_b"],
        packed["ln1n_w"], packed["ln1n_b"],
        act_scales, s0_next,
    )

    sm_scale = (D // cfg.num_heads) ** -0.5

    def body(carry, stacks):
        xc, xqc = carry
        (wqkv, wqkv_s, qkv_b, wo, wo_s, o_b, w1, w1_s, b1,
         w2, w2_s, b2, ln2w, ln2b, ln1nw, ln1nb, sc, s0n) = stacks
        if merged:
            # Best-measured decomposition: one merged [QKV + int8
            # attention] kernel (q/k/v never reach HBM), then the o-proj /
            # fc1 / fc2 halves as medium kernels — mega-kernels that also
            # swallow the o-proj or the whole MLP measure SLOWER (Mosaic
            # pipelines medium kernels better than one long body).
            # bf16_qk (static-smax): q/k skip the int8 requant — row 4 is
            # sm_scale alone, rows 1-2 unused (see qkv_attn_int8).
            qk4 = (sm_scale * jnp.ones_like(sc[0])
                   if (static_smax and bf16_qk)
                   else sc[4] * sc[5] * sm_scale)
            # row 5: 1/s1 for the int8-output epilogue (v never leaves
            # the merged kernel, so the old v-scale slot is free).
            row5 = (1.0 / sc[1]) if int8_o else (sc[6] / 127.0)
            scales6 = jnp.stack([
                sc[0], 1.0 / sc[4], 1.0 / sc[5],
                sc[7] * 1.4426950408889634,
                qk4, row5,
            ]).reshape(6, 1)
            # allow_packed=False: the packed-key split measured SLOWER in
            # the full pipeline (1,117 vs 1,411 img/s) — the per-head tail
            # dots and masked tail stores cost more than the saved softmax
            # lanes (kernel kept for the probe record; see known_issues).
            # Mirror qkv_attn_int8's EFFECTIVE gating: store_p is itself
            # re-gated on fuse_l inside the kernel, so store_p without
            # fuse_l falls back to a consume path with no quantize
            # epilogue — int8 output is only legal when effective fuse_l
            # holds (the kernel asserts the same invariant).
            use_int8_o = (int8_o and static_smax and fuse_l
                          and D // cfg.num_heads < 128)
            o = qkv_attn_int8(xqc.reshape(B, Sp, D), wqkv, wqkv_s, qkv_b,
                              scales6, cfg.num_heads, S,
                              block_imgs=attn_block_imgs,
                              static_smax=static_smax, allow_packed=False,
                              bf16_qk=static_smax and bf16_qk,
                              fuse_l=fuse_l, store_p=store_p,
                              bf16_scores=bf16_scores, ph_exp2=ph_exp2,
                              out_dtype=(jnp.int8 if use_int8_o
                                         else xc.dtype),
                              interpret=interpret)
            xp, xq2 = oproj_ln_quant(o.reshape(M, D), xc, wo, wo_s[0],
                                     o_b[0], ln2w, ln2b, sc[1], sc[2], eps,
                                     block_rows=block_rows, fast_ln=fast_ln,
                                     interpret=interpret)
            act = ("quick_gelu_approx"
                   if (approx_gelu and cfg.hidden_act == "quick_gelu")
                   else cfg.hidden_act)
            hq = fc1_gelu_quant(xq2, w1, w1_s[0], b1[0], sc[2], sc[3],
                                act, block_rows=block_rows,
                                w_outer=fc1_w_outer,
                                block_cols=fc1_block_cols,
                                interpret=interpret)
            xn, xqn = fc2_res_ln_quant(hq, xp, w2, w2_s[0], b2[0],
                                       ln1nw, ln1nb, sc[3], s0n, eps,
                                       block_rows=block_rows, fast_ln=fast_ln,
                                       interpret=interpret)
            return (xn, xqn), None
        q, k, v = qkv_int8(xqc, wqkv, wqkv_s, qkv_b, sc[0],
                           out_dtype=xc.dtype, interpret=interpret)
        q = q.reshape(B, Sp, D)
        k = k.reshape(B, Sp, D)
        v = v.reshape(B, Sp, D)
        o = encoder_attention(q, k, v, cfg.num_heads, kv_len=S,
                              interpret=interpret)
        xp, xq2 = oproj_ln_quant(o.reshape(M, D), xc, wo, wo_s[0], o_b[0],
                                 ln2w, ln2b, sc[1], sc[2], eps,
                                 interpret=interpret)
        hq = fc1_gelu_quant(xq2, w1, w1_s[0], b1[0], sc[2], sc[3],
                            cfg.hidden_act, interpret=interpret)
        xn, xqn = fc2_res_ln_quant(hq, xp, w2, w2_s[0], b2[0],
                                   ln1nw, ln1nb, sc[3], s0n, eps,
                                   interpret=interpret)
        return (xn, xqn), None

    (x2d, _), _ = jax.lax.scan(body, (x2d, xq0), layer_stacks)

    x = x2d.reshape(B, Sp, D)[:, :S]
    if cfg.post_layernorm_output:
        x = layer_norm(x, packed["post_ln_w"], packed["post_ln_b"], eps)
    if cfg.use_cls_token and drop_cls:
        x = x[:, 1:, :]
    return x
