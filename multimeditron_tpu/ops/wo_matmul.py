"""Weight-only int8 matmul (decode-path LLM projections).

Single-token decode is weight-READ bound: every step streams every
parameter byte through HBM (a 1B bf16 model = 2 GB/step, a ~2.4 ms
floor on v5e before any compute). Storing the projection weights as
int8 + per-output-channel f32 scales halves the bytes; this kernel
reads the int8 blocks, widens them to bf16 in VMEM and feeds the MXU,
so the convert rides the (bandwidth-bound) pipeline for free.

Fills the role of the weight-only quantized GEMMs in the reference's
serving stack (sglang W8A16, ``/root/reference/pyproject.toml`` sglang
extra); the training path is untouched — quantization happens once at
engine build (``models/llama_quant.py``).

The XLA fallback (``impl="xla"``) computes the same math as
``(x @ w.astype(bf16)) * s`` — used on CPU, for compute-bound prefill
shapes (large M), and for head dims the kernel's tiling can't express.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wo_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = (acc * s_ref[...]).astype(o_ref.dtype)


def _block_n(N: int) -> Optional[int]:
    for bn in (512, 256, 128):
        if N % bn == 0:
            return bn
    return None


def wo_matmul_pallas(
    x: jax.Array,      # (M, K) bf16/f32
    w_q: jax.Array,    # (K, N) int8
    w_s: jax.Array,    # (N,) f32 per-output-channel scales
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    _, N = w_q.shape
    bn = _block_n(N)
    assert bn is not None, f"N={N} not a multiple of 128"

    return pl.pallas_call(
        _wo_kernel,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0)),
            pl.BlockSpec((K, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, w_q, w_s.reshape(1, N).astype(jnp.float32))


def quantize_rows(x: jax.Array) -> tuple:
    """Dynamic per-row int8 quantization: (..., K) bf16/f32 ->
    ((..., K) int8, (..., 1) f32 scale) with x ~= q * scale.

    The W8A8 prefill path quantizes each activation ONCE and feeds every
    projection sharing it (q/k/v; gate/up) — measured on v5e the whole
    quantize chain fuses into the int8 dot's pipeline for ~0.05 ms at
    (8192, 4096) (benchmarks/actquant_probe.py: quantize+dot 351 TFLOP/s
    vs 372 for the dot alone, vs 138 for the bf16 dot it replaces)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    r = 127.0 / jnp.maximum(amax, 1e-6)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * r), -127, 127).astype(
        jnp.int8)
    return q, 1.0 / r


def w8a8_matmul(
    x_q: jax.Array,    # (..., K) int8 (from quantize_rows)
    x_s: jax.Array,    # (..., 1) f32 per-row scales
    w_q: jax.Array,    # (K, N) int8
    w_s: jax.Array,    # (N,) f32 per-output-channel scales
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Int8 x int8 -> int32 matmul with per-row x per-channel rescale.

    Plain XLA: the int8 dot reaches the chip's measured int8 roof at
    prefill shapes (372 TFLOP/s at M=8192 K=4096 N=14336 on v5e,
    benchmarks/w8a8_probe.py) — 2.7x the bf16 rate the W8A16 dequant
    fallback runs at. Compute-bound prefill only; decode (tiny M) stays
    on the weight-read-bound W8A16 path."""
    lead = x_q.shape[:-1]
    K = x_q.shape[-1]
    N = w_q.shape[-1]
    M = 1
    for d in lead:
        M *= d
    acc = jax.lax.dot_general(
        x_q.reshape(M, K), w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = (acc.astype(jnp.float32) * x_s.reshape(M, 1)
           * w_s.astype(jnp.float32)[None, :]).astype(out_dtype)
    return out.reshape(*lead, N)


def wo_matmul(
    x: jax.Array,      # (..., K)
    w_q: jax.Array,    # (K, N) int8
    w_s: jax.Array,    # (N,) f32
    impl: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    """Dequantizing matmul ``x @ (w_q * w_s)`` with f32 accumulation.

    Default impl is "xla": measured at decode shapes (M=16, K=2048,
    N=5632, v5e) XLA's fused convert+dot streams int8 weights at
    598 GB/s — 1.6x the wall-clock of the bf16 dot (742 GB/s on 2x the
    bytes) — while the hand-written Pallas kernel above tops out at
    ~460 GB/s (its fixed per-call pipeline cost dominates at tiny M).
    The kernel is kept for reference/experiments via impl="pallas"."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = w_q.shape[-1]
    M = 1
    for d in lead:
        M *= d
    if impl is None:
        impl = "xla"
    x2 = x.reshape(M, K)
    if impl == "pallas":
        out = wo_matmul_pallas(x2, w_q, w_s, interpret=interpret)
    else:
        acc = jax.lax.dot_general(
            x2, w_q.astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = (acc * w_s.astype(jnp.float32)[None, :]).astype(x.dtype)
    return out.reshape(*lead, N)
