"""Per-stage timing of the fused W8A8 ViT encoder at bench shapes.

The int8 requant-chain roof measures 378.7 TFLOP/s
(benchmarks/roof_probe.py) while the full encode pipeline runs at ~222
effective — this probe times the two halves of a layer in isolation to
locate the loss. Each half is a NATURALLY CHAINED pair (the output int8
tensor feeds the next iteration's input) so XLA cannot hoist the loop
body as loop-invariant:

- attn half:  [QKV + int8 attention] -> oproj_ln_quant  (xq2 feeds back)
- mlp half:   fc1_gelu_quant -> fc2_res_ln_quant        (xqn feeds back)

(The standalone ln_quant runs once per FORWARD, not per layer — the
per-layer LNs live inside the oproj/fc2 epilogues.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--loops", type=int, default=24)
    ap.add_argument("--block-rows", type=int, default=1056)
    ap.add_argument("--block-imgs", type=int, default=4)
    ap.add_argument("--static-smax", type=int, default=1,
                    help="use the calibrated static softmax stabilizer "
                         "(scales6 row 3) instead of the row-max reduce")
    ap.add_argument("--fuse-l", type=int, default=1,
                    help="denominator from the PV dot's free ones-column "
                         "lane (static-smax path only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimeditron_tpu.ops.vit_int8_fused import (
        fc1_gelu_quant,
        fc2_res_ln_quant,
        oproj_ln_quant,
        qkv_attn_int8,
    )

    B, S, D, F, H = args.batch, 257, 1024, 4096, 16
    Sp = (S + 7) // 8 * 8
    M = B * Sp
    L = args.loops
    rng = np.random.default_rng(0)

    def i8(*shape):
        return jnp.asarray(rng.integers(-127, 128, shape, dtype=np.int8))

    def bf(*shape):
        return jnp.asarray(rng.normal(size=shape) * 0.1, jnp.bfloat16)

    tiny = jnp.zeros((8, 128), jnp.float32)
    sync = jax.jit(lambda x: jnp.sum(x) + 1.0)
    float(sync(tiny))
    rt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(sync(tiny))
        rt = min(rt, time.perf_counter() - t0)

    def timed(fn, *xs):
        r = jax.jit(fn)
        float(np.asarray(r(*xs)).ravel()[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(r(*xs)).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return max(best - rt, 1e-9) / L

    lnw, lnb = bf(D), bf(D)
    xres = bf(M, D)
    s = jnp.float32(0.05)

    results = {}

    # ---- attention half: qkv_attn -> oproj_ln (chained through xq2) ----
    wqkv = i8(3, D, D)
    ws = jnp.asarray(rng.uniform(0.001, 0.01, (3, 1, D)), jnp.float32)
    qkv_b = jnp.asarray(rng.normal(size=(3, 1, D)) * 0.01, jnp.float32)
    scales6 = jnp.asarray(rng.uniform(0.01, 0.1, (6, 1)), jnp.float32)
    if args.static_smax:
        # row 3 = static softmax stabilizer (base-2): upper-bound of
        # |acc| * qk_scale * log2e for the random int8 inputs
        # keep scores bounded under the static stabilizer (random int8
        # accs reach ~1e6; a tiny qk scale keeps exp2 finite)
        scales6 = scales6.at[4, 0].set(1e-5)
        scales6 = scales6.at[3, 0].set(30.0)
    wo = i8(D, D)
    wo_s = jnp.asarray(rng.uniform(0.001, 0.01, (D,)), jnp.float32)
    o_b = jnp.asarray(rng.normal(size=(D,)) * 0.01, jnp.float32)

    def run_attn_half(xq0):
        def body(i, carry):
            xq, _ = carry
            o = qkv_attn_int8(xq.reshape(B, Sp, D), wqkv, ws, qkv_b,
                              scales6, H, S, block_imgs=args.block_imgs,
                              static_smax=args.static_smax,
                              fuse_l=bool(args.fuse_l),
                              out_dtype=jnp.bfloat16)
            xp, xq2 = oproj_ln_quant(o.reshape(M, D), xres, wo, wo_s, o_b,
                                     lnw, lnb, s, s, 1e-5,
                                     block_rows=args.block_rows)
            return (xq2, xp)

        xq, xp = jax.lax.fori_loop(0, L, body, (xq0, xres))
        return xp.astype(jnp.float32).sum()

    attn_flops = 3 * 2 * M * D * D + 2 * 2 * B * S * S * (D // H) * H \
        + 2 * M * D * D
    dt = timed(run_attn_half, i8(M, D))
    results["attn_half"] = {"us_per_layer": round(dt * 1e6, 1),
                            "tflops": round(attn_flops / dt / 1e12, 1)}

    # ---- MLP half: fc1 -> fc2 (chained through xqn) ----
    w1 = i8(D, F)
    w1_s = jnp.asarray(rng.uniform(0.001, 0.01, (F,)), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(F,)) * 0.01, jnp.float32)
    w2 = i8(F, D)
    w2_s = jnp.asarray(rng.uniform(0.001, 0.01, (D,)), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(D,)) * 0.01, jnp.float32)

    def run_mlp_half(xq0):
        def body(i, carry):
            xq, xp = carry
            hq = fc1_gelu_quant(xq, w1, w1_s, b1, s, s, "quick_gelu",
                                block_rows=args.block_rows)
            xn, xqn = fc2_res_ln_quant(hq, xp, w2, w2_s, b2, lnw, lnb,
                                       s, s, 1e-5,
                                       block_rows=args.block_rows)
            return (xqn, xn)

        xq, xn = jax.lax.fori_loop(0, L, body, (xq0, xres))
        return xn.astype(jnp.float32).sum()

    mlp_flops = 4 * M * D * F
    dt = timed(run_mlp_half, i8(M, D))
    results["mlp_half"] = {"us_per_layer": round(dt * 1e6, 1),
                           "tflops": round(mlp_flops / dt / 1e12, 1)}

    total_us = sum(v["us_per_layer"] for v in results.values())
    layer_flops = attn_flops + mlp_flops
    results["_layer_total"] = {
        "us_per_layer": round(total_us, 1),
        "tflops": round(layer_flops / (total_us * 1e-6) / 1e12, 1),
        "implied_img_s": round(B / (24 * total_us * 1e-6), 1),
    }

    # ---- isolate the attn half's two kernels (attribution only; each
    # chain adds one cheap elementwise/copy op as the loop carrier, so
    # absolute numbers skew slightly high) ----
    def run_qkv_attn_only(xq0):
        def body(i, xq):
            o = qkv_attn_int8(xq.reshape(B, Sp, D), wqkv, ws, qkv_b,
                              scales6, H, S, block_imgs=args.block_imgs,
                              static_smax=args.static_smax,
                              fuse_l=bool(args.fuse_l),
                              out_dtype=jnp.bfloat16).reshape(M, D)
            return jnp.clip(jnp.round(o.astype(jnp.float32) * 20.0),
                            -127, 127).astype(jnp.int8)

        return jax.lax.fori_loop(0, L, body, xq0).astype(jnp.float32).sum()

    qkv_attn_flops = 3 * 2 * M * D * D + 2 * 2 * B * S * S * (D // H) * H
    dt = timed(run_qkv_attn_only, i8(M, D))
    results["qkv_attn_only"] = {
        "us_per_layer": round(dt * 1e6, 1),
        "tflops": round(qkv_attn_flops / dt / 1e12, 1)}

    # ---- merged MLP half: one kernel, hidden stays in VMEM ----
    from multimeditron_tpu.ops.vit_int8_fused import mlp_fused

    def run_mlp_fused(xq0):
        def body(i, carry):
            xq, xp = carry
            xn, xqn = mlp_fused(xq, xp, w1, w1_s, b1, w2, w2_s, b2,
                                lnw, lnb, s, s, s, 1e-5,
                                "quick_gelu", block_rows=args.block_rows)
            return (xqn, xn)

        xq, xn = jax.lax.fori_loop(0, L, body, (xq0, xres))
        return xn.astype(jnp.float32).sum()

    dt = timed(run_mlp_fused, i8(M, D))
    results["mlp_fused"] = {"us_per_layer": round(dt * 1e6, 1),
                            "tflops": round(mlp_flops / dt / 1e12, 1)}

    def run_oproj_only(o0):
        def body(i, o):
            xp, _ = oproj_ln_quant(o, xres, wo, wo_s, o_b, lnw, lnb,
                                   s, s, 1e-5, block_rows=args.block_rows)
            return xp

        return jax.lax.fori_loop(0, L, body, o0).astype(jnp.float32).sum()

    dt = timed(run_oproj_only, bf(M, D))
    results["oproj_only"] = {
        "us_per_layer": round(dt * 1e6, 1),
        "tflops": round(2 * M * D * D / dt / 1e12, 1)}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
