"""Activation-quantize chain formulations (run on TPU).

w8a8_probe measured the per-row dynamic quantize of an (8192, 4096) bf16
activation at ~2.4 ms — 10x what a few VPU passes should cost — dragging
W8A8 prefill from the 372 TFLOP/s int8 dot rate down to 192. This probe
times quantize FORMULATIONS (each: bf16 x -> int8 q + f32 per-row scale,
chained so XLA can't hoist), interleaved in one process:

  f32_div      — the w8a8_probe original: f32 upcast, amax, divide,
                 round, clip, astype
  f32_recip    — multiply by reciprocal instead of divide
  bf16_amax    — amax reduced in bf16, multiply in f32
  fused_dot    — quantize + the int8 dot in ONE jit (does XLA fuse the
                 chain into the dot's operand pipeline?)
  static_scale — fixed per-tensor scale (no amax): the reduction's share

Prints one JSON line of ms per quantize (and TFLOP/s for fused_dot).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--m", type=int, default=8192)
    parser.add_argument("--k", type=int, default=4096)
    parser.add_argument("--iters", type=int, default=24)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    M, K = args.m, args.k
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(M, K)) * 0.5, jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 128, (K, K)), jnp.int8)

    def f32_div(x):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        s = jnp.maximum(amax, 1e-6) / 127.0
        q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        return q, s

    def f32_recip(x):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        r = 127.0 / jnp.maximum(amax, 1e-6)
        q = jnp.clip(jnp.round(xf * r), -127, 127).astype(jnp.int8)
        return q, 1.0 / r

    def bf16_amax(x):
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
        r = (127.0 / jnp.maximum(amax, 1e-6))
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * r), -127,
                     127).astype(jnp.int8)
        return q, 1.0 / r

    def static_scale(x):
        r = jnp.float32(127.0 / 3.0)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * r), -127,
                     127).astype(jnp.int8)
        return q, jnp.full((M, 1), 1.0 / r, jnp.float32)

    quants = {"f32_div": f32_div, "f32_recip": f32_recip,
              "bf16_amax": bf16_amax, "static_scale": static_scale}

    fns = {}
    for name, qf in quants.items():
        def run(x, _qf=qf):
            def body(carry, _):
                q, s = _qf(carry)
                # couple via a per-row reduce of the FULL q tensor: needs
                # every column, so XLA cannot narrow the quantize to the
                # consumed slice (a first cut consumed q[:, :1] and
                # measured sub-roundtrip times — everything was DCE'd)
                row = jnp.min(q, axis=-1, keepdims=True).astype(
                    jnp.bfloat16)
                nxt = carry + row * jnp.bfloat16(1e-6)
                return nxt, None
            out, _ = jax.lax.scan(body, x, None, length=args.iters)
            return jnp.sum(out[:1, :8].astype(jnp.float32))
        fns[name] = jax.jit(run)
        float(fns[name](x0))

    # fused_dot: quantize + int8 dot in one fusion opportunity
    def fused_dot(x):
        def body(carry, _):
            amax = jnp.max(jnp.abs(carry), axis=-1,
                           keepdims=True).astype(jnp.float32)
            r = 127.0 / jnp.maximum(amax, 1e-6)
            q = jnp.clip(jnp.round(carry.astype(jnp.float32) * r), -127,
                         127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                q, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            row = jnp.max(acc, axis=-1, keepdims=True)  # full-width reduce
            nxt = carry + (row.astype(jnp.bfloat16) * jnp.bfloat16(1e-12))
            return nxt, None
        out, _ = jax.lax.scan(body, x, None, length=args.iters)
        return jnp.sum(out[:1, :8].astype(jnp.float32))

    fns["fused_dot"] = jax.jit(fused_dot)
    float(fns["fused_dot"](x0))

    best = {name: float("inf") for name in fns}
    for _ in range(args.reps):
        for name in fns:
            t0 = time.perf_counter()
            float(fns[name](x0))
            best[name] = min(best[name], time.perf_counter() - t0)

    rt = 0.030
    per_ms = {name: (best[name] - rt) / args.iters * 1000 for name in fns}
    dot_flops = 2.0 * M * K * K
    out = {"metric": "actquant_probe", "m": M, "k": K,
           **{f"{n}_ms": round(v, 3) for n, v in per_ms.items()},
           "fused_dot_tflops": round(
               dot_flops / (per_ms["fused_dot"] / 1000) / 1e12, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
