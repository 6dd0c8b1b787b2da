"""W8A8 prefill feasibility probe (run on TPU).

Prefill at 8B scale is compute-bound: bucket 512 x group 16 = 8192 token
rows through K=4096 projections. The current quantized-serving prefill
runs W8A16 via the XLA dequant fallback (ops/wo_matmul.py) — a bf16 MXU
dot (~190 TFLOP/s dense roof) while the chip's int8 requant roof
measures 369-387 TFLOP/s (benchmarks/roof_probe.py). This probe
measures, at the ACTUAL 8B prefill shapes, interleaved in one process
(round-4 methodology: cross-process runs on the relay drift 10-15%):

  bf16        — x bf16 @ w bf16 (the pure-MXU baseline)
  w8a16_xla   — x bf16 @ wq.astype(bf16) * s   (current prefill path)
  w8a8_dynq   — dynamic per-row activation quantize (amax/round/clip)
                + int8 x int8 -> int32 dot + rescale: the realistic
                W8A8 prefill step
  w8a8_static — int8 x int8 -> int32 dot + rescale with the input
                already int8 (upper bound without the quantize chain)

Every iteration's input is a cheap function of the previous output
(dependent chain), so XLA cannot hoist the loop-invariant dot out of
the scan — a first cut of this probe did exactly that and reported
417 "TFLOP/s" bf16, 2.2x the chip's dense roof.

If w8a8 lands well above w8a16, the W8A8 prefill path can ride plain
XLA dots (no new kernel). Prints one JSON line.
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
    parser.add_argument("--n", type=int, default=14336)
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    M, K, N = args.m, args.k, args.n
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(M, K)) * 0.5, jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.001, 0.02, (N,)), jnp.float32)
    xq0 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)

    def chain(x, out):
        # Couple the next input to a ROW-REDUCTION of the full output:
        # a per-row max needs every one of the N columns, so XLA can
        # neither hoist the dot nor narrow it to the consumed columns
        # (a first cut consumed out[:, :K], which the algebraic
        # simplifier can legally rewrite into a K-wide dot). The reduce
        # costs one read of (M, N) bf16 (~0.3 ms at 8192x14336), paid
        # identically by every variant.
        row = jnp.max(out, axis=-1, keepdims=True).astype(jnp.bfloat16)
        return x + row * jnp.bfloat16(1e-6)

    def bf16(x, _):
        out = jax.lax.dot_general(
            x, wb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return chain(x, out)

    def w8a16_xla(x, _):
        acc = jax.lax.dot_general(
            x, wq.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return chain(x, (acc * ws[None, :]).astype(jnp.bfloat16))

    def w8a8_dynq(x, _):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        s = jnp.maximum(amax, 1e-6) / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127,
                     127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return chain(x, (acc.astype(jnp.float32) * s
                         * ws[None, :]).astype(jnp.bfloat16))

    def w8a8_static(_, q):
        acc = jax.lax.dot_general(
            q, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        row = jnp.max(acc, axis=-1, keepdims=True)  # needs all N columns
        return jnp.clip(q.astype(jnp.int32) + row % 3 - 1,
                        -127, 127).astype(jnp.int8)

    variants = {"bf16": (bf16, x0), "w8a16_xla": (w8a16_xla, x0),
                "w8a8_dynq": (w8a8_dynq, x0),
                "w8a8_static": (w8a8_static, xq0)}
    fns = {}
    for name, (f, init) in variants.items():
        uses_q = name == "w8a8_static"

        def run_many(init, _f=f, _q=uses_q):
            def body(carry, _):
                nxt = _f(None if _q else carry, carry if _q else None)
                return nxt, None
            out, _ = jax.lax.scan(body, init, None, length=args.iters)
            return jnp.sum(out[:1, :8].astype(jnp.float32))
        fns[name] = (jax.jit(run_many), init)
        float(fns[name][0](init))  # compile + warm

    flops = 2.0 * M * K * N * args.iters
    best = {name: float("inf") for name in variants}
    for _ in range(args.reps):
        for name in variants:
            fn, init = fns[name]
            t0 = time.perf_counter()
            float(fn(init))
            best[name] = min(best[name], time.perf_counter() - t0)

    out = {"metric": "w8a8_prefill_probe", "m": M, "k": K, "n": N,
           **{f"{name}_tflops": round(flops / best[name] / 1e12, 1)
              for name in variants}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
