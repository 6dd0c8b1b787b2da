"""Does this chip run int4xint4 matmuls faster than int8?

VERDICT r2 item 4 suggested W4A8/int4 as the only remaining lever past
the int8 requant roof (368.9 TFLOP/s measured, roof_probe.py). This
probe answers the prerequisite question: measure dependent matmul
chains at the encoder's geometry in int8 vs int4 operands. If int4 runs
at the same rate (v5e's MXU may not double int4), the lever is dead and
the 2,000 img/s target stays roof-limited on this hardware.

Run: python benchmarks/int4_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n, count, repeats = 4096, 8, 4
    rng = np.random.default_rng(0)

    def bench(dtype, clip):
        # Independent n-cube integer matmuls, scalar-reduced (the same
        # structure as roof_probe.bf16_dense_roof): measures the pure MXU
        # rate per operand width. The f32 reduce is ~1/8000 of the dot's
        # FLOPs at n=4096.
        x = jnp.asarray(rng.integers(-clip, clip + 1, (n, n)), dtype)
        w = jnp.asarray(rng.integers(-clip, clip + 1, (count, n, n)), dtype)

        @jax.jit
        def run(x, w):
            def sweep(r, acc):
                def body(acc, wi):
                    y = jax.lax.dot_general(
                        x, wi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    return acc + jnp.sum(y), None

                acc, _ = jax.lax.scan(body, acc, w)
                return acc

            return jax.lax.fori_loop(0, repeats, sweep, jnp.zeros((), jnp.int32))

        float(run(x, w))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, w))
            best = min(best, time.perf_counter() - t0)
        flops = repeats * count * 2 * n ** 3
        return flops / best / 1e12

    def bench_int4_ingraph():
        # int4 arrays cannot be transferred through the axon relay
        # (dispatch fails with a recursive-jit error), so cast IN-GRAPH
        # from int8 — the dots still run on int4 operands.
        x8 = jnp.asarray(rng.integers(-7, 8, (n, n)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-7, 8, (count, n, n)), jnp.int8)

        @jax.jit
        def run(x8, w8):
            x = x8.astype(jnp.int4)
            w = w8.astype(jnp.int4)

            def sweep(r, acc):
                def body(acc, wi):
                    y = jax.lax.dot_general(
                        x, wi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    return acc + jnp.sum(y), None

                acc, _ = jax.lax.scan(body, acc, w)
                return acc

            return jax.lax.fori_loop(0, repeats, sweep,
                                     jnp.zeros((), jnp.int32))

        float(run(x8, w8))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x8, w8))
            best = min(best, time.perf_counter() - t0)
        return repeats * count * 2 * n ** 3 / best / 1e12

    out = {}
    out["int8_tflops"] = round(bench(jnp.int8, 127), 1)
    try:
        out["int4_tflops"] = round(bench_int4_ingraph(), 1)
        out["int4_speedup"] = round(out["int4_tflops"] / out["int8_tflops"], 3)
    except Exception as e:
        out["int4_error"] = str(e)[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
