"""Measure flash attention fwd/bwd (RT-corrected, min-of-N in one process).

Usage: python benchmarks/flash_bench.py [fwd|bwd] [block_q] [block_k] [D] [S]
"""
import os, time, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from multimeditron_tpu.ops.flash_attention import flash_attention

mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
bq = int(sys.argv[2]) if len(sys.argv) > 2 else 0
bk = int(sys.argv[3]) if len(sys.argv) > 3 else 0
D = int(sys.argv[4]) if len(sys.argv) > 4 else 128
S = int(sys.argv[5]) if len(sys.argv) > 5 else 4096

B, H = 4, 32
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.3, dtype=jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.3, dtype=jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.3, dtype=jnp.bfloat16)
reps = 24
FL_FWD = 4 * B * H * S * S * D / 2  # causal halves the work
kw = {}
if bq: kw["block_q"] = bq
if bk: kw["block_k"] = bk

if mode == "fwd":
    @jax.jit
    def f(q, k, v):
        def body(c, _):
            o = flash_attention(q + c, k, v, causal=True, **kw)
            return c + o[0, 0, 0, :8].astype(jnp.float32).sum() * 1e-30, None
        return jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=reps)[0]
    run, FL, label = f, FL_FWD, "fwd"
else:
    def loss(q, k, v):
        o = flash_attention(q, k, v, causal=True, **kw)
        return jnp.sum(o.astype(jnp.float32) * 1e-6)
    grad = jax.grad(loss, argnums=(0, 1, 2))
    @jax.jit
    def g(q, k, v):
        def body(c, _):
            dq, dk, dv = grad(q + c, k, v)
            return c + dq[0, 0, 0, :8].astype(jnp.float32).sum() * 1e-30, None
        return jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=reps)[0]
    run, FL, label = g, FL_FWD * 3.5, "fwd+bwd"

float(run(q, k, v))  # warmup/compile
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    float(run(q, k, v))
    best = min(best, time.perf_counter() - t0)
per = (best - 0.030) / reps
print(f"{label} S={S} D={D} bq={bq} bk={bk}: {per*1e3:7.2f} ms  "
      f"{FL/per/1e12:6.1f} TFLOP/s", flush=True)
