"""Rigorous per-stage attribution of the fused [QKV + int8 attention]
kernel — the VPU-bound half of the W8A8 ViT-L encode (round-4 item: prove
what the attention half's floor is, with the same rigor as int4_probe.py).

Methodology
-----------
Cross-process A/B of this kernel is unreliable on the axon relay: the
identical oproj chain measured 1,155 vs 1,349 us/layer in two back-to-back
processes (~17% swing). This probe instead times ABLATED variants of the
real kernel in ONE process with interleaved repetitions (variant order
round-robin inside each rep, min over reps), so every variant sees the
same clock/relay conditions:

  full        the shipping kernel (static-smax, fuse_l)
  no_exp2     softmax exp2 replaced by a plain bf16 cast       -> exp2 pass
  no_pv       PV dots replaced by storing a p slice            -> PV dots
  no_qk       QK dots replaced by casting a q8 slice           -> QK dots
  no_proj     QKV projection dots replaced by slicing xq       -> proj dots
  dots_only   scores stored, consume = slice-store only        -> whole consume

Each ablation keeps every OTHER stage (and its VMEM traffic) intact, so
``t(full) - t(variant)`` is that stage's marginal cost in context —
including whatever MXU/VPU overlap Mosaic actually achieves, which
synthetic primitive benches overstate.

The composite ceiling follows: with S=257 (CLIP-L), per-image per-layer
the kernel MUST execute the proj dots + QK dots + PV dots (MXU) and at
least one exp2-and-cast pass over the (H*Sp, Sp) score tensor (VPU).
Summing the marginal costs of those stages (perfect-overlap optimism:
take max(MXU-stages, VPU-stages) instead of the sum) gives the floor
printed as ``floor_us``; the implied whole-pipeline img/s ceiling adds
the measured oproj+MLP half from vit_int8_stage_probe.
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


def build_kernel(num_heads, kv_len, skip):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kern(xq_ref, w_ref, ws_ref, b_ref, sc_ref, o_ref, s_scr, v_scr):
        G, Sp, D = xq_ref.shape
        dh = D // num_heads
        x2 = xq_ref[:].reshape(G * Sp, D)
        s0 = sc_ref[0, 0]

        def i8dot(a, b, dims):
            return jax.lax.dot_general(a, b, (dims, ((), ())),
                                       preferred_element_type=jnp.int32)

        if skip == "no_proj":
            q8, k8 = x2, x2
            v16 = x2.astype(jnp.bfloat16)
        else:
            qkv = []
            for j in range(3):
                acc = i8dot(x2, w_ref[j], ((1,), (0,)))
                val = acc.astype(jnp.float32) * (ws_ref[j] * s0) + b_ref[j]
                qkv.append(
                    jnp.clip(jnp.round(val * sc_ref[1 + j, 0]), -127, 127)
                    .astype(jnp.int8) if j < 2 else val.astype(jnp.bfloat16))
            q8, k8, v16 = qkv

        a = sc_ref[4, 0] * 1.4426950408889634
        shift = sc_ref[3, 0]
        maskrow = None
        if kv_len < Sp:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, Sp), 1)
            maskrow = jnp.where(lane < kv_len, 0.0, -1e30)

        def dots(g, slot):
            rows = slice(g * Sp, (g + 1) * Sp)
            qg, kg = q8[rows], k8[rows]
            vg = v16[rows]
            ones = jnp.ones((Sp, 1), v16.dtype)
            for h in range(num_heads):
                v_scr[slot, :, h * 128:h * 128 + dh] = vg[:, h * dh:(h + 1) * dh]
                v_scr[slot, :, h * 128 + dh:h * 128 + dh + 1] = ones
            for h in range(num_heads):
                sl = slice(h * dh, (h + 1) * dh)
                if skip == "no_qk":
                    raw = qg[:, :Sp].astype(jnp.float32) * a - shift
                else:
                    raw = i8dot(qg[:, sl], kg[:, sl], ((1,), (1,))).astype(
                        jnp.float32) * a - shift
                if maskrow is not None:
                    raw = raw + maskrow
                s_scr[slot, pl.ds(h * Sp, Sp), :] = raw

        def consume(g, slot):
            sc = s_scr[slot]
            if skip == "dots_only":
                for h in range(num_heads):
                    o_ref[g, :, h * dh:(h + 1) * dh] = sc[
                        h * Sp:h * Sp + Sp, :dh].astype(o_ref.dtype)
                return
            if skip == "no_exp2":
                pb = sc.astype(jnp.bfloat16)
            else:
                pb = jnp.exp2(sc).astype(jnp.bfloat16)
            for h in range(num_heads):
                if skip == "no_pv":
                    o_ref[g, :, h * dh:(h + 1) * dh] = pb[
                        h * Sp:(h + 1) * Sp, :dh].astype(o_ref.dtype)
                    continue
                acc = jax.lax.dot_general(
                    pb[h * Sp:(h + 1) * Sp, :],
                    v_scr[slot, :, h * 128:(h + 1) * 128],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                linv = pl.reciprocal(
                    jnp.maximum(acc[:, dh:dh + 1], 1e-30), approx=True)
                o_ref[g, :, h * dh:(h + 1) * dh] = (
                    acc[:, :dh] * linv).astype(o_ref.dtype)

        dots(0, 0)
        for g in range(G):
            if g + 1 < G:
                dots(g + 1, (g + 1) % 2)
            consume(g, g % 2)

    return kern


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--loops", type=int, default=24)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--block-imgs", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, D, H = args.batch, 257, 1024, 16
    Sp = (S + 7) // 8 * 8
    M, L, G = B * Sp, args.loops, args.block_imgs
    rng = np.random.default_rng(0)

    xq0 = jnp.asarray(rng.integers(-127, 128, (B, Sp, D), dtype=np.int8))
    wqkv = jnp.asarray(rng.integers(-127, 128, (3, D, D), dtype=np.int8))
    ws = jnp.asarray(rng.uniform(0.001, 0.01, (3, 1, D)), jnp.float32)
    qkv_b = jnp.asarray(rng.normal(size=(3, 1, D)) * 0.01, jnp.float32)
    scales6 = jnp.asarray(rng.uniform(0.01, 0.1, (6, 1)), jnp.float32)
    scales6 = scales6.at[4, 0].set(1e-5)   # keep exp2 finite on random int8
    scales6 = scales6.at[3, 0].set(30.0)

    def make(skip):
        kern = build_kernel(H, S, skip)
        spec = pl.BlockSpec((G, Sp, D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kern,
            grid=(B // G,),
            in_specs=[
                spec,
                pl.BlockSpec((3, D, D), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 1, D), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 1, D), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, Sp, D), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((2, H * Sp, Sp), jnp.float32),
                pltpu.VMEM((2, Sp, H * 128), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

        def chain(xq):
            def body(i, x):
                o = call(x, wqkv, ws, qkv_b, scales6)
                return jnp.clip(jnp.round(o.astype(jnp.float32) * 20.0),
                                -127, 127).astype(jnp.int8)
            return jax.lax.fori_loop(0, L, body, xq).astype(jnp.float32).sum()

        return jax.jit(chain)

    # ---- section 2: library-kernel config A/B (same interleaved
    # methodology; times qkv_attn_int8 under flag combinations) ----
    from multimeditron_tpu.ops.vit_int8_fused import qkv_attn_int8

    def make_cfg(fuse_l, bf16_qk, block_g=None, store_p=False):
        def chain(xq):
            def body(i, x):
                o = qkv_attn_int8(x, wqkv, ws, qkv_b, scales6, H, S,
                                  block_imgs=block_g or G, static_smax=True,
                                  allow_packed=False, fuse_l=fuse_l,
                                  bf16_qk=bf16_qk, store_p=store_p)
                return jnp.clip(jnp.round(o.astype(jnp.float32) * 20.0),
                                -127, 127).astype(jnp.int8)
            return jax.lax.fori_loop(0, L, body, xq).astype(jnp.float32).sum()
        return jax.jit(chain)

    cfgs = {
        "int8qk_nofuse": make_cfg(False, False),
        "fuse_l": make_cfg(True, False),
        "store_p": make_cfg(True, False, store_p=True),
        "store_p_g2": make_cfg(True, False, store_p=True, block_g=2),
        "store_p_g8": make_cfg(True, False, store_p=True, block_g=8),
        "store_p_bf16qk": make_cfg(True, True, store_p=True),
    }
    for f in cfgs.values():
        float(np.asarray(f(xq0)))
    bestc = {k: float("inf") for k in cfgs}
    for _ in range(args.reps):
        for k, f in cfgs.items():
            t0 = time.perf_counter()
            float(np.asarray(f(xq0)))
            bestc[k] = min(bestc[k], time.perf_counter() - t0)
    print(json.dumps({"config_us": {
        k: round(v / L * 1e6, 1) for k, v in bestc.items()}}))

    variants = ["full", "no_exp2", "no_pv", "no_qk", "no_proj", "dots_only"]
    fns = {v: make(v) for v in variants}
    for v in variants:                      # compile + warm
        float(np.asarray(fns[v](xq0)))

    best = {v: float("inf") for v in variants}
    for _ in range(args.reps):
        for v in variants:                  # interleaved: same conditions
            t0 = time.perf_counter()
            float(np.asarray(fns[v](xq0)))
            best[v] = min(best[v], time.perf_counter() - t0)

    us = {v: best[v] / L * 1e6 for v in variants}
    out = {v: round(us[v], 1) for v in variants}
    marg = {
        "exp2_pass": us["full"] - us["no_exp2"],
        "pv_dots": us["full"] - us["no_pv"],
        "qk_dots": us["full"] - us["no_qk"],
        "proj_dots": us["full"] - us["no_proj"],
        "consume_total": us["full"] - us["dots_only"],
    }
    out["marginal_us"] = {k: round(v, 1) for k, v in marg.items()}
    # Floor: required MXU stages + required VPU pass, perfect overlap.
    mxu = marg["proj_dots"] + marg["qk_dots"] + marg["pv_dots"]
    vpu = marg["exp2_pass"]
    out["floor_us_perfect_overlap"] = round(max(mxu, vpu), 1)
    out["floor_us_no_overlap"] = round(mxu + vpu, 1)
    out["slack_vs_full_us"] = round(us["full"] - max(mxu, vpu), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
