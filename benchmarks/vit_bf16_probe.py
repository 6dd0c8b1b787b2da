"""Where does the bf16 ViT-L/14 encode time go? (round-3 item: lift the
training-path tower from ~750 img/s toward the bf16 roof).

Times ablated variants of the tower at the bench shapes and prints the
implied TFLOP/s of each. The bf16 ceiling for the full pipeline is
roof_bf16 / 0.17 TFLOP-per-image ≈ 960 img/s at the measured 163 TFLOP/s
dense roof — see benchmarks/roof_probe.py.
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
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--variants", default="full,tower,xla,matmul",
                    help="Comma-separated subset (each compiles a large "
                         "graph; the relay makes 4 compiles ~10 min)")
    args = ap.parse_args()
    variants = set(args.variants.split(","))

    import jax
    import jax.numpy as jnp

    from multimeditron_tpu.models.projector import (
        init_mlp_projector,
        mlp_projector_forward,
    )
    from multimeditron_tpu.models.vit import (
        ViTConfig,
        init_vit_params,
        vit_forward,
    )
    from multimeditron_tpu.ops.image_ops import preprocess_images_device

    cfg = ViTConfig(
        image_size=224, patch_size=14, hidden_size=1024, num_layers=24,
        num_heads=16, intermediate_size=4096, dtype=jnp.bfloat16,
    )
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    proj = init_mlp_projector(jax.random.PRNGKey(1), 1024, 4096,
                              dtype=jnp.bfloat16)
    B, iters = args.batch, args.iters
    rng = np.random.default_rng(0)
    stack = jnp.asarray(
        rng.integers(0, 256, (iters, B, 224, 224, 3), dtype=np.uint8))

    S, D, F, L = cfg.seq_len, 1024, 4096, 24
    flops_layer = 4 * 2 * S * D * D + 2 * 2 * S * D * F + 2 * 2 * S * S * D
    flops_tower = L * flops_layer + 2 * S * (14 * 14 * 3) * D
    flops_proj = 2 * (S - 1) * (D * D + D * F + F * F)
    flops_attn = L * 2 * 2 * S * S * D

    def timed(fn, *xs):
        r = jax.jit(fn)
        float(r(params, proj, *xs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(r(params, proj, *xs))
            best = min(best, time.perf_counter() - t0)
        return best

    def scan_over(stack, body):
        def wrap(acc, img):
            return acc + body(img), None
        acc, _ = jax.lax.scan(wrap, jnp.zeros((), jnp.float32), stack)
        return acc

    results = {}

    # full pipeline (bench bf16 path); params/proj are jit ARGS — closing
    # over them embeds them as constants and blows the remote-compile
    # payload limit (HTTP 413) on the axon relay
    def full(params, proj, stack):
        def body(img):
            px = preprocess_images_device(img, cfg.image_size)
            f = vit_forward(params, cfg, px)
            return jnp.sum(mlp_projector_forward(proj, f).astype(jnp.float32))
        return scan_over(stack, body)

    n = B * iters
    if "full" in variants:
        dt = timed(full, stack)
        results["full_img_s"] = n / dt
        results["full_tflops"] = n * (flops_tower + flops_proj) / dt / 1e12

    # tower only, Pallas encoder attention
    def tower(params, proj, stack):
        def body(img):
            px = preprocess_images_device(img, cfg.image_size)
            return jnp.sum(vit_forward(params, cfg, px).astype(jnp.float32))
        return scan_over(stack, body)

    if "tower" in variants:
        dt = timed(tower, stack)
        results["tower_img_s"] = n / dt
        results["tower_tflops"] = n * flops_tower / dt / 1e12

    # tower with XLA attention (is the Pallas encoder kernel winning?)
    def tower_xla(params, proj, stack):
        def body(img):
            px = preprocess_images_device(img, cfg.image_size)
            return jnp.sum(
                vit_forward(params, cfg, px, attn_impl="xla").astype(jnp.float32))
        return scan_over(stack, body)

    if "xla" in variants:
        dt = timed(tower_xla, stack)
        results["tower_xla_attn_img_s"] = n / dt

    # matmuls only: same layer structure, attention replaced by identity,
    # LN replaced by a scale (keeps shapes; drops VPU cost) -> upper bound
    def tower_mm(params, proj, stack):
        lp = params["layers"]
        def body(img):
            px = preprocess_images_device(img, cfg.image_size)
            from multimeditron_tpu.models.vit import patchify
            x = patchify(px.astype(cfg.dtype), cfg.patch_size)
            x = x @ params["patch_proj"]
            cls = jnp.broadcast_to(params["cls_token"], (B, 1, D)).astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=1)

            def layer(x, w):
                q = x @ w["q_proj"]
                k = x @ w["k_proj"]
                v = x @ w["v_proj"]
                o = (q + k + v) @ w["o_proj"]
                x = x + o
                h = x @ w["fc1"]
                x = x + h @ w["fc2"]
                return x, None

            x, _ = jax.lax.scan(layer, x, lp)
            return jnp.sum(x.astype(jnp.float32))
        return scan_over(stack, body)

    if "matmul" in variants:
        dt = timed(tower_mm, stack)
        mm_flops = n * (L * (4 * 2 * S * D * D + 2 * 2 * S * D * F))
        results["matmul_only_img_s"] = n / dt
        results["matmul_only_tflops"] = mm_flops / dt / 1e12

    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
