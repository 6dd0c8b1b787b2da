"""In-process A/B of the full int8 encode pipeline under kernel flag
combinations. Cross-process img/s comparisons on the axon relay carry
~10-15% clock/relay drift, which silently swallows real 5% kernel wins;
this bench compiles every variant in ONE process and interleaves the
timed repetitions round-robin so all variants see the same conditions.
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
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--variants",
        default="old:0:0:0,fuse:0:1:0,trio:1:1:1",
        help="name:bf16_qk:fuse_l:store_p[:block_imgs[:int8_o[:approx_gelu"
             "[:fast_ln[:block_rows[:bf16_scores[:ph_exp2[:fc1_w_outer"
             "[:fc1_block_cols]]]]]]]]] comma list")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimeditron_tpu.models.projector import (
        init_mlp_projector,
        mlp_projector_forward_int8,
        quantize_mlp_projector,
    )
    from multimeditron_tpu.models.vit import ViTConfig, init_vit_params
    from multimeditron_tpu.ops.image_ops import preprocess_images_device
    from multimeditron_tpu.ops.vit_int8_fused import (
        calibrate_vit_int8_fused,
        pack_vit_int8_fused,
        vit_forward_int8_fused,
    )

    cfg = ViTConfig(image_size=224, patch_size=14, hidden_size=1024,
                    num_layers=24, num_heads=16, intermediate_size=4096,
                    dtype=jnp.bfloat16)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    proj = init_mlp_projector(jax.random.PRNGKey(1), 1024, 4096,
                              dtype=jnp.bfloat16)
    packed = pack_vit_int8_fused(params)
    qproj = quantize_mlp_projector(proj)
    B, iters = args.batch, args.iters
    rng = np.random.default_rng(0)
    stack = jnp.asarray(
        rng.integers(0, 256, (iters, B, 224, 224, 3), dtype=np.uint8))
    calib = preprocess_images_device(stack[0][:16], cfg.image_size)
    scales = jax.jit(calibrate_vit_int8_fused, static_argnums=(1,))(
        params, cfg, calib)

    def make(bf16_qk, fuse_l, store_p, block_imgs=4, int8_o=False,
             approx_gelu=False, fast_ln=False, block_rows=1056,
             bf16_scores=False, ph_exp2=False, fc1_w_outer=False,
             fc1_block_cols=2048):
        @jax.jit
        def run(packed, qproj, scales, stack):
            def body(acc, img):
                px = preprocess_images_device(img, cfg.image_size)
                f = vit_forward_int8_fused(
                    packed, cfg, px, scales, bf16_qk=bf16_qk,
                    fuse_l=fuse_l, store_p=store_p,
                    attn_block_imgs=block_imgs, int8_o=int8_o,
                    approx_gelu=approx_gelu, fast_ln=fast_ln,
                    block_rows=block_rows, bf16_scores=bf16_scores,
                    ph_exp2=ph_exp2, fc1_w_outer=fc1_w_outer,
                    fc1_block_cols=fc1_block_cols)
                out = mlp_projector_forward_int8(qproj, f)
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), stack)
            return acc
        return run

    variants = {}
    for spec in args.variants.split(","):
        parts = spec.split(":")
        name, a, b, c = parts[:4]
        g = int(parts[4]) if len(parts) > 4 else 4
        i8o = bool(int(parts[5])) if len(parts) > 5 else False
        ag = bool(int(parts[6])) if len(parts) > 6 else False
        fln = bool(int(parts[7])) if len(parts) > 7 else False
        br = int(parts[8]) if len(parts) > 8 else 1056
        b16s = bool(int(parts[9])) if len(parts) > 9 else False
        phe = bool(int(parts[10])) if len(parts) > 10 else False
        fwo = bool(int(parts[11])) if len(parts) > 11 else False
        fbc = int(parts[12]) if len(parts) > 12 else 2048
        variants[name] = make(bool(int(a)), bool(int(b)), bool(int(c)),
                              g, i8o, ag, fln, br, b16s, phe, fwo, fbc)

    for f in variants.values():
        float(f(packed, qproj, scales, stack))
    best = {k: float("inf") for k in variants}
    for _ in range(args.reps):
        for k, f in variants.items():
            t0 = time.perf_counter()
            float(f(packed, qproj, scales, stack))
            best[k] = min(best[k], time.perf_counter() - t0)
    n = B * iters
    print(json.dumps({k: round(n / v, 1) for k, v in best.items()}))


if __name__ == "__main__":
    main()
