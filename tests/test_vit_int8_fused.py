"""Parity tests for the fused-Pallas W8A8 ViT path.

The fused path must reproduce the static-scales int8 reference
(``vit_forward_int8``) and stay close to the bf16 tower — the same
contract the round-1 int8 path was verified against.
"""

import os
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimeditron_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
from multimeditron_tpu.models.vit_quant import (
    calibrate_act_scales,
    quantize_vit_params,
    vit_forward_int8,
)
from multimeditron_tpu.ops.vit_int8_fused import (
    calibrate_vit_int8_fused,
    pack_vit_int8_fused,
    vit_forward_int8_fused,
)


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


@pytest.fixture(scope="module")
def small_tower():
    cfg = ViTConfig(
        image_size=28,
        patch_size=14,
        hidden_size=128,
        num_layers=3,
        num_heads=4,
        intermediate_size=256,
        dtype=jnp.bfloat16,
    )
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    pixels = jax.random.uniform(jax.random.PRNGKey(1), (4, 28, 28, 3),
                                jnp.float32, -1.5, 1.5)
    scales = calibrate_act_scales(params, cfg, pixels)
    return cfg, params, pixels, scales


def test_fused_matches_unfused_int8(small_tower):
    cfg, params, pixels, scales = small_tower
    ref = vit_forward_int8(quantize_vit_params(params), cfg, pixels,
                           act_scales=scales)
    packed = pack_vit_int8_fused(params)
    out = vit_forward_int8_fused(packed, cfg, pixels, scales)
    assert out.shape == ref.shape
    # Same quantized math modulo f32-vs-bf16 rounding points.
    assert _cosine(out, ref) > 0.9995
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.15, rtol=0.1,
    )


def test_fused_close_to_bf16(small_tower):
    cfg, params, pixels, scales = small_tower
    ref = vit_forward(params, cfg, pixels)
    packed = pack_vit_int8_fused(params)
    out = vit_forward_int8_fused(packed, cfg, pixels, scales)
    assert _cosine(out, ref) > 0.999


def test_fused_jits_and_scans(small_tower):
    cfg, params, pixels, scales = small_tower
    packed = pack_vit_int8_fused(params)
    f = jax.jit(lambda p, s, px: vit_forward_int8_fused(p, cfg, px, s))
    out = f(packed, scales, pixels)
    eager = vit_forward_int8_fused(packed, cfg, pixels, scales)
    # jit reassociates f32 math, which can flip individual int8 rounding
    # boundaries — demand near-identity, not bit-equality.
    assert _cosine(out, eager) > 0.999
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(eager, np.float32), atol=0.3)


def test_fused_int8_attention(small_tower):
    cfg, params, pixels, _ = small_tower
    scales8 = calibrate_vit_int8_fused(params, cfg, pixels)
    assert scales8.shape == (cfg.num_layers, 8)
    ref = vit_forward(params, cfg, pixels)
    out = vit_forward_int8_fused(pack_vit_int8_fused(params), cfg, pixels,
                                 scales8)
    # (L, 7) calibrations (pre-static-smax checkpoints) still run: the
    # kernel falls back to the in-kernel row-max reduction.
    out7 = vit_forward_int8_fused(pack_vit_int8_fused(params), cfg, pixels,
                                  scales8[:, :7])
    assert _cosine(out7, ref) > 0.999
    # int8 QK^T/PV adds three more quantization points; the fidelity
    # contract for the serving path stays cosine >= 0.999 vs bf16.
    assert _cosine(out, ref) > 0.999


def test_encoder_attention_int8_parity():
    from multimeditron_tpu.ops.encoder_attention import (
        encoder_attention,
        encoder_attention_int8,
    )
    rng = np.random.default_rng(0)
    B, S, D, H = 2, 24, 64, 4
    qf = rng.normal(size=(B, S, D)) * 0.4
    kf = rng.normal(size=(B, S, D)) * 0.4
    vf = rng.normal(size=(B, S, D)) * 0.4
    sq, sk, sv = (np.abs(a).max() / 127.0 for a in (qf, kf, vf))
    q8 = jnp.asarray(np.round(qf / sq), jnp.int8)
    k8 = jnp.asarray(np.round(kf / sk), jnp.int8)
    v8 = jnp.asarray(np.round(vf / sv), jnp.int8)
    out = encoder_attention_int8(
        q8, k8, v8, H,
        qk_scale=sq * sk * (D // H) ** -0.5, pv_scale=sv / 127.0,
        kv_len=20)
    ref = encoder_attention(
        jnp.asarray(qf, jnp.float32), jnp.asarray(kf, jnp.float32),
        jnp.asarray(vf, jnp.float32), H, kv_len=20)
    assert _cosine(np.asarray(out, np.float32)[:, :20],
                   np.asarray(ref, np.float32)[:, :20]) > 0.999


def test_fused_no_cls_variant():
    cfg = ViTConfig(
        image_size=28, patch_size=14, hidden_size=128, num_layers=2,
        num_heads=4, intermediate_size=256, dtype=jnp.bfloat16,
        use_cls_token=False, use_pre_layernorm=False,
        post_layernorm_output=True, patch_bias=True,
        hidden_act="gelu_pytorch_tanh",
    )
    params = init_vit_params(jax.random.PRNGKey(2), cfg)
    pixels = jax.random.uniform(jax.random.PRNGKey(3), (2, 28, 28, 3),
                                jnp.float32, -1.5, 1.5)
    scales = calibrate_act_scales(params, cfg, pixels)
    ref = vit_forward_int8(quantize_vit_params(params), cfg, pixels,
                           act_scales=scales)
    out = vit_forward_int8_fused(pack_vit_int8_fused(params), cfg, pixels,
                                 scales)
    assert out.shape == ref.shape
    assert _cosine(out, ref) > 0.9995


def test_mlp_fused_matches_split_pair(small_tower):
    """mlp_fused (one kernel, hidden in VMEM) == fc1_gelu_quant +
    fc2_res_ln_quant bit-for-bit (same math; fc2's int32 accumulation
    over F chunks is exact)."""
    import jax.numpy as jnp
    from multimeditron_tpu.ops.vit_int8_fused import (
        fc1_gelu_quant,
        fc2_res_ln_quant,
        mlp_fused,
    )

    cfg, params, pixels, scales = small_tower
    rng = np.random.default_rng(3)
    M, D, F = 16, cfg.hidden_size, cfg.intermediate_size
    lp = params["layers"]
    w1 = jnp.asarray(rng.integers(-127, 128, (D, F), np.int8))
    w1_s = jnp.asarray(rng.uniform(0.001, 0.01, (F,)), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(F,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.integers(-127, 128, (F, D), np.int8))
    w2_s = jnp.asarray(rng.uniform(0.001, 0.01, (D,)), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(D,)) * 0.01, jnp.float32)
    lnw = jnp.asarray(rng.normal(size=(D,)) * 0.1 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.normal(size=(D,)) * 0.01, jnp.float32)
    xq = jnp.asarray(rng.integers(-127, 128, (M, D), np.int8))
    xres = jnp.asarray(rng.normal(size=(M, D)) * 0.1, jnp.bfloat16)
    s2, s3, s0n = 0.04, 0.05, 0.06

    hq = fc1_gelu_quant(xq, w1, w1_s, b1, s2, s3, "quick_gelu",
                        block_rows=8)
    xn_ref, xqn_ref = fc2_res_ln_quant(hq, xres, w2, w2_s, b2, lnw, lnb,
                                       s3, s0n, 1e-5, block_rows=8)
    xn, xqn = mlp_fused(xq, xres, w1, w1_s, b1, w2, w2_s, b2, lnw, lnb,
                        s2, s3, s0n, 1e-5, "quick_gelu", block_rows=8,
                        block_cols=F // 2)
    np.testing.assert_array_equal(np.asarray(xqn), np.asarray(xqn_ref))
    np.testing.assert_allclose(np.asarray(xn, np.float32),
                               np.asarray(xn_ref, np.float32), atol=1e-2)


def test_fused_packed_key_split_257_tokens():
    """The packed-key split path (main 256-lane block + head-packed tail)
    triggers at ViT-L-like sequence lengths (257 tokens -> Sp=264) with
    static-smax calibrations; parity vs bf16 and vs the (L,7) non-packed
    row-max path must hold."""
    cfg = ViTConfig(
        image_size=224,
        patch_size=14,   # 16x16 = 256 patches + CLS = 257 tokens
        hidden_size=128,
        num_layers=2,
        num_heads=2,
        intermediate_size=256,
        dtype=jnp.bfloat16,
    )
    params = init_vit_params(jax.random.PRNGKey(3), cfg)
    pixels = jax.random.uniform(jax.random.PRNGKey(4), (2, 224, 224, 3),
                                jnp.float32, -1.5, 1.5)
    scales8 = calibrate_vit_int8_fused(params, cfg, pixels)
    packed = pack_vit_int8_fused(params)
    ref = vit_forward(params, cfg, pixels)
    out = vit_forward_int8_fused(packed, cfg, pixels, scales8)
    out7 = vit_forward_int8_fused(packed, cfg, pixels, scales8[:, :7])  # row-max path
    assert _cosine(out, ref) > 0.999
    assert _cosine(out, out7) > 0.9995

    # the packed-key-split kernel variant itself (disabled in the full
    # pipeline for speed, kept parity-correct): direct comparison
    from multimeditron_tpu.ops.vit_int8_fused import qkv_attn_int8

    D, H = cfg.hidden_size, cfg.num_heads
    rng = np.random.default_rng(0)
    Sp = 264
    xq = jnp.asarray(rng.integers(-80, 80, (2, Sp, D)), jnp.int8)
    wq = jnp.asarray(rng.integers(-80, 80, (3, D, D)), jnp.int8)
    ws = jnp.full((3, 1, D), 1e-4, jnp.float32)
    bias = jnp.zeros((3, 1, D), jnp.float32)
    s6 = jnp.asarray([[0.05], [10.0], [10.0], [12.0],
                      [0.01 * 0.01 * 0.125 * 1.4427], [0.02]], jnp.float32)
    a = qkv_attn_int8(xq, wq, ws, bias, s6, H, 257, static_smax=True,
                      allow_packed=True, block_imgs=2)
    b = qkv_attn_int8(xq, wq, ws, bias, s6, H, 257, static_smax=True,
                      allow_packed=False, block_imgs=2)
    # approx-reciprocal epilogue in the unpacked path adds ~1e-5 noise
    assert _cosine(a, b) > 0.9999


def test_fused_round5_variant_flags(small_tower):
    """Round-5 measured-variant flags stay parity-correct: bf16_scores
    (int8 QK dots + bf16 pre-shifted score scratch) and ph_exp2 (per-head
    exp2 slices in the consume phase) vs the shipping fuse_l path.
    Both measured as pipeline washes (see docs/known_issues.md) and are
    kept behind flags for the probe record."""
    cfg, params, pixels, _ = small_tower
    scales8 = calibrate_vit_int8_fused(params, cfg, pixels)
    packed = pack_vit_int8_fused(params)
    base = vit_forward_int8_fused(packed, cfg, pixels, scales8)
    b16s = vit_forward_int8_fused(packed, cfg, pixels, scales8,
                                  bf16_scores=True)
    phe = vit_forward_int8_fused(packed, cfg, pixels, scales8,
                                 ph_exp2=True)
    both = vit_forward_int8_fused(packed, cfg, pixels, scales8,
                                  bf16_scores=True, ph_exp2=True)
    # bf16 score rounding costs ~3e-4 relative per weight; contract holds
    assert _cosine(b16s, base) > 0.999
    assert _cosine(both, base) > 0.999
    # ph_exp2 only reorders the exp2 slices — same math, near-identical
    assert _cosine(phe, base) > 0.9999


def test_fc1_w_outer_bitwise(small_tower):
    """fc1's weight-outer grid order (w block fetched once per column
    sweep instead of once per row block — round-5 default) is a pure
    iteration-order change: bitwise-equal int8 output."""
    from multimeditron_tpu.ops.vit_int8_fused import fc1_gelu_quant

    cfg, *_ = small_tower
    rng = np.random.default_rng(11)
    M, K, N = 32, cfg.hidden_size, cfg.intermediate_size
    xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.001, 0.01, (N,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(N,)) * 0.01, jnp.float32)
    a = fc1_gelu_quant(xq, wq, ws, b, 0.04, 0.05, "quick_gelu",
                       block_rows=8, block_cols=N // 2, w_outer=False)
    bo = fc1_gelu_quant(xq, wq, ws, b, 0.04, 0.05, "quick_gelu",
                        block_rows=8, block_cols=N // 2, w_outer=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(bo))


def test_fused_outlier_channel_fidelity():
    """Real CLIP-L weights have per-channel outliers (the known failure
    mode of static W8A8). Inject heavy-tailed channel scales into a
    random tower and demand the fidelity contract still holds — a proxy
    for the real-weights check until a local checkpoint is available
    (see test_fused_real_clip_weights)."""
    cfg = ViTConfig(
        image_size=28, patch_size=14, hidden_size=128, num_layers=3,
        num_heads=4, intermediate_size=256, dtype=jnp.bfloat16,
    )
    params = init_vit_params(jax.random.PRNGKey(7), cfg)

    def inject(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if x.ndim >= 2 and "proj" in name:
            # crc32, not hash(): Python salts str hashes per process, which
            # made the outlier pattern (and the asserted cosines) run-to-run
            # nondeterministic.
            rng = np.random.default_rng(zlib.crc32(name.encode()))
            # ~3% outlier output channels at 8-16x the typical magnitude
            scale = np.where(rng.random(x.shape[-1]) < 0.03,
                             rng.uniform(8.0, 16.0, x.shape[-1]), 1.0)
            return (x.astype(jnp.float32) * scale).astype(x.dtype)
        return x

    params = jax.tree_util.tree_map_with_path(inject, params)
    pixels = jax.random.uniform(jax.random.PRNGKey(8), (4, 28, 28, 3),
                                jnp.float32, -1.5, 1.5)
    ref = vit_forward(params, cfg, pixels)
    assert np.isfinite(np.asarray(ref, np.float32)).all()

    # Without smoothing, per-TENSOR static activation scales lose the
    # non-outlier channels (measured ~0.968 cosine on this tower) — the
    # reason smooth_vit_params exists.
    raw = vit_forward_int8_fused(
        pack_vit_int8_fused(params), cfg, pixels,
        calibrate_vit_int8_fused(params, cfg, pixels))
    raw_cos = _cosine(raw, ref)

    from multimeditron_tpu.ops.vit_int8_fused import smooth_vit_params

    sm = smooth_vit_params(params, cfg, pixels)
    # the folds are mathematically exact and stay f32 (re-rounding the
    # large fold factors through bf16 cost ~5e-3 cosine here); the
    # residual ~2e-3 is bf16-vs-f32 matmul precision of the two forwards,
    # not fold error
    # pinned near the measured 0.9985: catches few-1e-3 fold regressions
    assert _cosine(vit_forward(sm, cfg, pixels), ref) > 0.9975
    out = vit_forward_int8_fused(pack_vit_int8_fused(sm), cfg, pixels,
                                 calibrate_vit_int8_fused(sm, cfg, pixels))
    cos = _cosine(out, ref)
    # Measured on this (crc32-deterministic) outlier pattern: raw 0.977,
    # smoothed 0.9925. On typical towers the contract is >= 0.999
    # (test_fused_close_to_bf16); the synthetic 8-16x outliers cost
    # ~7e-3 even after exact migration — margin sweep (1.1 -> 0.3)
    # showed clipping only hurts, so the loss is plain round-off of the
    # widened per-tensor ranges, not the calibration rule.
    # pinned near the measured floor (0.9925 TPU / 0.9981 CPU interpret)
    # so a few-1e-3 genuine int8-path regression still fails the test
    assert cos > 0.992, f"smoothed {cos} (raw {raw_cos})"
    assert cos > raw_cos + 0.005  # smoothing must actually help here


@pytest.mark.skipif(
    not os.path.isdir(os.environ.get("MMT_CLIP_CKPT", "/ckpts/clip-vit-large-patch14")),
    reason="real CLIP-L checkpoint not available (set MMT_CLIP_CKPT)",
)
def test_fused_real_clip_weights():
    """Fidelity on REAL CLIP-ViT-L/14 weights (VERDICT r3 #6): import the
    HF checkpoint, calibrate, assert cosine >= 0.999 vs the bf16 tower."""
    from multimeditron_tpu.models.hf_import import load_clip_vision

    path = os.environ.get("MMT_CLIP_CKPT", "/ckpts/clip-vit-large-patch14")
    cfg, params = load_clip_vision(path, dtype=jnp.bfloat16)
    pixels = jax.random.uniform(jax.random.PRNGKey(9),
                                (8, cfg.image_size, cfg.image_size, 3),
                                jnp.float32, -1.8, 2.2)
    ref = vit_forward(params, cfg, pixels)
    scales8 = calibrate_vit_int8_fused(params, cfg, pixels)
    out = vit_forward_int8_fused(pack_vit_int8_fused(params), cfg, pixels,
                                 scales8)
    assert _cosine(out, ref) > 0.999
