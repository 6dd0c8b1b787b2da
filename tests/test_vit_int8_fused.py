"""Parity tests for the fused-Pallas W8A8 ViT path.

The fused path must reproduce the static-scales int8 reference
(``vit_forward_int8``) and stay close to the bf16 tower — the same
contract the round-1 int8 path was verified against.
"""

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
