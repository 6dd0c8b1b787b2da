import jax
import jax.numpy as jnp
import numpy as np

from multimeditron_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
from multimeditron_tpu.models.vit_quant import quantize_vit_params, vit_forward_int8

CFG = ViTConfig(
    image_size=32, patch_size=8, hidden_size=64, num_layers=2,
    num_heads=4, intermediate_size=128,
)


def test_int8_matches_bf16_closely():
    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_vit_params(params)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))

    ref = np.asarray(vit_forward(params, CFG, pixels)).astype(np.float32)
    got = np.asarray(vit_forward_int8(qparams, CFG, pixels)).astype(np.float32)
    assert ref.shape == got.shape

    a = ref.reshape(-1, CFG.hidden_size)
    b = got.reshape(-1, CFG.hidden_size)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-8
    )
    assert cos.min() > 0.995, cos.min()
    assert cos.mean() > 0.999, cos.mean()


def test_static_calibrated_scales_close_to_bf16():
    from multimeditron_tpu.models.vit_quant import calibrate_act_scales

    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_vit_params(params)
    calib = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3))
    scales = calibrate_act_scales(params, CFG, calib)
    assert scales.shape == (CFG.num_layers, 4)

    pixels = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    ref = np.asarray(vit_forward(params, CFG, pixels)).astype(np.float32)
    got = np.asarray(
        vit_forward_int8(qparams, CFG, pixels, act_scales=scales)
    ).astype(np.float32)
    a = ref.reshape(-1, CFG.hidden_size)
    b = got.reshape(-1, CFG.hidden_size)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-8
    )
    assert cos.mean() > 0.998, cos.mean()


def test_quantized_tree_has_no_fp_weights():
    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_vit_params(params)
    for key in ("q_proj", "k_proj", "v_proj", "o_proj", "fc1", "fc2"):
        assert key not in qparams["layers"]
        assert qparams["layers"][key + "_q"].dtype == jnp.int8
        assert qparams["layers"][key + "_s"].dtype == jnp.float32
