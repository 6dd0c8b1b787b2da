import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimeditron_tpu.models.hf_import import vit_params_from_state_dict
from multimeditron_tpu.models.projector import init_mlp_projector, mlp_projector_forward
from multimeditron_tpu.models.vit import ViTConfig, init_vit_params, patchify, vit_forward

TINY = ViTConfig(
    image_size=32,
    patch_size=8,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
)


def test_patchify_layout():
    P = 2
    img = jnp.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3).astype(jnp.float32)
    patches = patchify(img, P)
    assert patches.shape == (2, 4, P * P * 3)
    # first patch of first image = rows 0-1, cols 0-1, (i,j,c) order
    expected = np.asarray(img[0, :2, :2, :]).reshape(-1)
    np.testing.assert_array_equal(np.asarray(patches[0, 0]), expected)


def test_forward_shapes():
    params = init_vit_params(jax.random.PRNGKey(0), TINY)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out = vit_forward(params, TINY, imgs)
    assert out.shape == (2, TINY.num_patches, TINY.hidden_size)  # CLS dropped
    out2 = vit_forward(params, TINY, imgs, drop_cls=False)
    assert out2.shape == (2, TINY.num_patches + 1, TINY.hidden_size)


def test_hf_clip_parity():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
    )
    torch.manual_seed(0)
    hf_model = CLIPVisionModel(hf_cfg).eval()

    cfg = ViTConfig.clip_from_hf_dict(hf_cfg.to_dict())
    params = vit_params_from_state_dict(hf_model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    pixels_nchw = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(torch.tensor(pixels_nchw)).last_hidden_state.numpy()

    pixels_nhwc = jnp.asarray(pixels_nchw.transpose(0, 2, 3, 1))
    ours = vit_forward(params, cfg, pixels_nhwc, drop_cls=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)
    # reference embedder drops CLS: ours[:, 1:] == ref[:, 1:]
    ours_patches = vit_forward(params, cfg, pixels_nhwc, drop_cls=True)
    np.testing.assert_allclose(np.asarray(ours_patches), ref[:, 1:], atol=2e-4, rtol=2e-4)


def test_hf_siglip_parity():
    torch = pytest.importorskip("torch")
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
    )
    torch.manual_seed(0)
    hf_model = SiglipVisionModel(hf_cfg).eval()

    cfg = ViTConfig.siglip_from_hf_dict(hf_cfg.to_dict())
    params = vit_params_from_state_dict(hf_model.state_dict(), cfg)

    rng = np.random.default_rng(1)
    pixels_nchw = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(torch.tensor(pixels_nchw)).last_hidden_state.numpy()

    pixels_nhwc = jnp.asarray(pixels_nchw.transpose(0, 2, 3, 1))
    ours = vit_forward(params, cfg, pixels_nhwc)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_mlp_projector_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    m, h = 16, 24
    torch.manual_seed(0)
    ref = nn.Sequential(
        nn.Linear(m, m), nn.GELU(), nn.Linear(m, h), nn.GELU(), nn.Linear(h, h)
    ).eval()

    params = init_mlp_projector(jax.random.PRNGKey(0), m, h, dtype=jnp.float32)
    # copy torch weights in
    params["fc1"] = jnp.asarray(ref[0].weight.detach().numpy().T)
    params["b1"] = jnp.asarray(ref[0].bias.detach().numpy())
    params["fc2"] = jnp.asarray(ref[2].weight.detach().numpy().T)
    params["b2"] = jnp.asarray(ref[2].bias.detach().numpy())
    params["fc3"] = jnp.asarray(ref[4].weight.detach().numpy().T)
    params["b3"] = jnp.asarray(ref[4].bias.detach().numpy())

    x = np.random.default_rng(2).normal(size=(3, 5, m)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.tensor(x)).numpy()
    got = mlp_projector_forward(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5, rtol=1e-5)
