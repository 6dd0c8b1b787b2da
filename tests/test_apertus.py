"""Apertus architecture support: gateless xIELU MLP + QK-norm decoder.

The reference glues any HF causal LM to its modalities — including EPFL's
Apertus (chat template at ``model/model.py:37,66-76``). These tests verify
the native decoder reproduces HF ``ApertusForCausalLM`` logits from an
imported state dict, that the xIELU activation matches HF's python
implementation, and that export -> import round-trips.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimeditron_tpu.models.common import xielu
from multimeditron_tpu.models.hf_import import llama_params_from_state_dict
from multimeditron_tpu.models.llama import (
    LlamaConfig,
    init_llama_params,
    llama_forward,
)


def _tiny_hf_apertus():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "ApertusForCausalLM"):
        pytest.skip("transformers too old for Apertus")
    hf_cfg = transformers.ApertusConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return hf_cfg, transformers.ApertusForCausalLM(hf_cfg).eval()


def test_config_from_hf_dict():
    hf_cfg, _ = _tiny_hf_apertus()
    cfg = LlamaConfig.from_hf_dict(hf_cfg.to_dict())
    assert cfg.hf_arch == "apertus"
    assert not cfg.mlp_gate
    assert cfg.hidden_act == "xielu"
    assert cfg.use_qk_norm


def test_xielu_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers.activations import XIELUActivation

    act = XIELUActivation(dtype=torch.float32)
    x = np.linspace(-6.0, 6.0, 257, dtype=np.float32)
    ref = act._xielu_python(torch.tensor(x)).detach().numpy()
    ap = act.alpha_p.detach().numpy()
    an = act.alpha_n.detach().numpy()
    ours = xielu(jnp.asarray(x), jnp.asarray(ap), jnp.asarray(an))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6, rtol=1e-6)


def test_hf_import_logit_parity():
    torch = pytest.importorskip("torch")
    hf_cfg, hf_model = _tiny_hf_apertus()

    cfg = LlamaConfig.from_hf_dict(hf_cfg.to_dict())
    cfg = LlamaConfig(**{**cfg.__dict__, "dtype": jnp.float32})
    params = llama_params_from_state_dict(hf_model.state_dict(), cfg)
    assert "gate_proj" not in params["layers"]
    assert params["layers"]["xielu_alpha_p"].shape == (cfg.num_layers, 1)

    ids = np.array([[1, 5, 9, 20, 33, 2, 7, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    ours, _ = llama_forward(params, cfg, input_ids=jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_export_import_roundtrip():
    from multimeditron_tpu.models.hf_export import llama_state_dict

    cfg = LlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        use_qk_norm=True,
        mlp_gate=False,
        hidden_act="xielu",
        hf_arch="apertus",
        dtype=jnp.float32,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    sd = {k: np.asarray(v) for k, v in llama_state_dict(params, cfg, prefix="").items()}
    assert "model.layers.0.attention_layernorm.weight" in sd
    assert "model.layers.1.mlp.act_fn.alpha_n" in sd
    assert not any("gate_proj" in k for k in sd)

    back = llama_params_from_state_dict(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), atol=1e-6,
            err_msg=str(path),
        )


def test_kv_cache_decode_matches_full_forward():
    from multimeditron_tpu.models.llama import init_kv_cache

    cfg = LlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        use_qk_norm=True,
        mlp_gate=False,
        hidden_act="xielu",
        hf_arch="apertus",
        dtype=jnp.float32,
    )
    params = init_llama_params(jax.random.PRNGKey(1), cfg)
    ids = jnp.asarray([[3, 7, 11, 2, 9, 5]], jnp.int32)

    full, _ = llama_forward(params, cfg, input_ids=ids)

    cache = init_kv_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = llama_forward(
        params, cfg, input_ids=ids[:, :4], kv_cache=cache, prefill=True
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, :4]), atol=1e-4, rtol=1e-4
    )
    for t in range(4, 6):
        logits, cache = llama_forward(
            params, cfg, input_ids=ids[:, t : t + 1], kv_cache=cache
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(full[:, t]), atol=1e-4,
            rtol=1e-4,
        )
