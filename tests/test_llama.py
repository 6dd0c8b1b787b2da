import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimeditron_tpu.models.hf_import import llama_params_from_state_dict
from multimeditron_tpu.models.llama import (
    LlamaConfig,
    init_kv_cache,
    init_llama_params,
    llama_forward,
)

TINY = LlamaConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    rope_theta=10000.0,
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_llama_params(jax.random.PRNGKey(0), TINY)


def test_forward_shapes(tiny_params):
    ids = jnp.arange(10).reshape(1, 10) % TINY.vocab_size
    logits, cache = llama_forward(tiny_params, TINY, input_ids=ids)
    assert logits.shape == (1, 10, TINY.vocab_size)
    assert cache is None


def test_padding_invariance(tiny_params):
    """Right padding must not change logits at valid positions."""
    ids = jnp.arange(8).reshape(1, 8) % TINY.vocab_size
    logits_a, _ = llama_forward(tiny_params, TINY, input_ids=ids)
    padded = jnp.pad(ids, ((0, 0), (0, 8)))
    mask = jnp.concatenate([jnp.ones((1, 8)), jnp.zeros((1, 8))], -1).astype(jnp.int32)
    logits_b, _ = llama_forward(tiny_params, TINY, input_ids=padded, attention_mask=mask)
    np.testing.assert_allclose(logits_a, logits_b[:, :8], atol=1e-5, rtol=1e-5)


def test_kv_cache_decode_matches_full_forward(tiny_params):
    """Prefill + step-by-step decode must reproduce the full forward logits."""
    S = 12
    ids = (jnp.arange(S) * 7 % TINY.vocab_size).reshape(1, S)
    full_logits, _ = llama_forward(tiny_params, TINY, input_ids=ids)

    cache = init_kv_cache(TINY, batch=1, max_len=32, dtype=jnp.float32)
    # Prefill the first 6 tokens.
    prefill_logits, cache = llama_forward(
        tiny_params, TINY, input_ids=ids[:, :6], kv_cache=cache, prefill=True
    )
    np.testing.assert_allclose(
        prefill_logits, full_logits[:, :6], atol=1e-4, rtol=1e-4
    )
    # Decode the rest one token at a time.
    for t in range(6, S):
        step_logits, cache = llama_forward(
            tiny_params, TINY, input_ids=ids[:, t : t + 1], kv_cache=cache
        )
        np.testing.assert_allclose(
            step_logits[:, 0], full_logits[:, t], atol=1e-4, rtol=1e-4,
            err_msg=f"step {t}",
        )


def test_inputs_embeds_entry(tiny_params):
    ids = jnp.arange(6).reshape(1, 6)
    from multimeditron_tpu.models.llama import embed_tokens

    emb = embed_tokens(tiny_params, ids)
    a, _ = llama_forward(tiny_params, TINY, input_ids=ids)
    b, _ = llama_forward(tiny_params, TINY, inputs_embeds=emb)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_2d_position_ids(tiny_params):
    ids = jnp.arange(6).reshape(1, 6)
    pos_1d = jnp.arange(6).reshape(1, 6)
    pos_2d = jnp.stack([pos_1d, pos_1d], axis=-1)
    a, _ = llama_forward(tiny_params, TINY, input_ids=ids, position_ids=pos_1d)
    b, _ = llama_forward(tiny_params, TINY, input_ids=ids, position_ids=pos_2d)
    assert a.shape == b.shape
    assert bool(jnp.isfinite(b).all())


def test_remat_matches(tiny_params):
    ids = jnp.arange(8).reshape(1, 8)
    a, _ = llama_forward(tiny_params, TINY, input_ids=ids, remat=False)
    b, _ = llama_forward(tiny_params, TINY, input_ids=ids, remat=True)
    np.testing.assert_allclose(a, b, atol=1e-6)


# ----------------------------------------------------------------------
# HF numerical parity (tiny torch Llama built locally, no network)
# ----------------------------------------------------------------------
@pytest.mark.parametrize("tie", [False, True])
def test_hf_import_logit_parity(tie):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rope_theta=10000.0,
        tie_word_embeddings=tie,
    )
    torch.manual_seed(0)
    hf_model = LlamaForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig.from_hf_dict(hf_cfg.to_dict())
    cfg = LlamaConfig(**{**cfg.__dict__, "dtype": jnp.float32})
    params = llama_params_from_state_dict(hf_model.state_dict(), cfg)

    ids = np.array([[1, 5, 9, 20, 33, 2, 7, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    ours, _ = llama_forward(params, cfg, input_ids=jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_hf_import_llama3_rope_scaling():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=128,
        rope_theta=500000.0,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 64,
        },
    )
    torch.manual_seed(1)
    hf_model = LlamaForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig.from_hf_dict(hf_cfg.to_dict())
    cfg = LlamaConfig(**{**cfg.__dict__, "dtype": jnp.float32})
    params = llama_params_from_state_dict(hf_model.state_dict(), cfg)

    ids = np.arange(40).reshape(1, 40) % 96
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    ours, _ = llama_forward(params, cfg, input_ids=jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_hf_import_qwen3_parity():
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    hf_cfg = Qwen3Config(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        max_position_embeddings=64,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    hf_model = Qwen3ForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig.from_hf_dict(hf_cfg.to_dict())
    assert cfg.use_qk_norm
    cfg = LlamaConfig(**{**cfg.__dict__, "dtype": jnp.float32})
    params = llama_params_from_state_dict(hf_model.state_dict(), cfg)

    ids = np.array([[3, 17, 42, 8, 90, 4]], dtype=np.int64)
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    ours, _ = llama_forward(params, cfg, input_ids=jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)
