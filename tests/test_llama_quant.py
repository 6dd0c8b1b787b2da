"""Weight-only int8 LLM path (serving): kernel + quantized decode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimeditron_tpu.models.llama import (
    LlamaConfig,
    init_kv_cache,
    init_llama_params,
    llama_forward,
)
from multimeditron_tpu.models.llama_quant import (
    is_quantized,
    quantize_llama_params,
)
from multimeditron_tpu.ops.wo_matmul import wo_matmul, wo_matmul_pallas


def test_wo_matmul_xla_matches_dequant():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 256), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (256, 384), jnp.float32)
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    wq = jnp.clip(jnp.round(w / s[None]), -127, 127).astype(jnp.int8)
    want = x @ (wq.astype(jnp.float32) * s[None])
    got = wo_matmul(x, wq, s, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_wo_matmul_pallas_interpret_matches_xla():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (16, 256), jnp.float32)
    wq = jax.random.randint(
        jax.random.fold_in(key, 2), (256, 512), -127, 128
    ).astype(jnp.int8)
    s = jax.random.uniform(jax.random.fold_in(key, 3), (512,), jnp.float32,
                           0.01, 0.1)
    want = wo_matmul(x, wq, s, impl="xla")
    got = wo_matmul_pallas(x, wq, s, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def tiny():
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, dtype=jnp.float32,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_quantized_forward_close(tiny):
    cfg, params = tiny
    qparams = quantize_llama_params(params, cfg)
    assert is_quantized(qparams)
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 16), 0, 512)
    logits, _ = llama_forward(params, cfg, input_ids=ids)
    qlogits, _ = llama_forward(qparams, cfg, input_ids=ids)
    a = np.asarray(logits, np.float64).reshape(-1, 512)
    b = np.asarray(qlogits, np.float64).reshape(-1, 512)
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                               * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.995, cos.min()


def test_quantized_decode_with_cache(tiny):
    cfg, params = tiny
    qparams = quantize_llama_params(params, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(6), (2, 8), 0, 512)
    cache = init_kv_cache(cfg, 2, 32)
    logits, cache = llama_forward(
        qparams, cfg, input_ids=ids, kv_cache=cache, prefill=True)
    step = jnp.argmax(logits[:, -1:], -1)
    logits2, cache = llama_forward(qparams, cfg, input_ids=step,
                                   kv_cache=cache)
    assert logits2.shape == (2, 1, 512)
    assert int(cache["length"][0]) == 9
    assert np.isfinite(np.asarray(logits2)).all()


def test_tied_embeddings_head_quantized():
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=1, num_heads=2, num_kv_heads=2, dtype=jnp.float32,
        tie_word_embeddings=True,
    )
    params = init_llama_params(jax.random.PRNGKey(2), cfg)
    q = quantize_llama_params(params, cfg)
    assert "lm_head_q" in q and q["lm_head_q"].shape == (64, 256)
    ids = jnp.zeros((1, 4), jnp.int32)
    logits, _ = llama_forward(q, cfg, input_ids=ids)
    ref, _ = llama_forward(params, cfg, input_ids=ids)
    a, b = np.asarray(ref).ravel(), np.asarray(logits).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.995


def test_engine_quantize_llm_end_to_end():
    """The serving engine with quantize_llm=True generates finite tokens
    through prefill + paged decode."""
    from multimeditron_tpu.data.chat_template import ChatTemplate
    from multimeditron_tpu.data.collator import DataCollatorForMultimodal
    from multimeditron_tpu.data.loaders import AutoModalityLoader
    from multimeditron_tpu.models.multimodal import MultimodalModel
    from multimeditron_tpu.serve.engine import EngineConfig, ServingEngine
    from tests.fixtures.toy_tokenizer import ToyTokenizer
    from tests.test_multimodal import ATTACH, tiny_mm_config

    model = MultimodalModel(tiny_mm_config())
    model.config.eos_token_idx = 2
    params = model.init_params(jax.random.PRNGKey(0))
    tok = ToyTokenizer()
    collator = DataCollatorForMultimodal(
        tokenizer=tok,
        modality_processors=model.processors(),
        modality_loaders={"image": AutoModalityLoader.create("raw-image")},
        attachment_token=ATTACH,
        chat_template=ChatTemplate.llama(),
        add_generation_prompt=True,
        pad_to_multiple=8,
    )
    engine = ServingEngine(
        model, params,
        EngineConfig(max_slots=2, max_seq_len=128, max_new_tokens=5,
                     prefill_buckets=(32, 64), do_sample=False,
                     quantize_llm=True),
    )
    sample = {"conversations": [{"role": "user", "content": "hi there"}],
              "modalities": []}
    req = engine.submit(collator([sample]))
    engine.run()
    assert req.done and 1 <= len(req.tokens) <= 5
    assert all(0 <= t < 4096 for t in req.tokens)
