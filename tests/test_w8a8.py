"""W8A8 prefill path: math parity + engine-level fidelity + decode
isolation (the row gate must keep decode on the W8A16 path)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimeditron_tpu.models.llama import (
    LlamaConfig,
    init_llama_params,
    llama_forward,
)
from multimeditron_tpu.models.llama_quant import quantize_llama_params
from multimeditron_tpu.ops.wo_matmul import (
    quantize_rows,
    w8a8_matmul,
    wo_matmul,
)


def test_quantize_rows_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 256)) * 3.0, jnp.float32)
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (64, 1)
    back = q.astype(jnp.float32) * s
    # per-row max-abs quantization: error bounded by half a step
    step = np.asarray(s)[:, 0]
    err = np.max(np.abs(np.asarray(back) - np.asarray(x)), axis=-1)
    assert np.all(err <= step * 0.51)


def test_w8a8_matmul_close_to_dequant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(32, 128)), jnp.float32)
    w = rng.normal(size=(128, 96)).astype(np.float32) * 0.05
    w_s = np.max(np.abs(w), axis=0) / 127.0
    w_q = jnp.asarray(np.round(w / w_s).clip(-127, 127), jnp.int8)
    w_s = jnp.asarray(w_s, jnp.float32)

    ref = wo_matmul(x, w_q, w_s)
    q, s = quantize_rows(x)
    out = w8a8_matmul(q, s, w_q, w_s, jnp.float32)
    ref_n, out_n = np.asarray(ref, np.float32), np.asarray(out, np.float32)
    cos = float(
        (ref_n * out_n).sum()
        / (np.linalg.norm(ref_n) * np.linalg.norm(out_n) + 1e-9))
    assert cos > 0.999, cos


def _tiny_cfg(**kw):
    base = dict(vocab_size=512, hidden_size=128, intermediate_size=256,
                num_layers=2, num_heads=4, num_kv_heads=2,
                dtype=jnp.float32)
    base.update(kw)
    return LlamaConfig(**base)


def test_w8a8_prefill_logits_fidelity():
    """Quantized-tree forward with the W8A8 row gate active vs the W8A16
    path: same-token top-1 agreement and high logit cosine on a 2-layer
    model (per-token dynamic activation scales)."""
    cfg = _tiny_cfg()
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_llama_params(params, cfg)
    ids = jnp.asarray(
        np.random.default_rng(2).integers(0, 512, (2, 160)), jnp.int32)

    ref, _ = llama_forward(qparams, cfg, input_ids=ids)
    cfg8 = dataclasses.replace(cfg, w8a8_min_rows=256)
    out, _ = llama_forward(qparams, cfg8, input_ids=ids)
    a = np.asarray(ref, np.float32).reshape(-1, 512)
    b = np.asarray(out, np.float32).reshape(-1, 512)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9)
    assert cos.mean() > 0.99, cos.mean()
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_w8a8_row_gate_keeps_small_m_on_w8a16():
    """Below the row gate the W8A8 path must not fire: the quantized
    forward at M < min_rows is BITWISE identical to the plain W8A16
    forward (decode uses exactly this shape class)."""
    cfg = _tiny_cfg()
    params = init_llama_params(jax.random.PRNGKey(3), cfg)
    qparams = quantize_llama_params(params, cfg)
    ids = jnp.asarray([[5, 9, 11, 2]], jnp.int32)  # 4 rows << 256

    ref, _ = llama_forward(qparams, cfg, input_ids=ids)
    cfg8 = dataclasses.replace(cfg, w8a8_min_rows=256)
    out, _ = llama_forward(qparams, cfg8, input_ids=ids)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_w8a8_engine_end_to_end():
    """Engine with w8a8_prefill generates sane tokens and matches the
    W8A16 engine's greedy tokens on a tiny model (prefill >= min rows is
    never hit at these sizes, so outputs must be IDENTICAL — the flag
    alone must not perturb anything below the gate)."""
    from multimeditron_tpu.serve.engine import EngineConfig, ServingEngine
    from tests.test_multimodal import tiny_mm_config
    from multimeditron_tpu.models.multimodal import MultimodalModel

    model = MultimodalModel(tiny_mm_config())
    model.config.eos_token_idx = 2
    params = model.init_params(jax.random.PRNGKey(0))
    ids = np.asarray([[4, 7, 9, 3, 8, 6, 5, 10]], np.int32)
    batch = {"input_ids": ids, "attention_mask": np.ones_like(ids)}

    def run(**kw):
        eng = ServingEngine(model, params, EngineConfig(
            max_slots=2, max_seq_len=64, max_new_tokens=6,
            prefill_buckets=(16,), do_sample=False, quantize_llm=True,
            **kw))
        return eng.generate([batch], max_new_tokens=6)

    assert run(w8a8_prefill=True) == run()
