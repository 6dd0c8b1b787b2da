"""Tensor-parallel serving (EngineConfig.tp > 1).

The reference serves through sglang, which scales one model over
several accelerators with ``--tp N`` (SURVEY §2.3). Here tp serving is
GSPMD: a ("tp",)-axis mesh, params sharded per parallel/sharding.py,
the KV pool sharded on its kv-head axis, scheduling state replicated.
These tests run on the virtual 8-device CPU mesh (tests/conftest.py)
and assert (a) greedy outputs are identical to the single-device
engine, (b) the weights/KV actually live sharded across devices.
"""

import dataclasses

import jax
import numpy as np
import pytest

from multimeditron_tpu.data.chat_template import ChatTemplate
from multimeditron_tpu.data.collator import DataCollatorForMultimodal
from multimeditron_tpu.data.loaders import AutoModalityLoader
from multimeditron_tpu.models.multimodal import MultimodalModel
from multimeditron_tpu.serve.engine import EngineConfig, ServingEngine
from tests.test_multimodal import ATTACH, _img, tiny_mm_config
from tests.fixtures.toy_tokenizer import ToyTokenizer


@pytest.fixture(scope="module")
def setup():
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
    return model, params, collator


PROMPTS = [
    {"conversations": [{"role": "user", "content": "tell me a story"}],
     "modalities": []},
    {
        "conversations": [{"role": "user",
                           "content": f"what is {ATTACH} showing"}],
        "modalities": [{"type": "image", "value": _img((10, 200, 30))}],
    },
    {"conversations": [{"role": "user", "content": "how are you today"}],
     "modalities": []},
]

BASE = EngineConfig(max_slots=2, max_seq_len=128, max_new_tokens=6,
                    prefill_buckets=(32, 64), do_sample=False)


def _run(model, params, collator, cfg, n=6):
    engine = ServingEngine(model, params, cfg)
    outs = engine.generate([collator([p]) for p in PROMPTS],
                           max_new_tokens=n)
    return engine, [np.asarray(o) for o in outs]


@pytest.mark.parametrize("kv_mode", ["paged", "slab"])
def test_tp2_matches_single_device(setup, kv_mode):
    model, params, collator = setup
    _, ref = _run(model, params, collator,
                  dataclasses.replace(BASE, kv_mode=kv_mode))
    engine, got = _run(model, params, collator,
                       dataclasses.replace(BASE, kv_mode=kv_mode, tp=2))
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)
    # the weights really are distributed: q_proj spans 2 devices with
    # its head dim split, and the KV pool stayed sharded after decode
    q = engine.params["llm"]["layers"]["q_proj"]
    assert len(q.sharding.device_set) == 2
    assert q.sharding.shard_shape(q.shape)[-1] == q.shape[-1] // 2
    k = engine.state["k"]
    head_axis = 1 if kv_mode == "paged" else 2
    assert len(k.sharding.device_set) == 2
    assert (k.sharding.shard_shape(k.shape)[head_axis]
            == k.shape[head_axis] // 2)


def test_tp2_quantized_matches_tp1_quantized(setup):
    model, params, collator = setup
    _, ref = _run(model, params, collator,
                  dataclasses.replace(BASE, quantize_llm=True))
    engine, got = _run(model, params, collator,
                       dataclasses.replace(BASE, quantize_llm=True, tp=2))
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)
    lq = engine.params["llm"]["layers"]["q_proj_q"]
    assert lq.sharding.shard_shape(lq.shape)[-1] == lq.shape[-1] // 2


def test_tp2_chunked_prefill_long_prompt(setup):
    """Prompts beyond the largest bucket chunk-prefill under tp too."""
    model, params, collator = setup
    long_prompt = {
        "conversations": [{"role": "user",
                           "content": "tell me " + "more and " * 40}],
        "modalities": [],
    }
    batch = collator([long_prompt])
    assert batch["input_ids"].shape[1] > 64  # beyond the largest bucket
    ref_engine = ServingEngine(model, params, BASE)
    ref = np.asarray(ref_engine.generate([batch], max_new_tokens=6)[0])
    engine = ServingEngine(model, params, dataclasses.replace(BASE, tp=2))
    got = np.asarray(engine.generate([batch], max_new_tokens=6)[0])
    np.testing.assert_array_equal(ref, got)


def test_tp_validation(setup):
    model, params, _ = setup
    with pytest.raises(ValueError, match="num_heads"):
        ServingEngine(model, params, dataclasses.replace(BASE, tp=3))
