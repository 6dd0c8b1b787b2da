import jax
import numpy as np
import pytest

from multimeditron_tpu.data.chat_template import ChatTemplate
from multimeditron_tpu.data.collator import DataCollatorForMultimodal
from multimeditron_tpu.data.loaders import AutoModalityLoader
from multimeditron_tpu.models.generation import generate
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
    {"conversations": [{"role": "user", "content": "tell me a story"}], "modalities": []},
    {
        "conversations": [{"role": "user", "content": f"what is {ATTACH} showing"}],
        "modalities": [{"type": "image", "value": _img((10, 200, 30))}],
    },
    {"conversations": [{"role": "user", "content": "how are you today my friend"}],
     "modalities": []},
]


def test_continuous_batching_matches_generate(setup):
    model, params, collator = setup
    n = 6
    engine = ServingEngine(
        model, params,
        EngineConfig(max_slots=2, max_seq_len=128, max_new_tokens=n,
                     prefill_buckets=(32, 64), do_sample=False),
    )
    batches = [collator([p]) for p in PROMPTS]
    outs = engine.generate(batches, max_new_tokens=n)

    for i, p in enumerate(PROMPTS):
        ref = np.asarray(
            generate(model, params, collator([p]), max_new_tokens=n, do_sample=False)
        )[0]
        got = np.asarray(outs[i])
        # compare until EOS
        for t in range(min(len(got), n)):
            assert got[t] == ref[t], (i, t, got, ref)
            if ref[t] == model.config.eos_token_idx:
                break


def test_slots_reused_more_requests_than_slots(setup):
    model, params, collator = setup
    engine = ServingEngine(
        model, params,
        EngineConfig(max_slots=2, max_seq_len=128, max_new_tokens=4,
                     prefill_buckets=(32, 64), do_sample=False),
    )
    batches = [collator([PROMPTS[i % 3]]) for i in range(5)]
    outs = engine.generate(batches)
    assert len(outs) == 5
    assert all(1 <= len(o) <= 4 for o in outs)
    # identical prompts produced identical (greedy) outputs regardless of slot
    np.testing.assert_array_equal(outs[0], outs[3])


def test_ttft_recorded(setup):
    model, params, collator = setup
    engine = ServingEngine(
        model, params,
        EngineConfig(max_slots=1, max_seq_len=128, max_new_tokens=2,
                     prefill_buckets=(32, 64), do_sample=False),
    )
    req = engine.submit(collator([PROMPTS[0]]))
    engine.run()
    assert req.done and req.ttft is not None and req.ttft >= 0
    assert req.finish_time >= req.first_token_time


def test_staggered_submission(setup):
    """Requests submitted while others are mid-decode join the batch."""
    model, params, collator = setup
    engine = ServingEngine(
        model, params,
        EngineConfig(max_slots=4, max_seq_len=128, max_new_tokens=6,
                     prefill_buckets=(32, 64), do_sample=False),
    )
    r1 = engine.submit(collator([PROMPTS[0]]), max_new_tokens=6)
    engine.step()
    engine.step()
    r2 = engine.submit(collator([PROMPTS[2]]), max_new_tokens=6)
    engine.run()
    assert r1.done and r2.done
    ref = np.asarray(
        generate(model, params, collator([PROMPTS[2]]), max_new_tokens=6,
                 do_sample=False)
    )[0]
    got = np.asarray(r2.tokens)
    for t in range(len(got)):
        assert got[t] == ref[t]
        if ref[t] == model.config.eos_token_idx:
            break


def test_top_p_sampling(setup):
    """Per-request nucleus sampling: with a tiny top_p the filter keeps
    only the argmax token, so sampling at high temperature must equal the
    greedy decode; a fresh engine without the filter compiled must reject
    per-request top_p overrides."""
    model, params, collator = setup
    engine = ServingEngine(
        model, params,
        EngineConfig(max_slots=2, max_seq_len=128, max_new_tokens=5,
                     prefill_buckets=(32, 64), do_sample=True,
                     temperature=5.0, top_p=0.95),
    )
    req = engine.submit(collator([PROMPTS[0]]), top_p=1e-6)
    engine.run()
    ref = np.asarray(
        generate(model, params, collator([PROMPTS[0]]), max_new_tokens=5,
                 do_sample=False)
    )[0]
    got = np.asarray(req.tokens)
    for t in range(len(got)):
        assert got[t] == ref[t], (t, got, ref)
        if ref[t] == model.config.eos_token_idx:
            break

    plain = ServingEngine(
        model, params,
        EngineConfig(max_slots=2, max_seq_len=128, max_new_tokens=5,
                     prefill_buckets=(32, 64)),
    )
    with pytest.raises(ValueError, match="top_p"):
        plain.submit(collator([PROMPTS[0]]), top_p=0.9)
