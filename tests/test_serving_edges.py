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
    collator = DataCollatorForMultimodal(
        tokenizer=ToyTokenizer(),
        modality_processors=model.processors(),
        modality_loaders={"image": AutoModalityLoader.create("raw-image")},
        attachment_token=ATTACH,
        chat_template=ChatTemplate.llama(),
        add_generation_prompt=True,
        pad_to_multiple=8,
    )
    return model, params, collator


def _prompt(text):
    return {"conversations": [{"role": "user", "content": text}], "modalities": []}


def test_budget_smaller_than_chunk(setup):
    """max_new_tokens < decode_chunk: host truncates at the budget."""
    model, params, collator = setup
    engine = ServingEngine(
        model, params,
        EngineConfig(max_slots=2, max_seq_len=128, prefill_buckets=(32,),
                     do_sample=False, decode_chunk=8),
    )
    outs = engine.generate([collator([_prompt("hello there")])], max_new_tokens=3)
    assert len(outs[0]) <= 3


def test_chunk1_matches_chunk8(setup):
    """Greedy output is chunk-size invariant."""
    model, params, collator = setup
    batch = collator([_prompt("tell me a story")])
    results = []
    for chunk in (1, 8):
        engine = ServingEngine(
            model, params,
            EngineConfig(max_slots=1, max_seq_len=128, prefill_buckets=(32,),
                         do_sample=False, decode_chunk=chunk),
        )
        results.append(engine.generate([batch], max_new_tokens=6)[0])
    eos = model.config.eos_token_idx
    a, b = results
    for t in range(min(len(a), len(b))):
        assert a[t] == b[t]
        if a[t] == eos:
            break


def test_mixed_signature_admission(setup):
    """Image and text-only requests (different shape signatures) admitted
    in the same window prefill in separate groups but all complete."""
    model, params, collator = setup
    engine = ServingEngine(
        model, params,
        EngineConfig(max_slots=4, max_seq_len=128, prefill_buckets=(32, 64),
                     do_sample=False, decode_chunk=4),
    )
    batches = [
        collator([_prompt("plain text request")]),
        collator([{
            "conversations": [{"role": "user", "content": f"{ATTACH} describe"}],
            "modalities": [{"type": "image", "value": _img((1, 2, 3))}],
        }]),
        collator([_prompt("another plain one")]),
    ]
    outs = engine.generate(batches, max_new_tokens=4)
    assert all(1 <= len(o) <= 4 for o in outs)


def test_batched_prefill_matches_sequential(setup):
    """Two same-signature requests admitted together (batched prefill)
    produce the same greedy tokens as solo runs."""
    model, params, collator = setup
    prompts = [_prompt("tell me a story"), _prompt("how are you today my friend")]
    batches = [collator([p]) for p in prompts]

    solo = []
    for b in batches:
        engine = ServingEngine(
            model, params,
            EngineConfig(max_slots=1, max_seq_len=128, prefill_buckets=(32,),
                         do_sample=False, decode_chunk=4),
        )
        solo.append(engine.generate([b], max_new_tokens=5)[0])

    engine = ServingEngine(
        model, params,
        EngineConfig(max_slots=2, max_seq_len=128, prefill_buckets=(32,),
                     do_sample=False, decode_chunk=4),
    )
    together = engine.generate(batches, max_new_tokens=5)
    eos = model.config.eos_token_idx
    for a, b in zip(solo, together):
        for t in range(min(len(a), len(b))):
            assert a[t] == b[t]
            if a[t] == eos:
                break


# ----------------------------------------------------------------------
# Chunked prefill + honest finishes (round-1 VERDICT #7)
# ----------------------------------------------------------------------
def _long_batch(collator, tok, n_words=60):
    sample = {"conversations": [
        {"role": "user", "content": " ".join(f"word{i}" for i in range(n_words))}],
        "modalities": []}
    return collator([sample])


def test_chunked_prefill_matches_single_bucket(setup):
    """A prompt longer than the largest bucket must prefill in chunks and
    produce EXACTLY the tokens a big-bucket engine produces."""
    model, params, collator = setup
    tok = None
    batch = _long_batch(collator, tok, n_words=60)
    plen = int(np.asarray(batch["attention_mask"]).sum())
    assert plen > 32  # actually exercises the chunked path
    small = ServingEngine(
        model, params,
        EngineConfig(max_slots=1, max_seq_len=300, max_new_tokens=8,
                     prefill_buckets=(16, 32), do_sample=False),
    )
    big = ServingEngine(
        model, params,
        EngineConfig(max_slots=1, max_seq_len=300, max_new_tokens=8,
                     prefill_buckets=(256,), do_sample=False),
    )
    out_small = small.generate([batch], max_new_tokens=8)[0]
    out_big = big.generate([batch], max_new_tokens=8)[0]
    assert out_small == out_big


def test_chunked_prefill_multimodal(setup):
    """Image spans falling in a later chunk still get spliced."""
    model, params, collator = setup
    filler = " ".join(f"w{i}" for i in range(40))
    sample = {"conversations": [
        {"role": "user", "content": f"{filler} look {ATTACH} now"}],
        "modalities": [{"type": "image", "value": _img((200, 30, 10))}]}
    batch = collator([sample])
    plen = int(np.asarray(batch["attention_mask"]).sum())
    assert plen > 32
    small = ServingEngine(
        model, params,
        EngineConfig(max_slots=1, max_seq_len=300, max_new_tokens=6,
                     prefill_buckets=(16, 32), do_sample=False),
    )
    big = ServingEngine(
        model, params,
        EngineConfig(max_slots=1, max_seq_len=300, max_new_tokens=6,
                     prefill_buckets=(256,), do_sample=False),
    )
    assert small.generate([batch], max_new_tokens=6)[0] == \
        big.generate([batch], max_new_tokens=6)[0]


def test_no_token_loss_at_cache_edge(setup):
    """A request near max_seq_len gets every token the cache can hold
    (shorter final decode chunks), and reports finish_reason='capacity'."""
    model, params, collator = setup
    batch = collator([{"conversations": [
        {"role": "user", "content": "hello there"}], "modalities": []}])
    plen = int(np.asarray(batch["attention_mask"]).sum())
    cap = 11  # odd headroom, not a multiple of decode_chunk
    engine = ServingEngine(
        model, params,
        EngineConfig(max_slots=1, max_seq_len=plen + cap, max_new_tokens=64,
                     prefill_buckets=(32, 64), do_sample=False,
                     decode_chunk=8),
    )
    req = engine.submit(batch, max_new_tokens=64)
    engine.run()
    eos = model.config.eos_token_idx
    if eos in req.tokens:
        assert req.finish_reason == "eos"
    else:
        # every cache position beyond the prompt was used for a token:
        # first token from prefill + cap decoded tokens
        assert len(req.tokens) == cap + 1
        assert req.finish_reason == "capacity"


def test_finish_reason_budget_and_eos(setup):
    model, params, collator = setup
    batch = collator([{"conversations": [
        {"role": "user", "content": "short"}], "modalities": []}])
    engine = ServingEngine(
        model, params,
        EngineConfig(max_slots=1, max_seq_len=128, max_new_tokens=4,
                     prefill_buckets=(32, 64), do_sample=False),
    )
    req = engine.submit(batch, max_new_tokens=4)
    engine.run()
    assert req.done
    assert req.finish_reason in ("eos", "budget")
    if model.config.eos_token_idx in req.tokens:
        assert req.finish_reason == "eos"
    else:
        assert len(req.tokens) == 4 and req.finish_reason == "budget"
