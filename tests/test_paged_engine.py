"""Paged KV engine: token parity with the slab engine, page accounting,
pool-exhaustion admission control, and chunked prefill through pages."""

import jax
import numpy as np
import pytest

from multimeditron_tpu.data.chat_template import ChatTemplate
from multimeditron_tpu.data.collator import DataCollatorForMultimodal
from multimeditron_tpu.data.loaders import AutoModalityLoader
from multimeditron_tpu.models.multimodal import MultimodalModel
from multimeditron_tpu.serve.engine import EngineConfig, ServingEngine
from tests.fixtures.toy_tokenizer import ToyTokenizer
from tests.test_multimodal import ATTACH, _img, tiny_mm_config


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


PROMPTS = [
    {"conversations": [{"role": "user", "content": "tell me a story"}],
     "modalities": []},
    {"conversations": [{"role": "user", "content": f"what is {ATTACH} showing"}],
     "modalities": [{"type": "image", "value": _img((10, 200, 30))}]},
    {"conversations": [{"role": "user", "content": "a much longer prompt with "
                        "many repeated words words words words words words"}],
     "modalities": []},
]


def _engine(model, params, kv_mode, **kw):
    base = dict(max_slots=2, max_seq_len=128, max_new_tokens=8,
                prefill_buckets=(32, 64), do_sample=False, kv_mode=kv_mode,
                page_size=16)
    base.update(kw)
    return ServingEngine(model, params, EngineConfig(**base))


def test_paged_matches_slab_greedy(setup):
    model, params, collator = setup
    batches = [collator([p]) for p in PROMPTS]
    out_slab = _engine(model, params, "slab").generate(batches, max_new_tokens=8)
    out_paged = _engine(model, params, "paged").generate(batches, max_new_tokens=8)
    assert out_slab == out_paged


def test_pages_released_after_run(setup):
    model, params, collator = setup
    eng = _engine(model, params, "paged")
    total_free = len(eng.free_pages)
    eng.generate([collator([p]) for p in PROMPTS], max_new_tokens=6)
    assert len(eng.free_pages) == total_free
    assert np.all(eng.page_table == 0)
    assert np.all(eng.slot_num_pages == 0)
    assert sorted(eng.free_pages) == list(range(1, eng.num_pages))


def test_pool_exhaustion_queues_requests(setup):
    model, params, collator = setup
    # pool with room for ~one request at a time: each needs
    # ceil((plen + 8)/16) pages; give the pool 3 pages
    eng = _engine(model, params, "paged", num_pages=4, max_slots=2)
    batches = [collator([p]) for p in PROMPTS]
    reqs = [eng.submit(b, max_new_tokens=8) for b in batches]
    # first step: only what fits is admitted; the rest queue
    eng.step()
    assert len(eng.queue) >= 1
    eng.run()
    assert all(r.done for r in reqs)
    assert sorted(eng.free_pages) == list(range(1, eng.num_pages))
    # and the tokens still match the slab engine's
    want = _engine(model, params, "slab").generate(batches, max_new_tokens=8)
    assert [r.tokens for r in reqs] == want


def test_oversized_request_rejected(setup):
    model, params, collator = setup
    eng = _engine(model, params, "paged", num_pages=2)
    with pytest.raises(ValueError, match="KV pages"):
        eng.submit(collator([PROMPTS[0]]), max_new_tokens=100)


def test_chunked_prefill_through_pages(setup):
    model, params, collator = setup
    # prompt longer than the largest bucket -> chunked prefill path
    long_prompt = {"conversations": [
        {"role": "user", "content": "repeat " * 90}], "modalities": []}
    batch = collator([long_prompt])
    assert batch["input_ids"].shape[1] > 64
    kw = dict(max_seq_len=256, prefill_buckets=(32, 64))
    out_slab = _engine(model, params, "slab", **kw).generate([batch], max_new_tokens=6)
    out_paged = _engine(model, params, "paged", **kw).generate([batch], max_new_tokens=6)
    assert out_slab == out_paged


def test_chunked_prefill_multimodal_through_pages(setup):
    """Paged chunked prefill (persistent slab, folded into the page pool
    once) splices an image whose span lands in a LATER chunk, and two
    back-to-back long prompts don't contaminate each other through the
    reused slab."""
    model, params, collator = setup
    filler = " ".join(f"w{i}" for i in range(80))
    mm_long = {"conversations": [
        {"role": "user", "content": f"{filler} look {ATTACH} now"}],
        "modalities": [{"type": "image", "value": _img((200, 30, 10))}]}
    text_long = {"conversations": [
        {"role": "user", "content": "repeat " * 70}], "modalities": []}
    b1, b2 = collator([mm_long]), collator([text_long])
    assert int(np.asarray(b1["attention_mask"]).sum()) > 64
    kw = dict(max_seq_len=256, prefill_buckets=(32, 64))
    slab_eng = _engine(model, params, "slab", **kw)
    paged_eng = _engine(model, params, "paged", **kw)
    # same engine serves both long prompts in sequence (slab reuse)
    want = [slab_eng.generate([b], max_new_tokens=6) for b in (b1, b2, b1)]
    got = [paged_eng.generate([b], max_new_tokens=6) for b in (b1, b2, b1)]
    assert got == want
    assert got[0] == got[2]  # slab reuse is stateless across prompts


# ---------------------------------------------------------------------------
# Group forks: one prefill per prompt, siblings share prompt KV pages by
# refcount (sglang RadixAttention-style prefix sharing; GRPO rollout path).
# ---------------------------------------------------------------------------
def test_group_fork_matches_independent_greedy(setup):
    model, params, collator = setup
    for prompt in PROMPTS[:2]:  # text-only and multimodal
        b = collator([prompt])
        kw = dict(max_slots=4)
        ind = _engine(model, params, "paged", **kw).generate(
            [b, b, b], max_new_tokens=8)
        grp = _engine(model, params, "paged", **kw).generate(
            [b, b, b], max_new_tokens=8, group_size=3)
        assert ind == grp
        assert ind[0] == ind[1] == ind[2]


def test_group_fork_shares_prompt_pages(setup):
    model, params, collator = setup
    b = collator([PROMPTS[2]])  # longest prompt: several full pages
    eng = _engine(model, params, "paged", max_slots=4)
    eng.submit_group(b, 3, max_new_tokens=8)
    eng._admit()
    plen = int(np.asarray(b["attention_mask"]).sum())
    n_full = plen // eng.page_size
    assert n_full >= 1
    rows = eng.page_table[:3]
    # full prompt pages are the SAME page ids in every slot of the group
    for j in range(n_full):
        assert rows[1, j] == rows[0, j] and rows[2, j] == rows[0, j]
        assert eng.page_ref[rows[0, j]] == 3
    # decode/tail pages are private
    used = int(eng.slot_num_pages[0])
    for j in range(n_full, used):
        assert len({int(rows[i, j]) for i in range(3)}) == 3
    eng.run()
    assert eng.page_ref.sum() == 0
    assert len(eng.free_pages) == eng.num_pages - 1


def test_group_fork_long_prompt_chunked(setup):
    """Forked group whose prompt takes the chunked-prefill path."""
    model, params, collator = setup
    long_prompt = {"conversations": [
        {"role": "user", "content": "repeat " * 90}], "modalities": []}
    b = collator([long_prompt])
    kw = dict(max_seq_len=256, prefill_buckets=(32, 64), max_slots=4)
    ind = _engine(model, params, "paged", **kw).generate(
        [b, b], max_new_tokens=6)
    grp = _engine(model, params, "paged", **kw).generate(
        [b, b], max_new_tokens=6, group_size=2)
    assert ind == grp


def test_group_fork_waits_for_slots(setup):
    """A group wider than the currently-free slots waits (FIFO) and is
    admitted once slots free up; max_slots bounds the group size."""
    model, params, collator = setup
    b = collator([PROMPTS[0]])
    eng = _engine(model, params, "paged", max_slots=2)
    with pytest.raises(ValueError, match="max_slots"):
        eng.submit_group(b, 3)
    # occupy one slot, then queue a 2-wide group: it must wait, then run
    first = eng.submit(b, max_new_tokens=16)
    eng._admit()
    group = eng.submit_group(b, 2, max_new_tokens=4)
    eng.run()
    assert first.done and all(r.done for r in group)
    assert all(len(r.tokens) == 4 for r in group)


def test_submit_group_slab_fallback(setup):
    model, params, collator = setup
    b = collator([PROMPTS[0]])
    eng = _engine(model, params, "slab", max_slots=4)
    reqs = eng.submit_group(b, 3, max_new_tokens=8)
    assert len(reqs) == 3 and not reqs[0].forks
    eng.run()
    toks = [r.tokens for r in reqs]
    assert toks[0] == toks[1] == toks[2]


def test_staggered_admission_parity(setup):
    """prefill_group_cap=1 staggers admission (one group per step, 1-step
    decode chunks between groups) but must produce the exact same greedy
    tokens as admit-everything-at-once, and actually cap the batched
    prefill group sizes."""
    model, params, collator = setup
    batches = [collator([p]) for p in (PROMPTS + PROMPTS)]
    base = _engine(model, params, "paged", max_slots=4)
    out_base = base.generate(batches, max_new_tokens=6)

    stag = _engine(model, params, "paged", max_slots=4,
                   prefill_group_cap=1)
    out_stag = stag.generate(batches, max_new_tokens=6)
    assert out_base == out_stag
    # every compiled batched-prefill variant respects the cap
    assert all(key[1] <= 1 for key in stag._prefill_fns)
    # the uncapped engine did batch same-signature requests (>1 somewhere)
    assert any(key[1] > 1 for key in base._prefill_fns)
