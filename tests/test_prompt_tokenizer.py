import numpy as np
import pytest

from multimeditron_tpu.constants import IGNORE_TOKEN_INDEX, MODALITIES_KEY
from multimeditron_tpu.data.chat_template import ChatTemplate
from multimeditron_tpu.data.prompt_tokenizer import (
    PromptTokenizer,
    find_tag_positions,
    mask_between_tags,
)
from tests.fixtures.toy_tokenizer import ToyTokenizer

ATTACH = "<|attachment|>"


@pytest.fixture
def tok():
    return ToyTokenizer()


@pytest.fixture
def pt(tok):
    return PromptTokenizer(
        tokenizer=tok,
        chat_template=ChatTemplate.llama(),
        attachment_token=ATTACH,
        modalities_num_embeddings={"image": 4},
    )


def test_find_tag_positions():
    seq = np.array([1, 2, 3, 1, 2, 9, 1, 2], dtype=np.int32)
    assert find_tag_positions(seq, [1, 2]).tolist() == [0, 3, 6]
    assert find_tag_positions(seq, [9, 9]).tolist() == []


def test_mask_between_tags_inclusive():
    seq = np.array([5, 1, 7, 7, 2, 6, 1, 8, 2, 9], dtype=np.int32)
    out = mask_between_tags(seq, [1], [2])
    assert out.tolist() == [5, -100, -100, -100, -100, 6, -100, -100, -100, 9]


def test_mask_between_tags_multitoken():
    seq = np.array([1, 2, 7, 3, 4, 6], dtype=np.int32)
    out = mask_between_tags(seq, [1, 2], [3, 4])
    assert out.tolist() == [-100, -100, -100, -100, -100, 6]


def test_expand_attachment_tokens(pt, tok):
    attach_id = tok.token_to_id(ATTACH)
    img_start = tok.token_to_id("<|image_start|>")
    img_end = tok.token_to_id("<|image_end|>")
    ids = np.array([10, attach_id, 11], dtype=np.int32)
    out = pt.expand_attachment_tokens(ids, [{"type": "image", "num_embeddings": 3}])
    assert out.tolist() == [10, img_start] + [attach_id] * 3 + [img_end, 11]


def test_expand_non_image_not_wrapped(pt, tok):
    attach_id = tok.token_to_id(ATTACH)
    ids = np.array([10, attach_id], dtype=np.int32)
    out = pt.expand_attachment_tokens(ids, [{"type": "audio", "num_embeddings": 2}])
    assert out.tolist() == [10, attach_id, attach_id]


def test_expand_count_mismatch_raises(pt, tok):
    ids = np.array([10, 11], dtype=np.int32)
    with pytest.raises(ValueError):
        pt.expand_attachment_tokens(ids, [{"type": "image", "num_embeddings": 2}])


def test_conversation_label_masking(pt, tok):
    sample = {
        "conversations": [
            {"role": "user", "content": "describe the picture"},
            {"role": "assistant", "content": "a cat"},
        ],
        MODALITIES_KEY: [],
    }
    (res,) = pt.tokenize_samples([sample])
    ids, labels = res["input_ids"], res["labels"]
    # User span fully masked
    user_word = tok.token_to_id("describe")
    assert all(
        labels[i] == IGNORE_TOKEN_INDEX for i in np.nonzero(ids == user_word)[0]
    )
    # Assistant content is NOT masked
    cat = tok.token_to_id("cat")
    cat_pos = np.nonzero(ids == cat)[0]
    assert len(cat_pos) == 1 and labels[cat_pos[0]] == cat
    # EOS appended and unmasked
    assert ids[-1] == tok.eos_id


def test_conversation_with_image_expansion_and_range(pt, tok):
    attach_id = tok.token_to_id(ATTACH)
    sample = {
        "conversations": [
            {"role": "user", "content": f"{ATTACH} what is this"},
            {"role": "assistant", "content": "an xray"},
        ],
        MODALITIES_KEY: [{"type": "image", "num_embeddings": 4}],
    }
    (res,) = pt.tokenize_samples([sample])
    ids = res["input_ids"]
    assert (ids == attach_id).sum() == 4
    (start, end) = res[MODALITIES_KEY][0]["token_range"]
    assert end - start == 4
    assert all(ids[start:end] == attach_id)
    # attachment labels masked
    assert all(res["labels"][start:end] == IGNORE_TOKEN_INDEX)


def test_multiple_modalities_ranges(pt, tok):
    attach_id = tok.token_to_id(ATTACH)
    sample = {
        "text": f"compare {ATTACH} with {ATTACH} please",
        MODALITIES_KEY: [
            {"type": "image", "num_embeddings": 4},
            {"type": "image", "num_embeddings": 2},
        ],
    }
    (res,) = pt.tokenize_samples([sample])
    ids = res["input_ids"]
    r0, r1 = [m["token_range"] for m in res[MODALITIES_KEY]]
    assert r0[1] - r0[0] == 4 and r1[1] - r1[0] == 2
    assert all(ids[r0[0] : r0[1]] == attach_id)
    assert all(ids[r1[0] : r1[1]] == attach_id)
    assert r1[0] >= r0[1]


def test_text_path_labels(pt, tok):
    sample = {"text": "hello world", MODALITIES_KEY: []}
    (res,) = pt.tokenize_samples([sample])
    # bos prepended (llama template), labels equal input ids except attachments
    assert res["input_ids"][0] == tok.bos_id
    assert (res["labels"] == res["input_ids"]).all()


def test_padding_right_and_left(tok):
    samples = [
        {"text": "a b c d e", MODALITIES_KEY: []},
        {"text": "a", MODALITIES_KEY: []},
    ]
    for side in ("right", "left"):
        pt = PromptTokenizer(
            tokenizer=ToyTokenizer(),
            chat_template=ChatTemplate.llama(),
            attachment_token=ATTACH,
            padding_side=side,
        )
        res = pt.tokenize_samples(samples)
        lens = {len(r["input_ids"]) for r in res}
        assert len(lens) == 1
        short = res[1]
        if side == "right":
            assert short["attention_mask"][-1] == 0 and short["attention_mask"][0] == 1
        else:
            assert short["attention_mask"][0] == 0 and short["attention_mask"][-1] == 1
        # pad labels ignored
        pad_pos = np.nonzero(short["attention_mask"] == 0)[0]
        assert all(short["labels"][pad_pos] == IGNORE_TOKEN_INDEX)


def test_pad_to_fixed_length(pt):
    samples = [{"text": "a b", MODALITIES_KEY: []}]
    (res,) = pt.tokenize_samples(samples, pad_to=16)
    assert len(res["input_ids"]) == 16


def test_token_range_with_left_padding(tok):
    pt = PromptTokenizer(
        tokenizer=tok,
        chat_template=ChatTemplate.llama(),
        attachment_token=ATTACH,
        padding_side="left",
    )
    attach_id = tok.token_to_id(ATTACH)
    samples = [
        {"text": f"{ATTACH} short", MODALITIES_KEY: [{"type": "image", "num_embeddings": 3}]},
        {"text": "a much longer text sample with many words", MODALITIES_KEY: []},
    ]
    res = pt.tokenize_samples(samples)
    (start, end) = res[0][MODALITIES_KEY][0]["token_range"]
    ids = res[0]["input_ids"]
    assert all(ids[start:end] == attach_id)
    assert start > 0  # shifted by left padding


def test_qwen3_template_masking(tok):
    pt = PromptTokenizer(
        tokenizer=tok,
        chat_template=ChatTemplate.qwen3(),
        attachment_token=ATTACH,
    )
    sample = {
        "conversations": [
            {"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello there"},
        ],
        MODALITIES_KEY: [],
    }
    (res,) = pt.tokenize_samples([sample])
    ids, labels = res["input_ids"], res["labels"]
    brief = tok.token_to_id("brief")
    hi = tok.token_to_id("hi")
    hello = tok.token_to_id("hello")
    assert all(labels[np.nonzero(ids == brief)[0]] == IGNORE_TOKEN_INDEX)
    assert all(labels[np.nonzero(ids == hi)[0]] == IGNORE_TOKEN_INDEX)
    pos = np.nonzero(ids == hello)[0]
    assert len(pos) == 1 and labels[pos[0]] == hello


def test_generation_prompt_no_eos(pt, tok):
    sample = {
        "conversations": [{"role": "user", "content": "hi"}],
        MODALITIES_KEY: [],
    }
    (res,) = pt.tokenize_samples([sample], add_generation_prompt=True)
    assert res["input_ids"][-1] != tok.eos_id
