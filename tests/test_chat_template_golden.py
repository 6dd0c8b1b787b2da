"""Golden parity of ``ChatTemplate.render`` with the HF Jinja chat-template
path the reference actually trains with (``model/model.py:17-99`` keeps
delimiters for label masking but delegates prompt RENDERING to
``tokenizer.apply_chat_template``). A silent divergence between our
self-rendering templates and the families' Jinja templates would break
checkpoint interop invisibly (round-2 VERDICT item 6).

The fixtures under ``tests/fixtures/chat_templates/`` hold the families'
Jinja templates (llama3 verbatim from the Meta-Llama-3-Instruct
tokenizer_config; qwen3 the non-tool ChatML core; apertus from the
reference's delimiter definitions, ``model/model.py:65-79``). They are
rendered through ``transformers``' own Jinja engine — the exact code path
the reference uses — and compared byte-for-byte against ``render()``.
"""

from __future__ import annotations

import os

import pytest

from multimeditron_tpu.data.chat_template import ChatTemplate

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "chat_templates")

CONV = [
    {"role": "system", "content": "You are a helpful medical assistant."},
    {"role": "user", "content": "Describe <|attachment|> this scan."},
    {"role": "assistant", "content": "It shows a healthy lung."},
    {"role": "user", "content": "Any follow-up needed?"},
]

BOS = {"llama": "<|begin_of_text|>", "apertus": "<s>", "qwen3": ""}
FIXTURE_FILE = {"llama": "llama3.jinja", "apertus": "apertus.jinja",
                "qwen3": "qwen3.jinja"}


@pytest.fixture(scope="module")
def hf_tokenizer(tmp_path_factory):
    from tests.fixtures.hf_tokenizer import make_tiny_hf_tokenizer
    from transformers import AutoTokenizer

    out = str(tmp_path_factory.mktemp("tok"))
    make_tiny_hf_tokenizer(out)
    return AutoTokenizer.from_pretrained(out)


def _hf_render(hf_tokenizer, family: str, conversation, add_generation_prompt):
    with open(os.path.join(FIXTURES, FIXTURE_FILE[family])) as f:
        template = f.read()
    hf_tokenizer.chat_template = template
    hf_tokenizer.bos_token = BOS[family] or hf_tokenizer.bos_token
    return hf_tokenizer.apply_chat_template(
        conversation, tokenize=False,
        add_generation_prompt=add_generation_prompt,
    )


def _our_render(family: str, conversation, add_generation_prompt):
    tpl = ChatTemplate.from_name(family)
    rendered = tpl.render(conversation,
                          add_generation_prompt=add_generation_prompt)
    return (BOS[family] if tpl.add_bos else "") + rendered


@pytest.mark.parametrize("family", ["llama", "qwen3", "apertus"])
@pytest.mark.parametrize("gen_prompt", [False, True])
def test_render_matches_hf_jinja(hf_tokenizer, family, gen_prompt):
    assert _our_render(family, CONV, gen_prompt) == _hf_render(
        hf_tokenizer, family, CONV, gen_prompt
    )


def test_llama_trims_content_like_hf(hf_tokenizer):
    """Llama-3's Jinja applies ``content | trim`` — render() must too."""
    conv = [{"role": "user", "content": "  padded question \n"}]
    ours = _our_render("llama", conv, True)
    theirs = _hf_render(hf_tokenizer, "llama", conv, True)
    assert ours == theirs
    assert "padded question<|eot_id|>" in ours


def test_golden_strings_committed():
    """Literal golden strings: regressions in either renderer show as a
    readable diff here, independent of the Jinja engine."""
    got = _our_render("llama", CONV[:2], True)
    assert got == (
        "<|begin_of_text|>"
        "<|start_header_id|>system<|end_header_id|>\n\n"
        "You are a helpful medical assistant.<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\n"
        "Describe <|attachment|> this scan.<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
    )
    got = _our_render("qwen3", CONV[:2], True)
    assert got == (
        "<|im_start|>system\n"
        "You are a helpful medical assistant.<|im_end|>\n"
        "<|im_start|>user\n"
        "Describe <|attachment|> this scan.<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    got = _our_render("apertus", CONV[:2], True)
    assert got == (
        "<s>"
        "<|system_start|>You are a helpful medical assistant.<|system_end|>"
        "<|user_start|>Describe <|attachment|> this scan.<|user_end|>"
        "<|assistant_start|>"
    )
