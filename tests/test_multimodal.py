import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from multimeditron_tpu.data.chat_template import ChatTemplate
from multimeditron_tpu.data.collator import DataCollatorForMultimodal
from multimeditron_tpu.data.loaders import AutoModalityLoader
from multimeditron_tpu.modalities.base import AutoModality
from multimeditron_tpu.modalities.image_clip import ImageConfig
from multimeditron_tpu.models.llama import LlamaConfig
from multimeditron_tpu.models.multimodal import (
    MultimodalConfig,
    MultimodalModel,
    TrainingMode,
    resize_embeddings,
)
from tests.fixtures.toy_tokenizer import ToyTokenizer

ATTACH = "<|attachment|>"


def tiny_image_config(llm_hidden=64):
    return ImageConfig(
        model_type="meditron_clip",
        hidden_size=llm_hidden,
        clip_name="",
        image_size=16,
        patch_size=8,
        vision_hidden_size=32,
        vision_layers=1,
        vision_heads=4,
        vision_intermediate_size=64,
        param_dtype="float32",
    )


def tiny_mm_config():
    llm = LlamaConfig(
        vocab_size=4096,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        dtype=jnp.float32,
    )
    return MultimodalConfig(llm=llm, modalities=[tiny_image_config()])


@pytest.fixture(scope="module")
def model():
    return MultimodalModel(tiny_mm_config())


@pytest.fixture(scope="module")
def params(model):
    return model.init_params(jax.random.PRNGKey(0))


@pytest.fixture()
def collator(model):
    tok = ToyTokenizer()
    return DataCollatorForMultimodal(
        tokenizer=tok,
        modality_processors=model.processors(),
        modality_loaders={"image": AutoModalityLoader.create("raw-image")},
        attachment_token=ATTACH,
        chat_template=ChatTemplate.llama(),
        pad_to_multiple=16,
    )


def _img(color):
    return Image.new("RGB", (20, 24), color)


def _samples():
    return [
        {
            "conversations": [
                {"role": "user", "content": f"what is in {ATTACH} here"},
                {"role": "assistant", "content": "a red square"},
            ],
            "modalities": [{"type": "image", "value": _img((255, 0, 0))}],
        },
        {
            "conversations": [
                {"role": "user", "content": "just text"},
                {"role": "assistant", "content": "sure"},
            ],
            "modalities": [],
        },
    ]


def test_collator_static_shapes(collator):
    batch = collator(_samples())
    B, S = batch["input_ids"].shape
    assert B == 2 and S % 16 == 0
    assert batch["attention_mask"].shape == (B, S)
    assert batch["labels"].shape == (B, S)
    assert batch["position_ids"].shape == (B, S)
    mm = batch["mm_inputs"]["image"]
    n_emb = 4  # (16/8)^2
    assert mm["values"].shape == (1, 16, 16, 3)
    assert mm["batch_idx"].shape == (n_emb,)
    # all scatter rows valid and point at sample 0
    assert (mm["batch_idx"] == 0).all()
    attach_id = collator.tokenizer.token_to_id(ATTACH)
    ids = batch["input_ids"][0]
    np.testing.assert_array_equal(np.sort(np.nonzero(ids == attach_id)[0]),
                                  np.sort(mm["token_pos"]))


def test_collator_budget_padding(model):
    tok = ToyTokenizer()
    coll = DataCollatorForMultimodal(
        tokenizer=tok,
        modality_processors=model.processors(),
        modality_loaders={"image": AutoModalityLoader.create("raw-image")},
        attachment_token=ATTACH,
        chat_template=ChatTemplate.llama(),
        pad_to_multiple=16,
        modality_budgets={"image": 3},
    )
    batch = coll(_samples())
    mm = batch["mm_inputs"]["image"]
    assert mm["values"].shape[0] == 3
    # padded slots dropped (batch_idx == B)
    assert (mm["batch_idx"][4:] == 2).all()


def test_forward_and_splicing(model, params, collator):
    batch = collator(_samples())
    jbatch = jax.tree.map(jnp.asarray, batch)
    logits, loss = model.forward(params, jbatch)
    B, S = batch["input_ids"].shape
    assert logits.shape == (B, S, model.config.llm.vocab_size)
    assert bool(jnp.isfinite(loss))

    # verify splicing: embeddings at attachment positions == projected encode
    embeds = model.embed(params, jbatch["input_ids"], jbatch["mm_inputs"])
    mod = model.modalities["image"]
    projected = mod.encode(
        params["modalities"]["image"], jbatch["mm_inputs"]["image"]["values"]
    ).reshape(-1, 64)
    mm = batch["mm_inputs"]["image"]
    got = embeds[mm["batch_idx"], mm["token_pos"]]
    np.testing.assert_allclose(np.asarray(got), np.asarray(projected), atol=1e-6)


def test_text_only_batch(model, params, collator):
    batch = collator([_samples()[1]])
    jbatch = jax.tree.map(jnp.asarray, batch)
    logits, loss = model.forward(params, jbatch)
    assert bool(jnp.isfinite(loss))


def test_trainable_masks(model, params):
    for mode, (llm_t, proj_t, emb_t) in {
        TrainingMode.ALIGNMENT: (False, True, False),
        TrainingMode.LM_ONLY: (True, False, False),
        TrainingMode.END2END: (True, True, False),
        TrainingMode.FULL: (True, True, True),
    }.items():
        mask = model.trainable_mask(params, mode)
        llm_leaves = jax.tree.leaves(mask["llm"])
        assert all(l == llm_t for l in llm_leaves), mode
        proj_leaves = jax.tree.leaves(mask["modalities"]["image"]["projector"])
        assert all(l == proj_t for l in proj_leaves), mode
        emb_leaves = jax.tree.leaves(mask["modalities"]["image"]["embedder"])
        assert all(l == emb_t for l in emb_leaves), mode


def test_truncation_drops_tail_scatter(model):
    tok = ToyTokenizer()
    coll = DataCollatorForMultimodal(
        tokenizer=tok,
        modality_processors=model.processors(),
        modality_loaders={"image": AutoModalityLoader.create("raw-image")},
        attachment_token=ATTACH,
        chat_template=ChatTemplate.llama(),
        pad_to_multiple=4,
        truncation=True,
        max_sequence_length=8,
    )
    long_sample = {
        "conversations": [
            {"role": "user", "content": f"a very long prompt padding words {ATTACH}"},
            {"role": "assistant", "content": "answer"},
        ],
        "modalities": [{"type": "image", "value": _img((0, 255, 0))}],
    }
    batch = coll([long_sample])
    assert batch["input_ids"].shape[1] == 8
    mm = batch["mm_inputs"]["image"]
    # positions past the truncation point are dropped
    dropped = mm["batch_idx"] == 1
    assert dropped.any()
    assert (mm["token_pos"][~dropped] < 8).all()
    params = model.init_params(jax.random.PRNGKey(1))
    logits, loss = model.forward(params, jax.tree.map(jnp.asarray, batch))
    assert bool(jnp.isfinite(loss))


def test_resize_embeddings():
    cfg = LlamaConfig(vocab_size=32, hidden_size=16, intermediate_size=32,
                      num_layers=1, num_heads=2, num_kv_heads=2, dtype=jnp.float32)
    from multimeditron_tpu.models.llama import init_llama_params

    p = init_llama_params(jax.random.PRNGKey(0), cfg)
    p2 = resize_embeddings(p, cfg, 40)
    assert p2["embed_tokens"].shape == (40, 16)
    assert p2["lm_head"].shape == (16, 40)
    np.testing.assert_allclose(p2["embed_tokens"][:32], p["embed_tokens"])


def test_config_roundtrip():
    cfg = tiny_mm_config()
    d = cfg.to_dict()
    cfg2 = MultimodalConfig.from_dict(d)
    assert cfg2.llm.hidden_size == cfg.llm.hidden_size
    assert len(cfg2.modalities) == 1
    assert cfg2.modalities[0].model_type == "meditron_clip"
    assert cfg2.modalities[0].image_size == 16


def test_uint8_wire_format_bit_identical():
    """wire_dtype='uint8' ships raw resized pixels and normalizes on
    device; the encoded features must be bit-identical to the host-
    normalized float32 path (same f32 math, same op order)."""
    import dataclasses

    from PIL import Image as PILImage

    cfg_f32 = tiny_image_config()
    cfg_u8 = dataclasses.replace(cfg_f32, wire_dtype="uint8")
    m_f32 = AutoModality.from_config(cfg_f32)
    m_u8 = AutoModality.from_config(cfg_u8)
    params = m_f32.init_params(jax.random.PRNGKey(3))

    rng = np.random.default_rng(0)
    img = PILImage.fromarray(
        rng.integers(0, 256, (30, 22, 3), dtype=np.uint8))

    p_f32 = m_f32.processor_class(cfg_f32).process({"type": "image", "value": img})
    p_u8 = m_u8.processor_class(cfg_u8).process({"type": "image", "value": img})
    assert p_u8["value"].dtype == np.uint8
    assert p_f32["value"].dtype == np.float32

    f_f32 = np.asarray(m_f32.encode(params, jnp.asarray(p_f32["value"][None])))
    f_u8 = np.asarray(m_u8.encode(params, jnp.asarray(p_u8["value"][None])))
    np.testing.assert_array_equal(f_f32, f_u8)


def test_uint8_wire_collates_and_generates(collator, params):
    """End-to-end: a uint8-wire model collates (uint8 value arrays) and
    generates the same greedy tokens as the float32-wire model."""
    import dataclasses

    from multimeditron_tpu.models.generation import generate

    llm = tiny_mm_config().llm
    cfg_u8 = dataclasses.replace(tiny_image_config(), wire_dtype="uint8")
    model_u8 = MultimodalModel(MultimodalConfig(llm=llm, modalities=[cfg_u8]))
    model_u8.config.eos_token_idx = 2
    tok = ToyTokenizer()
    coll_u8 = DataCollatorForMultimodal(
        tokenizer=tok,
        modality_processors=model_u8.processors(),
        modality_loaders={"image": AutoModalityLoader.create("raw-image")},
        attachment_token=ATTACH,
        chat_template=ChatTemplate.llama(),
        pad_to_multiple=16,
    )
    sample = {
        "conversations": [{"role": "user", "content": f"look {ATTACH} now"}],
        "modalities": [{"type": "image", "value": _img((120, 10, 200))}],
    }
    b_u8 = coll_u8([sample])
    assert b_u8["mm_inputs"]["image"]["values"].dtype == np.uint8
    got = np.asarray(generate(model_u8, params, b_u8, max_new_tokens=4,
                              do_sample=False))[0]
    b_f32 = collator([sample])
    model_f32 = MultimodalModel(tiny_mm_config())
    model_f32.config.eos_token_idx = 2
    want = np.asarray(generate(model_f32, params, b_f32, max_new_tokens=4,
                               do_sample=False))[0]
    np.testing.assert_array_equal(got, want)
