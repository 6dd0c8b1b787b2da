import numpy as np
import pytest
from PIL import Image

from multimeditron_tpu.data.chat_template import ChatTemplate
from multimeditron_tpu.data.collator import DataCollatorForMultimodal
from multimeditron_tpu.data.loaders import AutoModalityLoader
from multimeditron_tpu.modalities.base import AutoModality
from tests.test_multimodal import ATTACH, tiny_image_config
from tests.fixtures.toy_tokenizer import ToyTokenizer


def make_collator(use_2d, processor_2d=None):
    cfg = tiny_image_config()
    cfg.use_2d_position_ids = use_2d if processor_2d is None else processor_2d
    modality = AutoModality.from_config(cfg)
    tok = ToyTokenizer()
    return DataCollatorForMultimodal(
        tokenizer=tok,
        modality_processors={"image": modality.make_processor()},
        modality_loaders={"image": AutoModalityLoader.create("raw-image")},
        attachment_token=ATTACH,
        chat_template=ChatTemplate.llama(),
        pad_to_multiple=4,
        use_2d_position_ids=use_2d,
    ), tok


def test_2d_position_ids_shift_correction():
    """Reference semantics (data_loader.py:159-188): image patches get a
    2-D grid offset by the span-start position; later tokens shift back by
    (2-D extent - 1-D span length)."""
    collator, tok = make_collator(use_2d=True)
    sample = {
        "text": f"one {ATTACH} two",
        "modalities": [{"type": "image", "value": Image.new("RGB", (16, 16))}],
    }
    batch = collator([sample])
    pos = batch["position_ids"][0]
    assert pos.shape[-1] == 2

    ids = batch["input_ids"][0]
    attach_id = tok.token_to_id(ATTACH)
    (start,) = np.nonzero(ids == attach_id)[0][:1]
    # tokens: bos one <img_start> a a a a <img_end> two  (grid 2x2)
    # 1-D base: 0 1 2 3 4 5 6 7 8
    start = int(start)
    base_start = start  # == 1-D position at span start (no padding before)
    expected_grid = np.array([[0, 0], [0, 1], [1, 0], [1, 1]]) + base_start
    np.testing.assert_array_equal(pos[start : start + 4], expected_grid)

    # next token (image_end) shifted: old_last=[start+3]*2, new_last=[start+1]*2
    shift = (base_start + 1) - (base_start + 3)
    np.testing.assert_array_equal(pos[start + 4], [start + 4 + shift] * 2)
    # pad rows (beyond text) stay [0, 0]
    mask = batch["attention_mask"][0]
    if (mask == 0).any():
        np.testing.assert_array_equal(pos[mask == 0], 0)


def test_1d_warns_on_custom_position_ids():
    collator, _ = make_collator(use_2d=False, processor_2d=True)
    sample = {
        "text": f"x {ATTACH}",
        "modalities": [{"type": "image", "value": Image.new("RGB", (16, 16))}],
    }
    with pytest.warns(UserWarning, match="position_ids"):
        batch = collator([sample])
    assert batch["position_ids"].ndim == 2  # plain 1-D ids


def test_2d_forward_runs():
    import jax
    import jax.numpy as jnp

    from multimeditron_tpu.models.multimodal import MultimodalModel, MultimodalConfig
    from multimeditron_tpu.models.llama import LlamaConfig

    cfg = tiny_image_config()
    cfg.use_2d_position_ids = True
    llm = LlamaConfig(vocab_size=4096, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, dtype=jnp.float32)
    model = MultimodalModel(MultimodalConfig(llm=llm, modalities=[cfg]))
    params = model.init_params(jax.random.PRNGKey(0))
    collator, _ = make_collator(use_2d=True)
    batch = collator([
        {"text": f"one {ATTACH} two",
         "modalities": [{"type": "image", "value": Image.new("RGB", (16, 16))}]}
    ])
    logits, loss = model.forward(params, jax.tree.map(jnp.asarray, batch))
    assert bool(jnp.isfinite(loss))
