"""BiomedCLIP fine-tuning workflow (reference ``scripts/biomed_train.py``)
and the PubMedBERT-compatible text tower (``models/bert_text.py``)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimeditron_tpu.models.bert_text import (
    BertTextConfig,
    bert_text_forward,
    bert_text_params_from_state_dict,
    init_bert_text_params,
)


# ----------------------------------------------------------------------
# BERT text tower: HF numerical parity
# ----------------------------------------------------------------------
def test_bert_hf_parity():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    hf_cfg = HFBertConfig(
        vocab_size=97,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=48,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()

    cfg = BertTextConfig.from_hf_dict(hf_cfg.to_dict())
    params = bert_text_params_from_state_dict(hf.state_dict(), cfg)

    ids = np.array([[2, 11, 31, 7, 5, 0, 0, 0], [2, 4, 9, 13, 17, 21, 25, 5]],
                   dtype=np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0], [1] * 8], dtype=np.int64)
    with torch.no_grad():
        out = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
    hidden, pooled = bert_text_forward(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    )
    # padded positions attend to garbage in HF too; compare valid rows
    ref_h = out.last_hidden_state.numpy()
    ours_h = np.asarray(hidden)
    np.testing.assert_allclose(ours_h[1], ref_h[1], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(ours_h[0, :5], ref_h[0, :5], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=2e-4, rtol=2e-4
    )


# ----------------------------------------------------------------------
# Trainer: synthetic contrastive task
# ----------------------------------------------------------------------
class _FixedTokenizer:
    def encode(self, text):
        return [hash(w) % 60 + 2 for w in text.split()]


def _tiny_cfg(tmp_path):
    from multimeditron_tpu.experts.train_biomed import BiomedTrainConfig
    from multimeditron_tpu.models.vit import ViTConfig

    vision = ViTConfig(
        image_size=32, patch_size=16, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, layer_norm_eps=1e-6,
        hidden_act="gelu", use_cls_token=True, use_pre_layernorm=False,
        post_layernorm_output=True, patch_bias=True, dtype=jnp.float32,
    )
    text = BertTextConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_positions=32,
    )
    return BiomedTrainConfig(
        learning_rate=1e-3, batch_size=4, num_epochs=1, image_size=32,
        embed_dim=16, max_text_len=8, output_dir=str(tmp_path / "out"),
        vision=vision, text=text,
    )


def _rows(tmp_path, n=8):
    from PIL import Image

    colors = ["red", "green", "blue", "yellow"]
    rows = []
    for i in range(n):
        color = colors[i % len(colors)]
        path = tmp_path / f"img_{i}.png"
        Image.new("RGB", (32, 32), color).save(path)
        rows.append({
            "modalities": [{"type": "image", "value": path.name}],
            "text": f"a {color} square",
        })
    return rows


def test_biomed_training_reduces_loss(tmp_path):
    from multimeditron_tpu.experts.train_biomed import BiomedTrainer, split_rows

    cfg = _tiny_cfg(tmp_path)
    trainer = BiomedTrainer(cfg, _FixedTokenizer())
    rows = _rows(tmp_path)
    train_rows, eval_rows = split_rows(rows, 0.25, seed=0)
    assert len(eval_rows) == 2 and len(train_rows) == 6

    before = trainer.evaluate(train_rows, str(tmp_path))
    trainer.train(train_rows, eval_rows, str(tmp_path), num_epochs=8)
    after = trainer.evaluate(train_rows, str(tmp_path))
    assert after < before, (before, after)


def test_biomed_save_resume(tmp_path):
    from multimeditron_tpu.experts.train_biomed import BiomedTrainer

    cfg = _tiny_cfg(tmp_path)
    trainer = BiomedTrainer(cfg, _FixedTokenizer())
    rows = _rows(tmp_path, n=4)
    trainer.train(rows, [], str(tmp_path), num_epochs=1)
    path = trainer.save()
    assert os.path.exists(path)

    # reference semantics: a model already in output_dir is preferred
    fresh = BiomedTrainer(cfg, _FixedTokenizer())
    assert fresh.maybe_resume()
    assert fresh.epoch == 1
    a = jax.tree.leaves(trainer.params)
    b = jax.tree.leaves(fresh.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_load_biomed_rows_jsonl(tmp_path):
    from multimeditron_tpu.experts.train_biomed import load_biomed_rows

    p = tmp_path / "data.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"modalities": [], "text": "hello"}) + "\n")
        f.write(json.dumps({"modalities": [], "text": "world"}) + "\n")
    rows, base = load_biomed_rows(str(p))
    assert [r["text"] for r in rows] == ["hello", "world"]
    assert base == str(tmp_path)
