import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from multimeditron_tpu.data.chat_template import ChatTemplate
from multimeditron_tpu.data.collator import DataCollatorForMultimodal
from multimeditron_tpu.data.loaders import AutoModalityLoader
from multimeditron_tpu.models.multimodal import MultimodalModel, TrainingMode
from multimeditron_tpu.parallel.mesh import make_mesh
from multimeditron_tpu.train.trainer import MultimodalTrainer, TrainerConfig
from tests.test_multimodal import ATTACH, _img, _samples, tiny_mm_config
from tests.fixtures.toy_tokenizer import ToyTokenizer


def _make(training_mode=TrainingMode.ALIGNMENT, grad_accum=1, dp=None, fsdp=None, tp=1,
          **cfg_overrides):
    model = MultimodalModel(tiny_mm_config())
    params = model.init_params(jax.random.PRNGKey(0))
    cfg = TrainerConfig(
        learning_rate=1e-3,
        min_lr=1e-4,
        total_steps=10,
        training_mode=training_mode,
        grad_accum=grad_accum,
        dp=dp,
        fsdp=fsdp,
        tp=tp,
        remat=True,
        output_dir="/tmp/mmt_test_ckpt",
        **cfg_overrides,
    )
    trainer = MultimodalTrainer(model, params, cfg)
    tok = ToyTokenizer()
    collator = DataCollatorForMultimodal(
        tokenizer=tok,
        modality_processors=model.processors(),
        modality_loaders={"image": AutoModalityLoader.create("raw-image")},
        attachment_token=ATTACH,
        chat_template=ChatTemplate.llama(),
        pad_to_multiple=16,
        modality_budgets={"image": 2},
    )
    return model, trainer, collator


def test_alignment_updates_only_projector():
    model, trainer, collator = _make(TrainingMode.ALIGNMENT)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.params)
    batch = collator(_samples())
    metrics = trainer.train_step(batch)
    assert np.isfinite(float(metrics["loss"]))
    after = trainer.params

    # projector changed
    pb = before["modalities"]["image"]["projector"]["fc1"]
    pa = np.asarray(after["modalities"]["image"]["projector"]["fc1"])
    assert not np.allclose(pb, pa)
    # llm and tower unchanged
    np.testing.assert_array_equal(
        before["llm"]["embed_tokens"], np.asarray(after["llm"]["embed_tokens"])
    )
    np.testing.assert_array_equal(
        before["modalities"]["image"]["embedder"]["patch_proj"],
        np.asarray(after["modalities"]["image"]["embedder"]["patch_proj"]),
    )


def test_loss_decreases_overfit():
    model, trainer, collator = _make(TrainingMode.FULL)
    batch = collator(_samples())
    losses = [float(trainer.train_step(batch)["loss"]) for _ in range(8)]
    assert losses[-1] < losses[0], losses


def test_grad_accum_matches_large_batch():
    # Two identical microbatches accumulated == one step on that batch.
    model1, t1, coll = _make(TrainingMode.FULL, grad_accum=1)
    model2, t2, _ = _make(TrainingMode.FULL, grad_accum=2)
    batch = coll(_samples())
    t1.train_step(batch)
    t2.train_step(batch)  # accumulate only
    mid = np.asarray(t2.params["modalities"]["image"]["projector"]["fc1"])
    before = np.asarray(t1.params["modalities"]["image"]["projector"]["fc1"])
    t2.train_step(batch)  # applies the update
    a = np.asarray(t1.params["modalities"]["image"]["projector"]["fc1"])
    b = np.asarray(t2.params["modalities"]["image"]["projector"]["fc1"])
    # no update after the first (accumulating) call
    init_model = MultimodalModel(tiny_mm_config())
    init_params = init_model.init_params(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        mid, np.asarray(init_params["modalities"]["image"]["projector"]["fc1"])
    )
    # after the second call, update equals the single-step update
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_fsdp_tp_mesh_training():
    """dp=2 x fsdp=2 x tp=2 over the virtual 8-CPU mesh."""
    model, trainer, collator = _make(TrainingMode.END2END, dp=2, fsdp=2, tp=2)
    samples = _samples() + _samples()  # batch of 4, divisible by dp*fsdp
    batch = collator(samples)
    m = trainer.train_step(batch)
    assert np.isfinite(float(m["loss"]))
    # params sharded: check a tp-sharded weight is actually distributed
    w = trainer.params["llm"]["layers"]["q_proj"]
    assert len(w.sharding.device_set) > 1


def test_param_shardings_cover_tree():
    from multimeditron_tpu.parallel.sharding import param_sharding_rules

    model = MultimodalModel(tiny_mm_config())
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(dp=1, fsdp=4, tp=2)
    rules = param_sharding_rules(params, mesh)
    n_params = len(jax.tree.leaves(params))
    n_rules = len(jax.tree.leaves(rules))
    assert n_params == n_rules


def test_quantize_frozen_towers_matches_bf16_and_updates_projector():
    """cfg.quantize_frozen_towers: the frozen CLIP tower runs through the
    fused W8A8 Pallas path during training — loss tracks the bf16 run and
    the projector still learns (grads flow through tower OUTPUTS only)."""
    model, trainer_q, collator = _make(
        TrainingMode.ALIGNMENT, quantize_frozen_towers=True)
    _, trainer_bf16, _ = _make(TrainingMode.ALIGNMENT)
    batch = collator(_samples())

    before = np.asarray(
        trainer_q.params["modalities"]["image"]["projector"]["fc1"]).copy()
    emb_before = np.asarray(
        trainer_q.params["modalities"]["image"]["embedder"]["patch_proj"]
    ).copy()

    m_q = trainer_q.train_step(batch)
    m_bf16 = trainer_bf16.train_step(batch)
    loss_q, loss_b = float(m_q["loss"]), float(m_bf16["loss"])
    assert np.isfinite(loss_q)
    # int8 tower built (calibrated from this batch) and spliced
    assert trainer_q._qmods is not None and "image" in trainer_q._qmods
    assert "wqkv_q" in trainer_q._qmods["image"]["embedder"]
    # quantization noise must not move the loss materially
    assert abs(loss_q - loss_b) / max(loss_b, 1e-6) < 0.05

    after = np.asarray(
        trainer_q.params["modalities"]["image"]["projector"]["fc1"])
    assert not np.allclose(before, after)  # projector learned
    np.testing.assert_array_equal(  # frozen bf16 master copy untouched
        emb_before,
        np.asarray(
            trainer_q.params["modalities"]["image"]["embedder"]["patch_proj"]),
    )
    # second step reuses the cached qmods (no recalibration)
    qm = trainer_q._qmods
    trainer_q.train_step(batch)
    assert trainer_q._qmods is qm


def test_quantize_frozen_towers_rejects_full_mode():
    model, trainer, collator = _make(
        TrainingMode.FULL, quantize_frozen_towers=True)
    batch = collator(_samples())
    with pytest.raises(ValueError, match="frozen"):
        trainer.train_step(batch)


def test_quantize_frozen_towers_on_fsdp_mesh():
    """The spliced int8 tower composes with GSPMD sharding (fsdp x tp)."""
    model, trainer, collator = _make(
        TrainingMode.END2END, fsdp=2, tp=2, quantize_frozen_towers=True)
    samples = _samples() + _samples()
    batch = collator(samples)
    m = trainer.train_step(batch)
    assert np.isfinite(float(m["loss"]))
    assert trainer._qmods is not None and "image" in trainer._qmods
