"""Pipeline parallelism (parallel/pipeline.py): GPipe over the "pp" mesh
axis must be numerically equivalent to the plain layer scan — forward,
gradients, and a full trainer step on a pp2 x fsdp2 x tp2 virtual mesh.

The reference has no pipeline engine (SURVEY.md §2.2); these tests pin the
beyond-parity scaling axis to the single-graph semantics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimeditron_tpu.models.llama import (
    LlamaConfig,
    init_llama_params,
    llama_forward,
)
from multimeditron_tpu.models.multimodal import MultimodalModel, TrainingMode
from multimeditron_tpu.parallel.mesh import make_mesh
from multimeditron_tpu.train.trainer import MultimodalTrainer, TrainerConfig

CFG = LlamaConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_layers=4,
    num_heads=4,
    num_kv_heads=2,
    dtype=jnp.float32,  # exact parity checks
)


def _inputs(B=4, S=32, seed=0):
    rng = np.random.default_rng(seed)
    input_ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, S)), jnp.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, S - 5 :] = 0  # one right-padded row
    return input_ids, jnp.asarray(mask)


def test_pipeline_forward_matches_scan():
    params = init_llama_params(jax.random.PRNGKey(0), CFG)
    input_ids, mask = _inputs()
    ref, _ = jax.jit(
        lambda p, i, m: llama_forward(p, CFG, input_ids=i, attention_mask=m)
    )(params, input_ids, mask)

    mesh = make_mesh(pp=4, fsdp=2, devices=jax.devices()[:8])
    pcfg = dataclasses.replace(CFG, pipeline_parallel=4)
    out, _ = jax.jit(
        lambda p, i, m: llama_forward(
            p, pcfg, input_ids=i, attention_mask=m, mesh=mesh
        )
    )(params, input_ids, mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_pipeline_grads_match_scan():
    params = init_llama_params(jax.random.PRNGKey(1), CFG)
    input_ids, mask = _inputs(seed=1)
    mesh = make_mesh(pp=2, fsdp=2, tp=2, devices=jax.devices()[:8])
    pcfg = dataclasses.replace(
        CFG, pipeline_parallel=2, pipeline_microbatches=4
    )

    def loss(p, cfg, mesh=None, remat=False):
        logits, _ = llama_forward(
            p, cfg, input_ids=input_ids, attention_mask=mask,
            mesh=mesh, remat=remat,
        )
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    ref_l, ref_g = jax.jit(jax.value_and_grad(lambda p: loss(p, CFG)))(params)
    pp_l, pp_g = jax.jit(
        jax.value_and_grad(lambda p: loss(p, pcfg, mesh=mesh, remat=True))
    )(params)
    np.testing.assert_allclose(float(pp_l), float(ref_l), rtol=1e-5)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(ref_g)
    flat_p = jax.tree_util.tree_flatten_with_path(pp_g)[0]
    for (path, r), (_, p) in zip(flat_r, flat_p):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), rtol=2e-4, atol=1e-6,
            err_msg=f"grad mismatch at {path}",
        )


def test_pipeline_validation_errors():
    params = init_llama_params(jax.random.PRNGKey(0), CFG)
    input_ids, mask = _inputs()
    mesh = make_mesh(pp=2, fsdp=4, devices=jax.devices()[:8])
    bad = dataclasses.replace(CFG, pipeline_parallel=3)  # 4 layers % 3 != 0
    with pytest.raises(ValueError):
        llama_forward(params, bad, input_ids=input_ids,
                      attention_mask=mask, mesh=mesh)
    pcfg = dataclasses.replace(CFG, pipeline_parallel=2)
    with pytest.raises(ValueError, match="mesh"):
        llama_forward(params, pcfg, input_ids=input_ids, attention_mask=mask)


def test_trainer_pp_step_matches_plain():
    from multimeditron_tpu.data.chat_template import ChatTemplate
    from multimeditron_tpu.data.collator import DataCollatorForMultimodal
    from multimeditron_tpu.data.loaders import AutoModalityLoader
    from tests.fixtures.toy_tokenizer import ToyTokenizer
    from tests.test_multimodal import ATTACH, _samples, tiny_mm_config

    def build(pp, mesh):
        model = MultimodalModel(tiny_mm_config())
        params = model.init_params(jax.random.PRNGKey(0))
        cfg = TrainerConfig(
            learning_rate=1e-3,
            total_steps=4,
            training_mode=TrainingMode.END2END,
            pp=pp,
            remat=True,
            output_dir="/tmp/mmt_test_pp",
        )
        trainer = MultimodalTrainer(model, params, cfg, mesh=mesh)
        collator = DataCollatorForMultimodal(
            tokenizer=ToyTokenizer(),
            modality_processors=model.processors(),
            modality_loaders={"image": AutoModalityLoader.create("raw-image")},
            attachment_token=ATTACH,
            chat_template=ChatTemplate.llama(),
            pad_to_multiple=16,
            modality_budgets={"image": 2},
        )
        return trainer, collator

    mesh_pp = make_mesh(pp=2, fsdp=2, tp=2, devices=jax.devices()[:8])
    trainer_pp, collator = build(2, mesh_pp)
    # the decoder layer stack must actually shard over pp
    spec = trainer_pp.param_shardings["llm"]["layers"]["q_proj"].spec
    assert "pp" in str(spec), f"layer stack not pp-sharded: {spec}"

    mesh_plain = make_mesh(fsdp=4, tp=2, devices=jax.devices()[:8])
    trainer_plain, _ = build(1, mesh_plain)

    batch = collator(_samples())
    m_pp = trainer_pp.train_step(batch)
    m_plain = trainer_plain.train_step(batch)
    assert np.isfinite(float(m_pp["loss"]))
    # bf16 params; identical batch + init => losses agree to bf16 noise
    np.testing.assert_allclose(
        float(m_pp["loss"]), float(m_plain["loss"]), rtol=2e-2
    )
    # second step exercises the donated-buffer path
    m2 = trainer_pp.train_step(collator(_samples()))
    assert np.isfinite(float(m2["loss"]))
