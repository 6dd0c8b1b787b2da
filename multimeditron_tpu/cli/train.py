"""``mmt train``: staged multimodal SFT from a YAML config.

Parity with the reference's train CLI (``cli/train.py:73-201``): same
config schema (base_llm / base_model / attachment_token / tokenizer_type /
token_size / modalities / loaders / training_mode / datasets /
training_args), checkpoint resume, metrics logging — mapped onto the GSPMD
trainer instead of HF Trainer + DeepSpeed.
"""

from __future__ import annotations

import logging
import os

import click

from multimeditron_tpu.cli import EPILOG, main_cli

logger = logging.getLogger(__name__)


@main_cli.command(epilog=EPILOG, context_settings=dict(
    ignore_unknown_options=True, allow_extra_args=True))
@click.option("--config", "-c", type=click.Path(exists=True), required=True,
              help="YAML training config (reference schema).")
@click.option("--seed", "-s", default=0, help="Random seed")
@click.option("--resume/--no-resume", default=False,
              help="Resume from the latest checkpoint in output_dir")
@click.pass_context
def train(ctx, config: str, seed: int = 0, resume: bool = False):
    import jax
    import numpy as np

    from multimeditron_tpu.cli.common import (
        build_collator,
        build_model,
        build_tokenizer,
        load_config,
    )
    from multimeditron_tpu.models.multimodal import TrainingMode
    from multimeditron_tpu.parallel.mesh import multihost_initialize
    from multimeditron_tpu.train.checkpoint import Checkpointer
    from multimeditron_tpu.train.data import DataLoader, build_datasets
    from multimeditron_tpu.train.trainer import (
        MetricsLogger,
        MultimodalTrainer,
        TrainerConfig,
    )

    cfg = load_config(config, ctx.args)
    np.random.seed(seed)

    multihost_initialize()

    tokenizer, chat_template = build_tokenizer(cfg)
    model = build_model(
        cfg,
        vocab_size=tokenizer.vocab_size,
        eos_token_idx=tokenizer.eos_id,
    )

    key = jax.random.PRNGKey(seed)
    if cfg.get("base_model"):
        from multimeditron_tpu.models.hf_export import import_multimodal

        logger.info("Loading base multimodal checkpoint from %s", cfg["base_model"])
        model, params = import_multimodal(cfg["base_model"])
    else:
        logger.info("Bootstrapping model (pretrained LLM/towers where local)")
        params = model.bootstrap_params(key)

    ta = cfg.get("training_args", {})
    mesh_cfg = cfg.get("mesh", {})
    dataset = build_datasets(cfg["datasets"], seed=seed)
    # Global batch = per-device batch x data-parallel extent (dp*fsdp; the
    # tp axis replicates data, it does not scale the batch).
    tp = mesh_cfg.get("tp", 1)
    dp = mesh_cfg.get("dp")
    fsdp = mesh_cfg.get("fsdp")
    rest = tp * mesh_cfg.get("sp", 1) * mesh_cfg.get("ep", 1) * mesh_cfg.get("pp", 1)
    n_data = (dp or 1) * (fsdp or (jax.device_count() // ((dp or 1) * rest)))
    batch_size = ta.get("per_device_train_batch_size", 4) * max(1, n_data)
    epochs = ta.get("num_train_epochs", 1)
    steps_per_epoch = max(1, len(dataset) // batch_size)
    total_steps = ta.get("max_steps") or int(steps_per_epoch * epochs)

    trainer_cfg = TrainerConfig(
        learning_rate=ta.get("learning_rate", 1e-4),
        min_lr=ta.get("lr_scheduler_kwargs", {}).get("min_lr", 0.0),
        warmup_steps=ta.get("warmup_steps", 0),
        total_steps=total_steps,
        weight_decay=ta.get("weight_decay", 0.01),
        max_grad_norm=ta.get("max_grad_norm", 1.0),
        grad_accum=ta.get("gradient_accumulation_steps", 1),
        training_mode=TrainingMode(cfg.get("training_mode", "ALIGNMENT")),
        dp=mesh_cfg.get("dp"),
        fsdp=mesh_cfg.get("fsdp"),
        tp=mesh_cfg.get("tp", 1),
        sp=mesh_cfg.get("sp", 1),
        ring_attention=mesh_cfg.get("ring_attention", False),
        ep=mesh_cfg.get("ep", 1),
        pp=mesh_cfg.get("pp", 1),
        pp_microbatches=mesh_cfg.get("pp_microbatches"),
        remat=ta.get("gradient_checkpointing", True),
        quantize_frozen_towers=ta.get("quantize_frozen_towers", False),
        adam_moment_dtype=ta.get("adam_moment_dtype"),
        log_every=ta.get("logging_steps", 1),
        save_every=_resolve_save_steps(ta, total_steps),
        output_dir=ta.get("output_dir", "checkpoints"),
        run_name=ta.get("run_name", "multimeditron-tpu"),
        wandb=("wandb" in str(ta.get("report_to", ""))),
        wandb_run_id=cfg.get("wandb_run_id"),
        seed=seed,
    )

    trainer = MultimodalTrainer(model, params, trainer_cfg)
    ckpt = Checkpointer(os.path.join(trainer_cfg.output_dir, "ckpt"))

    start_step = 0
    if resume or cfg.get("resume_from_checkpoint"):
        latest = ckpt.latest_step()
        if latest is not None:
            logger.info("Resuming from checkpoint step %d", latest)
            restored = ckpt.restore(
                templates={"params": trainer.params, "opt_state": trainer.opt_state}
            )
            trainer.params = restored["params"]
            trainer.opt_state = restored["opt_state"]
            trainer.step = start_step = latest

    collator = build_collator(cfg, model, tokenizer, chat_template)
    loader = DataLoader(
        dataset,
        collator,
        batch_size=batch_size,
        seed=seed,
        num_workers=ta.get("dataloader_num_workers", 2),
        num_epochs=None,  # trainer stops at total_steps
        worker_mode=ta.get("dataloader_worker_mode", "thread"),
    )

    logger.info(
        "Training: mode=%s steps=%d batch=%d mesh=(dp=%s fsdp=%s tp=%s)",
        trainer_cfg.training_mode, total_steps, batch_size,
        trainer_cfg.dp, trainer_cfg.fsdp, trainer_cfg.tp,
    )
    metrics_logger = MetricsLogger(trainer_cfg)
    trainer.train(loader, num_steps=total_steps, logger=metrics_logger,
                  checkpointer=ckpt)

    # Final save: orbax + HF-format export (reference gathers fp16 weights
    # on save, deepspeed.json:19 — here export is just a host write).
    ckpt.save(trainer.step, trainer.params, trainer.opt_state)
    ckpt.close()
    from multimeditron_tpu.models.hf_export import export_multimodal

    export_dir = os.path.join(trainer_cfg.output_dir, "hf_export")
    export_multimodal(model, trainer.params, export_dir)
    logger.info("Saved final checkpoint + HF export to %s", trainer_cfg.output_dir)


def _resolve_save_steps(ta, total_steps):
    save_steps = ta.get("save_steps")
    if save_steps is None:
        return None
    if isinstance(save_steps, float) and save_steps <= 1.0:
        # fractional save cadence (reference config_alignment.yaml:48)
        return max(1, int(total_steps * save_steps))
    return int(save_steps)
