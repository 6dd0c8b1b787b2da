"""Expert-training CLI commands (reference ``cli/experts.py:6-55``):
``train-expert``, ``batch-train-expert`` (parallel subprocess launches),
``config-maker-expert``, plus ``train-router`` for the gating network."""

from __future__ import annotations

import logging
import os
import subprocess
import sys

import click

from multimeditron_tpu.cli import EPILOG, main_cli

logger = logging.getLogger(__name__)


@main_cli.command("train-expert", epilog=EPILOG)
@click.option("--config", "-c", type=click.Path(exists=True), required=True)
@click.option("--resume/--no-resume", default=True,
              help="Auto-resume from the latest checkpoint in output_dir")
def train_expert(config, resume):
    import yaml

    from multimeditron_tpu.data.tokenizer import HFTokenizer
    from multimeditron_tpu.experts.train_clip import (
        ExpertCLIPTrainer,
        ExpertTrainConfig,
        filter_corrupt_images,
        get_combined_dataset,
    )

    with open(config) as f:
        cfg_d = yaml.safe_load(f)
    datasets_spec = cfg_d.pop("datasets")
    tokenizer_path = cfg_d.pop("tokenizer", None)
    filter_corrupt = cfg_d.pop("filter_corrupt_images", False)
    run_name = cfg_d.pop("run_name", None)

    fields = {f.name for f in ExpertTrainConfig.__dataclass_fields__.values()}
    cfg = ExpertTrainConfig(**{k: v for k, v in cfg_d.items() if k in fields})

    from transformers import AutoTokenizer

    tokenizer = HFTokenizer(AutoTokenizer.from_pretrained(tokenizer_path))
    trainer = ExpertCLIPTrainer(cfg, tokenizer)

    if resume:
        latest = ExpertCLIPTrainer.latest_checkpoint(cfg.output_dir)
        if latest:
            logger.info("Resuming from %s", latest)
            trainer.resume(latest)

    ds = get_combined_dataset(datasets_spec, seed=cfg.seed)
    if filter_corrupt:
        ds = filter_corrupt_images(ds, cfg.image_column)
    loss = trainer.train(ds)
    click.echo(f"final contrastive loss: {loss:.4f}")


@main_cli.command("batch-train-expert", epilog=EPILOG)
@click.option("--config-dir", "-d", type=click.Path(exists=True), required=True)
@click.option("--parallel", "-p", default=1, help="Concurrent trainings")
def batch_train_expert(config_dir, parallel):
    """Launch one train-expert subprocess per config file (reference
    ``cli/experts.py`` batch_train_expert)."""
    configs = sorted(
        os.path.join(config_dir, f)
        for f in os.listdir(config_dir)
        if f.endswith((".yaml", ".yml"))
    )
    running = []
    for cfg in configs:
        while len(running) >= parallel:
            running = [p for p in running if p.poll() is None] or running[:0]
            if len(running) >= parallel:
                running[0].wait()
                running = [p for p in running if p.poll() is None]
        click.echo(f"launching {cfg}")
        running.append(
            subprocess.Popen(
                [sys.executable, "-m", "multimeditron_tpu.cli.main",
                 "train-expert", "-c", cfg]
            )
        )
    for p in running:
        p.wait()


@main_cli.command("config-maker-expert", epilog=EPILOG)
@click.option("--spec", "-s", type=click.Path(exists=True), required=True,
              help="YAML grid spec (base_configs/datamixes/param_ranges)")
def config_maker_expert(spec):
    import yaml

    from multimeditron_tpu.experts.config_maker import (
        Configurations,
        write_configurations,
    )

    with open(spec) as f:
        spec_obj = Configurations(**yaml.safe_load(f))
    paths = write_configurations(spec_obj)
    click.echo(f"wrote {len(paths)} configs to {spec_obj.output_dir}")


@main_cli.command("train-router", epilog=EPILOG)
@click.option("--config", "-c", type=click.Path(exists=True), required=True)
def train_router(config):
    import yaml

    from multimeditron_tpu.experts.train_router import RouterTrainConfig, RouterTrainer
    from multimeditron_tpu.experts.train_clip import get_combined_dataset

    with open(config) as f:
        cfg_d = yaml.safe_load(f)
    datasets_spec = cfg_d.pop("datasets")
    fields = {f.name for f in RouterTrainConfig.__dataclass_fields__.values()}
    cfg = RouterTrainConfig(**{k: v for k, v in cfg_d.items() if k in fields})
    trainer = RouterTrainer(cfg)
    ds = get_combined_dataset(datasets_spec, seed=cfg.seed)
    metrics = trainer.train(ds)
    click.echo(f"router trained: {metrics}; saved to {cfg.output_dir}")


@main_cli.command("train-biomed", epilog=EPILOG)
@click.option("--data-url", required=True,
              help="JSONL file or HF dataset dir with modalities/text rows")
@click.option("--tokenizer", "tokenizer_path", required=True,
              help="HF tokenizer path (PubMedBERT-style)")
@click.option("--lr", default=5e-5, show_default=True)
@click.option("--batch-size", default=16, show_default=True)
@click.option("--num-epochs", default=20, show_default=True)
@click.option("--output-dir", default="output", show_default=True)
@click.option("--save-model/--no-save-model", default=False)
def train_biomed(data_url, tokenizer_path, lr, batch_size, num_epochs,
                 output_dir, save_model):
    """BiomedCLIP contrastive fine-tune (reference scripts/biomed_train.py)."""
    from transformers import AutoTokenizer

    from multimeditron_tpu.data.tokenizer import HFTokenizer
    from multimeditron_tpu.experts.train_biomed import (
        BiomedTrainConfig,
        BiomedTrainer,
        load_biomed_rows,
        split_rows,
    )

    cfg = BiomedTrainConfig(
        learning_rate=lr, batch_size=batch_size, num_epochs=num_epochs,
        output_dir=output_dir, save_model=save_model,
    )
    tokenizer = HFTokenizer(AutoTokenizer.from_pretrained(tokenizer_path))
    trainer = BiomedTrainer(cfg, tokenizer)
    if trainer.maybe_resume():
        logger.info("Resumed model from %s", output_dir)
    rows, base_dir = load_biomed_rows(data_url)
    train_rows, eval_rows = split_rows(rows, cfg.eval_fraction, cfg.seed)
    train_loss, eval_loss = trainer.train(train_rows, eval_rows, base_dir)
    if save_model:
        path = trainer.save()
        click.echo(f"saved {path}")
    click.echo(f"train_loss {train_loss:.4f} eval_loss {eval_loss:.4f}")
