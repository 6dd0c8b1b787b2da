"""``mmt eval``: benchmark scoring and embedding probes.

Closes the standalone-scripts row of the reference:

- ``mmt eval accuracy`` — multiple-choice answer scoring (reference
  ``scripts/compute_accuracy_benchmark.py``: GMAI-MMBench TSV + a txt of
  one answer letter per question, '?' = unanswered).
- ``mmt eval probe`` — encode a jsonl image dataset with a trained CLIP
  expert and train a linear classification probe on the embeddings
  (reference ``scripts/clip_playground/load_from_clip.py`` +
  ``neural_covid_pneu.py``).
"""

from __future__ import annotations

import logging

import click

from multimeditron_tpu.cli import EPILOG, main_cli

logger = logging.getLogger(__name__)


@main_cli.group("eval", epilog=EPILOG)
def eval_group():
    """Benchmark scoring and embedding probes."""


@eval_group.command("accuracy", epilog=EPILOG)
@click.option("--tsv", type=click.Path(exists=True), required=True,
              help="Benchmark TSV with an 'answer' column (+ choice columns)")
@click.option("--answers", type=click.Path(exists=True), required=True,
              help="Model answers: one letter per question ('?' = skipped)")
@click.option("--answer-column", default="answer", show_default=True)
def eval_accuracy(tsv, answers, answer_column):
    """Score dumped benchmark answers (GMAI-MMBench style)."""
    from multimeditron_tpu.eval.accuracy import score_from_files

    report = score_from_files(tsv, answers, answer_column=answer_column)
    click.echo(str(report))
    click.echo(f"{report.answered} answered out of {report.total}")


@eval_group.command("probe", epilog=EPILOG)
@click.option("--config", "-c", type=click.Path(exists=True), required=True,
              help="Expert YAML (tower dims; same schema as train-expert)")
@click.option("--checkpoint", type=click.Path(exists=True), default=None,
              help="Expert checkpoint dir (model.safetensors); random "
                   "init when omitted (baseline)")
@click.option("--dataset", type=click.Path(exists=True), required=True,
              help="jsonl rows with image paths")
@click.option("--dataset-root", type=click.Path(), default=".",
              help="Root for relative image paths")
@click.option("--classes", required=True,
              help="Comma-separated class keywords; a row labels as the "
                   "single keyword its serialized form contains")
@click.option("--steps", default=300, show_default=True)
@click.option("--lr", default=1e-2, show_default=True)
@click.option("--test-size", default=0.3, show_default=True)
@click.option("--limit", default=None, type=int,
              help="Cap the number of rows (smoke runs)")
@click.option("--save-embeds", type=click.Path(), default=None,
              help="Also dump the (N, D) embeddings as .npy")
def eval_probe(config, checkpoint, dataset, dataset_root, classes, steps,
               lr, test_size, limit, save_embeds):
    """Linear probe on CLIP image embeddings (clip_playground parity)."""
    import jax
    import numpy as np
    import yaml

    from multimeditron_tpu.eval.probe import (
        encode_image_embeddings,
        load_jsonl_images,
        train_linear_probe,
    )
    from multimeditron_tpu.experts.train_clip import (
        ExpertCLIPTrainer,
        ExpertTrainConfig,
    )

    with open(config) as f:
        cfg_d = yaml.safe_load(f)
    fields = {f.name for f in ExpertTrainConfig.__dataclass_fields__.values()}
    cfg = ExpertTrainConfig(**{k: v for k, v in cfg_d.items() if k in fields})
    dual = cfg.dual_config()

    class_names = [c.strip() for c in classes.split(",") if c.strip()]
    images, labels, class_names = load_jsonl_images(
        dataset, dataset_root, class_names,
        image_size=cfg.image_size, limit=limit,
    )
    click.echo(f"{len(images)} labeled images "
               f"({dict(zip(class_names, np.bincount(labels).tolist()))})")

    # Params: checkpoint when given, otherwise random init baseline.
    trainer = ExpertCLIPTrainer(cfg, tokenizer=None)
    if checkpoint:
        trainer.resume(checkpoint)
    params = trainer.params

    embeds = encode_image_embeddings(params, dual, images)
    if save_embeds:
        np.save(save_embeds, embeds)
        click.echo(f"embeddings saved to {save_embeds}")

    report = train_linear_probe(
        embeds, labels, class_names, steps=steps, lr=lr, test_size=test_size,
    )
    click.echo(str(report))
