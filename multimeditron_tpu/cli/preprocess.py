"""``mmt preprocess-ds``: dataset preprocessing pipeline.

Parity with the reference's preprocess CLI (``cli/preprocess.py:11-152``):
sources hf/jsonl/parquet/csv, registered map/filter/shuffle stages,
``--head``/``--display`` debugging with a rich table, optional tokenize
pass, parquet output. Dotted CLI overrides replace Hydra composition.
The code-executing stages require the explicit ``--allow-code`` flag.
"""

from __future__ import annotations

import logging

import click

from multimeditron_tpu.cli import EPILOG, main_cli

logger = logging.getLogger(__name__)


@main_cli.command("preprocess-ds", epilog=EPILOG, context_settings=dict(
    ignore_unknown_options=True, allow_extra_args=True))
@click.option("--config", "-c", type=click.Path(exists=True), required=True)
@click.option("--head", "-h", type=int, default=None,
              help="Only process the first N rows")
@click.option("--display", is_flag=True,
              help="Display the processed rows instead of saving")
@click.option("--allow-code", is_flag=True,
              help="Enable python/python-filter stages (they eval config code)")
@click.pass_context
def preprocess_ds(ctx, config, head, display, allow_code):
    from datasets import Dataset, load_dataset

    from multimeditron_tpu.cli.common import load_config
    from multimeditron_tpu.data.preprocessor import run_preprocessors
    from multimeditron_tpu.utils.jsonl import JSONLGenerator

    cfg = load_config(config, ctx.args)
    source = cfg["source"]
    stype = source["type"]
    kwargs = dict(source.get("kwargs", {}))

    if stype == "hf":
        ds = load_dataset(**kwargs)
    elif stype == "jsonl":
        gen = JSONLGenerator(kwargs["path"])
        ds = Dataset.from_generator(lambda: iter(gen))
    elif stype in ("parquet", "csv"):
        ds = load_dataset(stype, data_files=kwargs["path"])["train"]
    else:
        raise ValueError(f"Unsupported dataset source type: {stype!r}")
    logger.info("Loaded %s source: %d rows", stype, len(ds))

    if head is not None:
        ds = ds.select(range(min(head, len(ds))))

    if cfg.get("processes"):
        ds = run_preprocessors(
            ds, cfg.get("num_processes", 0), cfg["processes"], allow_code=allow_code
        )

    tok_cfg = cfg.get("tokenizer", {})
    if tok_cfg.get("enable"):
        from transformers import AutoTokenizer

        if not tok_cfg.get("model"):
            raise ValueError("tokenizer.model must be set when tokenizer.enable")
        tokenizer = AutoTokenizer.from_pretrained(
            tok_cfg["model"], use_fast=tok_cfg.get("use_fast", True)
        )
        tokenizer.pad_token = tokenizer.eos_token
        tokenizer.add_special_tokens(
            {"additional_special_tokens": [tok_cfg["attachment_token"]]}
        )
        ds = ds.map(
            lambda row: tokenizer(
                row[tok_cfg.get("text_field", "text")],
                truncation=True,
                padding="max_length",
                max_length=tok_cfg.get("max_length", 512),
            ),
            batched=False,
            num_proc=cfg.get("num_processes") or None,
        )

    if display:
        from rich.console import Console
        from rich.table import Table

        table = Table(show_header=True, header_style="bold magenta")
        columns = sorted({k for row in ds for k in row.keys()})
        table.add_column("Id")
        for col in columns:
            table.add_column(col)
        for idx, row in enumerate(ds):
            table.add_row(str(idx), *(str(row.get(c, ""))[:120] for c in columns))
        Console().print(table)
        return

    output = cfg["output"]
    if output.endswith(".parquet"):
        ds.to_parquet(output)
    else:
        ds.save_to_disk(output)
    logger.info("Saved %d rows to %s", len(ds), output)
