"""``mmt prep-images``: materialize image datasets from parquet archives.

Offline-reproducible core of the reference's
``scripts/prep_image_datasets.py`` (write_parquet_to_folder at :35-71 and
the deterministic train/test jsonl split at :96-112). The hub-download
half of that script needs network access and is intentionally out of
scope; this command operates on already-downloaded artifacts:

- ``extract``: read parquet rows ``{path, bytes, format}`` and write each
  image file under the output folder (creating parents), collecting
  failures instead of aborting — same row contract as the reference.
- ``split``: split a dataset jsonl into ``<name>-train.jsonl`` /
  ``<name>-test.jsonl`` with the reference's seed-42 shuffle semantics.
"""

from __future__ import annotations

import io
import json
import logging
import os

import click

from multimeditron_tpu.cli import EPILOG, main_cli

logger = logging.getLogger(__name__)


def extract_parquet_images(parquet_path: str, out_dir: str) -> list[str]:
    """Write every image row of ``parquet_path`` under ``out_dir``.

    Rows carry ``path`` (relative output path), ``bytes`` (encoded image)
    and ``format`` (PIL format name). Returns the list of row paths that
    failed to decode/save (mirrors the reference's ``failed`` list).
    """
    import pyarrow.parquet as pq
    from PIL import Image

    out_dir = os.path.abspath(out_dir)
    failed: list[str] = []
    table = pq.read_table(parquet_path)
    for row in table.to_pylist():
        rel, data, fmt = row["path"], row["bytes"], row.get("format")
        try:
            dest = os.path.abspath(os.path.join(out_dir, rel))
            # the parquet is untrusted input: refuse rows whose path
            # escapes the output folder (absolute or '..' components)
            if os.path.commonpath([out_dir, dest]) != out_dir:
                raise ValueError(f"row path escapes --out: {rel!r}")
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            img = Image.open(io.BytesIO(data))
            img.save(dest, fmt)
        except Exception:  # match reference: record and continue
            failed.append(str(rel))
    return failed


def split_jsonl(jsonl_path: str, train_rate: float, seed: int = 42) -> tuple[str, str]:
    """Deterministic train/test split of a jsonl dataset.

    Writes ``<stem>-train.jsonl`` and ``<stem>-test.jsonl`` next to the
    input, mirroring HF ``datasets.train_test_split(train_size, seed=42)``
    membership: n_train is floored, the test split takes the FIRST
    ``len - n_train`` permutation slots, train takes the rest — so datasets
    prepared here match reference-prepared splits row for row.
    """
    import numpy as np

    with open(jsonl_path) as f:
        records = [json.loads(line) for line in f if line.strip()]
    perm = np.random.default_rng(seed).permutation(len(records))
    n_train = int(len(records) * train_rate)
    n_test = len(records) - n_train
    stem = jsonl_path[:-6] if jsonl_path.endswith(".jsonl") else jsonl_path
    train_path, test_path = stem + "-train.jsonl", stem + "-test.jsonl"
    for path, idx in ((train_path, perm[n_test:]), (test_path, perm[:n_test])):
        with open(path, "w") as f:
            for i in idx:
                f.write(json.dumps(records[int(i)]) + "\n")
    return train_path, test_path


@main_cli.command("prep-images", epilog=EPILOG)
@click.option("--parquet", "-p", "parquets", multiple=True,
              type=click.Path(exists=True),
              help="Parquet archive(s) of {path, bytes, format} image rows")
@click.option("--out", "-o", type=click.Path(), default=".",
              help="Folder to materialize images under")
@click.option("--split", "split_path", type=click.Path(exists=True),
              default=None, help="Dataset jsonl to split into train/test")
@click.option("--train-rate", type=float, default=0.8, show_default=True)
@click.option("--seed", type=int, default=42, show_default=True)
def prep_images(parquets, out, split_path, train_rate, seed):
    """Extract image parquets and/or split a dataset jsonl."""
    total_failed = 0
    for parquet_path in parquets:
        failed = extract_parquet_images(parquet_path, out)
        total_failed += len(failed)
        logger.info("%s: extracted under %s (%d failed)",
                    parquet_path, out, len(failed))
        for dest in failed:
            logger.warning("failed to materialize %s", dest)
    if split_path is not None:
        train_path, test_path = split_jsonl(split_path, train_rate, seed)
        logger.info("split %s -> %s / %s", split_path, train_path, test_path)
    if total_failed:
        raise SystemExit(1)
