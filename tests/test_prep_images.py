"""Tests for ``mmt prep-images`` (reference scripts/prep_image_datasets.py
offline core: parquet image extraction + deterministic jsonl split)."""

import io
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from click.testing import CliRunner
from PIL import Image

from multimeditron_tpu.cli import main_cli
from multimeditron_tpu.cli.prep_images import extract_parquet_images, split_jsonl


def _image_bytes(color, fmt="PNG"):
    buf = io.BytesIO()
    Image.new("RGB", (8, 8), color).save(buf, fmt)
    return buf.getvalue()


def _make_parquet(path, rows):
    table = pa.table({
        "path": [r[0] for r in rows],
        "bytes": [r[1] for r in rows],
        "format": [r[2] for r in rows],
    })
    pq.write_table(table, path)


def test_extract_parquet_images(tmp_path):
    parquet = tmp_path / "imgs.parquet"
    _make_parquet(str(parquet), [
        ("a/one.png", _image_bytes((255, 0, 0)), "PNG"),
        ("b/two.jpeg", _image_bytes((0, 255, 0), "JPEG"), "JPEG"),
    ])
    out = tmp_path / "out"
    failed = extract_parquet_images(str(parquet), str(out))
    assert failed == []
    img = Image.open(out / "a" / "one.png")
    assert img.size == (8, 8)
    assert img.getpixel((0, 0)) == (255, 0, 0)
    assert (out / "b" / "two.jpeg").exists()


def test_extract_records_failures_and_continues(tmp_path):
    parquet = tmp_path / "imgs.parquet"
    _make_parquet(str(parquet), [
        ("bad.png", b"not an image", "PNG"),
        ("ok.png", _image_bytes((0, 0, 255)), "PNG"),
    ])
    out = tmp_path / "out"
    failed = extract_parquet_images(str(parquet), str(out))
    assert len(failed) == 1 and failed[0].endswith("bad.png")
    assert (out / "ok.png").exists()


def test_split_jsonl_deterministic(tmp_path):
    src = tmp_path / "ds.jsonl"
    records = [{"id": i} for i in range(10)]
    with open(src, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")

    train_path, test_path = split_jsonl(str(src), train_rate=0.8, seed=42)
    train = [json.loads(l) for l in open(train_path)]
    test = [json.loads(l) for l in open(test_path)]
    assert len(train) == 8 and len(test) == 2
    # disjoint cover of the input
    ids = sorted(r["id"] for r in train + test)
    assert ids == list(range(10))
    # deterministic: same seed -> same split
    train2, _ = split_jsonl(str(src), train_rate=0.8, seed=42)
    assert [json.loads(l) for l in open(train2)] == train


def test_cli_end_to_end(tmp_path):
    parquet = tmp_path / "imgs.parquet"
    _make_parquet(str(parquet), [("x.png", _image_bytes((9, 9, 9)), "PNG")])
    src = tmp_path / "ds.jsonl"
    with open(src, "w") as f:
        for i in range(5):
            f.write(json.dumps({"id": i}) + "\n")

    runner = CliRunner()
    res = runner.invoke(main_cli, [
        "prep-images", "-p", str(parquet), "-o", str(tmp_path / "out"),
        "--split", str(src), "--train-rate", "0.6",
    ])
    assert res.exit_code == 0, res.output
    assert (tmp_path / "out" / "x.png").exists()
    assert len(open(tmp_path / "ds-train.jsonl").readlines()) == 3
    assert len(open(tmp_path / "ds-test.jsonl").readlines()) == 2
