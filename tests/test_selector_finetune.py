"""Selector fine-tuning companion (notebooks/selector/fine-tuning.py):
the whole flow — mock ImageFolder -> epoch fine-tune with validation ->
reference-format checkpoint -> reload — executes offline (r4 VERDICT #8)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest


def _mod():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "notebooks", "selector",
        "fine-tuning.py")
    spec = importlib.util.spec_from_file_location("selector_ft", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_mock_flow_trains_and_saves(tmp_path):
    ft = _mod()
    root = str(tmp_path / "data")
    ft.make_mock_folder(root, per_class=4, size=32)
    rows, classes = ft.scan_image_folder(root)
    assert len(rows) == 12 and classes == ["Ct", "Mri", "X-ray"]

    out = str(tmp_path / "ckpt")
    metrics = ft.fine_tune(root, output_dir=out, num_epochs=2,
                           batch_size=4, resnet_depth=18, image_size=64)
    assert np.isfinite(metrics["train_loss"])
    assert "val_acc" in metrics

    from multimeditron_tpu.modalities.moe.gating import GatingNetwork

    net, params = GatingNetwork.from_pretrained(out)
    assert net.config.num_classes == 3
    assert sorted(net.config.class_names) == classes


def test_prepare_data_and_subset(tmp_path):
    ft = _mod()
    # a jsonl pointing at two real files + one missing
    src = tmp_path / "imgs" / "study1"
    src.mkdir(parents=True)
    from PIL import Image

    for name in ("a.png", "b.png"):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(src / name)
    jl = tmp_path / "xr.jsonl"
    with open(jl, "w") as f:
        for name in ("a.png", "b.png", "missing.png"):
            f.write(json.dumps({"modalities": [
                {"type": "image", "value": str(src / name)}]}) + "\n")
    target = str(tmp_path / "processed")
    n = ft.prepare_data(str(jl), target, "X-ray")
    assert n == 2
    files = os.listdir(os.path.join(target, "X-ray"))
    assert len(files) == 2 and all(f.startswith("study1_") for f in files)

    out = str(tmp_path / "subset")
    ft.create_subset([os.path.join(target, "X-ray")], out, subset_size=1)
    assert len(os.listdir(os.path.join(out, "X-ray"))) == 1
