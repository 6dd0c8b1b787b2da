import json
import threading
import urllib.request

import numpy as np
import pytest

from multimeditron_tpu.eval.accuracy import score_from_files, score_multiple_choice


def test_score_multiple_choice():
    gt = ["A", "B", "C", "D"]
    pred = ["a", "B", "?", "A"]
    report = score_multiple_choice(gt, pred, num_choices=[4, 4, 5, 4])
    assert report.total == 4
    assert report.correct == 2  # case-insensitive
    assert report.answered == 3
    assert report.accuracy == 0.5
    assert report.precision == pytest.approx(2 / 3)
    assert report.random_baseline == pytest.approx((1/4 + 1/4 + 1/5 + 1/4) / 4)


def test_score_from_files(tmp_path):
    tsv = tmp_path / "bench.tsv"
    tsv.write_text("question\tanswer\tE\nq1\tA\t\nq2\tB\topt\nq3\tC\t\n")
    answers = tmp_path / "answers.txt"
    answers.write_text("AB?")
    report = score_from_files(str(tsv), str(answers))
    assert report.total == 3 and report.correct == 2 and report.answered == 2
    assert report.random_baseline == pytest.approx((1/4 + 1/5 + 1/4) / 3)


def test_eval_accuracy_cli(tmp_path):
    from click.testing import CliRunner

    from multimeditron_tpu.cli import main_cli

    tsv = tmp_path / "bench.tsv"
    tsv.write_text("question\tanswer\tE\nq1\tA\t\nq2\tB\topt\nq3\tC\t\n")
    answers = tmp_path / "answers.txt"
    answers.write_text("AB?")
    runner = CliRunner()
    res = runner.invoke(main_cli, [
        "eval", "accuracy", "--tsv", str(tsv), "--answers", str(answers),
    ])
    assert res.exit_code == 0, res.output
    assert "accuracy=0.6667" in res.output
    assert "2 answered out of 3" in res.output


def test_linear_probe_separates_colors(tmp_path):
    """clip_playground parity: encode a tiny labeled image set with a CLIP
    tower and verify a linear probe on the embeddings learns the classes
    (red vs blue squares are trivially separable even for a random
    tower)."""
    import json as _json

    from PIL import Image

    from multimeditron_tpu.eval.probe import (
        encode_image_embeddings,
        load_jsonl_images,
        train_linear_probe,
    )
    from multimeditron_tpu.experts.train_clip import (
        ExpertCLIPTrainer,
        ExpertTrainConfig,
    )

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    rng = np.random.default_rng(0)
    for i in range(24):
        color = "redthing" if i % 2 else "bluething"
        base = (200, 30, 30) if i % 2 else (30, 30, 200)
        arr = np.clip(
            np.asarray(base, np.int32)[None, None]
            + rng.integers(-25, 25, (32, 32, 3)), 0, 255
        ).astype(np.uint8)
        path = img_dir / f"{color}_{i}.png"
        Image.fromarray(arr).save(path)
        rows.append({
            "label": color,
            "modalities": [{"type": "image", "value": str(path)}],
        })
    ds = tmp_path / "ds.jsonl"
    ds.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")

    cfg = ExpertTrainConfig(
        image_size=32, patch_size=8, vision_hidden_size=64, vision_layers=2,
        vision_heads=4, vision_intermediate_size=128, text_vocab_size=64,
        text_hidden_size=32, text_layers=1, text_heads=2,
        text_intermediate_size=64, projection_dim=16,
    )
    images, labels, class_names = load_jsonl_images(
        str(ds), str(tmp_path), ["bluething", "redthing"], image_size=32)
    assert len(images) == 24 and set(labels.tolist()) == {0, 1}

    trainer = ExpertCLIPTrainer(cfg, tokenizer=None)
    embeds = encode_image_embeddings(trainer.params, cfg.dual_config(),
                                     images, batch_size=8)
    assert embeds.shape == (24, 16)
    np.testing.assert_allclose(np.linalg.norm(embeds, axis=-1), 1.0,
                               atol=1e-3)
    report = train_linear_probe(embeds, labels, class_names, steps=200)
    assert report.test_accuracy >= 0.8


def test_exec_service_http():
    from multimeditron_tpu.cli.exec_service import make_server

    server = make_server("127.0.0.1", 0, timeout=5, mem_mb=2048)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/execute",
            data=json.dumps({"code": "print(6 * 7)"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            body = json.loads(resp.read())
        assert body["returncode"] == 0
        assert body["stdout"].strip() == "42"
    finally:
        server.shutdown()
