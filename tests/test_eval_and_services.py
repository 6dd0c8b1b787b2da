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
