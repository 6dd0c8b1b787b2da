"""Multiple-choice benchmark accuracy scoring (GMAI-MMBench style).

Capability parity with the reference's
``scripts/compute_accuracy_benchmark.py``: given ground-truth answers (with
a variable number of choices per question) and model answers ('?' marks
unanswered), report accuracy, precision over answered, and the
uniform-guess baseline.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence


@dataclasses.dataclass
class AccuracyReport:
    total: int
    correct: int
    answered: int
    accuracy: float
    precision: float
    random_baseline: float

    def __str__(self) -> str:
        return (
            f"{self.total} answers; {self.correct} correct; "
            f"accuracy={self.accuracy:.4f} precision={self.precision:.4f} "
            f"random-guess baseline={self.random_baseline:.4f}"
        )


def score_multiple_choice(
    ground_truth: Sequence[str],
    predictions: Sequence[str],
    num_choices: Optional[Sequence[int]] = None,
    unanswered: str = "?",
) -> AccuracyReport:
    n = len(predictions)
    if len(ground_truth) < n:
        raise ValueError(
            f"{n} predictions but only {len(ground_truth)} ground-truth answers"
        )
    correct = sum(
        str(a).lower() == str(b).lower()
        for a, b in zip(ground_truth, predictions)
    )
    answered = sum(p != unanswered for p in predictions)
    if num_choices is None:
        num_choices = [4] * n
    baseline = sum(1.0 / c for c, _ in zip(num_choices, predictions)) / max(n, 1)
    return AccuracyReport(
        total=n,
        correct=correct,
        answered=answered,
        accuracy=correct / max(n, 1),
        precision=correct / max(answered, 1),
        random_baseline=baseline,
    )


def score_from_files(
    benchmark_tsv: str,
    answers_path: str,
    answer_column: str = "answer",
) -> AccuracyReport:
    """TSV benchmark (columns incl. answer and optional choice columns
    A..E) + a text file of one-character answers."""
    import csv

    ground_truth: List[str] = []
    num_choices: List[int] = []
    with open(benchmark_tsv) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            ground_truth.append(row[answer_column])
            has_e = bool(row.get("E", "").strip())
            num_choices.append(5 if has_e else 4)
    with open(answers_path) as f:
        predictions = list(f.read().strip())
    return score_multiple_choice(ground_truth, predictions, num_choices)
