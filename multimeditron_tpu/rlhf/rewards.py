"""Reward managers and rule-based scorers for RLHF.

Capability parity with the reference's reward-manager selection
(``verl/__init__.py:76-118``: naive | batch | prime | dapo managers from
verl) and its rule-based ``compute_score`` hook (``verl/__init__.py:150-169``
— a placeholder counting the letter "a"; the INTERFACE is the capability,
per SURVEY.md §7.4).

A reward manager turns a batch of rollouts into scalar rewards. Scorers
are registered per ``data_source`` and receive (data_source, solution_str,
ground_truth, extra_info).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from multimeditron_tpu.registry import Registry

logger = logging.getLogger(__name__)

# ----------------------------------------------------------------------
# Rule-based scorers
# ----------------------------------------------------------------------
SCORERS: Dict[str, Callable] = {}


def register_scorer(name: str):
    def deco(fn):
        SCORERS[name] = fn
        return fn

    return deco


@register_scorer("exact_match")
def exact_match(solution: str, ground_truth: str, **kw) -> float:
    return float(solution.strip() == str(ground_truth).strip())


@register_scorer("contains")
def contains(solution: str, ground_truth: str, **kw) -> float:
    return float(str(ground_truth) in solution)


@register_scorer("char_count")
def char_count(solution: str, ground_truth: str = "a", **kw) -> float:
    """The reference's placeholder scorer (counts occurrences of a letter,
    ``verl/__init__.py:150-169``) — kept for interface parity."""
    return float(solution.count(str(ground_truth) or "a"))


@register_scorer("length_penalty")
def length_penalty(solution: str, ground_truth: str = "", max_len: int = 512, **kw) -> float:
    return max(0.0, 1.0 - len(solution) / max_len)


_SANDBOX = None


@register_scorer("python_exec")
def python_exec(solution: str, ground_truth: str, timeout: int = 5, **kw) -> float:
    """Execute the generated code in the C++ sandbox and compare stdout to
    the expected output — the code-RL reward the reference's nsjail wrapper
    existed for (``tools/__init__.py:10-110``). Reward 1.0 on matching
    stdout, 0 on mismatch/crash/timeout."""
    global _SANDBOX
    if _SANDBOX is None:
        from multimeditron_tpu.rlhf.sandbox import SandboxExecutor

        _SANDBOX = SandboxExecutor(timeout_sec=timeout, mem_mb=1024)
    try:
        result = _SANDBOX.run_code(solution)
    except Exception:  # noqa: BLE001 — sandbox infra failure = no reward
        return 0.0
    if result.returncode != 0 or result.timed_out:
        return 0.0
    return float(result.stdout.strip() == str(ground_truth).strip())


def compute_score(
    data_source: str,
    solution_str: str,
    ground_truth: str,
    extra_info: Optional[dict] = None,
) -> float:
    """Dispatch to the scorer registered for ``data_source`` (fallback:
    exact_match)."""
    scorer = SCORERS.get(data_source, SCORERS["exact_match"])
    return float(scorer(solution_str, ground_truth, **(extra_info or {})))


# ----------------------------------------------------------------------
# Reward managers
# ----------------------------------------------------------------------
class BaseRewardManager:
    """Scores decoded rollouts. Subclasses define batching/aggregation."""

    def __init__(self, score_fn: Callable = compute_score):
        self.score_fn = score_fn

    def __call__(self, rollouts: List[Dict[str, Any]]) -> np.ndarray:
        raise NotImplementedError


AutoRewardManager = Registry("reward manager", BaseRewardManager)


@AutoRewardManager.register("naive")
class NaiveRewardManager(BaseRewardManager):
    """One score per rollout, sequentially."""

    def __call__(self, rollouts: List[Dict[str, Any]]) -> np.ndarray:
        return np.asarray(
            [
                self.score_fn(
                    r.get("data_source", "exact_match"),
                    r["response"],
                    r.get("ground_truth", ""),
                    r.get("extra_info"),
                )
                for r in rollouts
            ],
            dtype=np.float32,
        )


@AutoRewardManager.register("batch")
class BatchRewardManager(BaseRewardManager):
    """Vectorized scoring through a batch score_fn when provided."""

    def __call__(self, rollouts: List[Dict[str, Any]]) -> np.ndarray:
        if hasattr(self.score_fn, "batch"):
            return np.asarray(self.score_fn.batch(rollouts), dtype=np.float32)
        return NaiveRewardManager(self.score_fn)(rollouts)


@AutoRewardManager.register("prime")
class PrimeRewardManager(NaiveRewardManager):
    """Process-reward-style manager: clips scores to [0, 1]."""

    def __call__(self, rollouts):
        return np.clip(super().__call__(rollouts), 0.0, 1.0)


@AutoRewardManager.register("dapo")
class DapoRewardManager(NaiveRewardManager):
    """DAPO-style manager: adds an overlong-response soft penalty."""

    def __init__(self, score_fn=compute_score, max_response_len: int = 1024,
                 overlong_buffer: int = 256, penalty: float = 1.0):
        super().__init__(score_fn)
        self.max_response_len = max_response_len
        self.overlong_buffer = overlong_buffer
        self.penalty = penalty

    def __call__(self, rollouts):
        scores = super().__call__(rollouts)
        for i, r in enumerate(rollouts):
            n = r.get("response_len", len(r["response"]))
            start = self.max_response_len - self.overlong_buffer
            if n > start:
                frac = min(1.0, (n - start) / self.overlong_buffer)
                scores[i] -= self.penalty * frac
        return scores
