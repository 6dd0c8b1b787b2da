"""Profiling hooks.

Capability parity with the reference's three env-gated tracing hooks
(SURVEY.md §5: PyTorch profiler window, NVTX/Nsight ranges, benchy
dataloader throughput — ``train/trainer.py:147-198``, ``profiling.py:5-75``):

- ``profile_window``: jax.profiler trace over a step window (Perfetto/
  TensorBoard readable), enabled by ENABLE_JAX_PROFILER=1;
- ``step_annotation`` / ``annotate``: named trace ranges, the
  ``record_function``/NVTX-range equivalent;
- ``ThroughputMeter``: tokens/sec + images/sec + MFU estimation, the
  benchy-wrapper equivalent (ENABLE_BENCHY parity).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional

import jax

# Rough per-chip peak bf16 FLOP/s for MFU estimates.
PEAK_FLOPS = {
    "tpu v4": 275e12,
    "tpu v5 lite": 197e12,
    "tpu v5e": 197e12,
    "tpu v5p": 459e12,
    "tpu v6e": 918e12,
    "cpu": 1e12,
}


def device_peak_flops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for name, flops in PEAK_FLOPS.items():
        if name in kind:
            return flops
    return 197e12


@contextlib.contextmanager
def profile_window(logdir: str) -> Iterator[None]:
    """Trace everything inside the context to ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(step: int):
    """Named per-step range (reference ``record_function("training_step")``)."""
    return jax.profiler.StepTraceAnnotation("train_step", step_num=step)


def annotate(name: str):
    """Named sub-range (reference NVTX ranges for data-copy/forward/opt)."""
    return jax.profiler.TraceAnnotation(name)


def profiler_enabled() -> bool:
    return os.environ.get("ENABLE_JAX_PROFILER") == "1"


class ThroughputMeter:
    """Running tokens/sec + MFU estimate.

    MFU counts the FLOPs actually executed, not 6x the trainable params
    (round-1 counted only trainable params, so projector-only ALIGNMENT
    training reported an MFU off by orders of magnitude):

      forward            2 * num_params        (frozen params still run)
      activation bwd     2 * num_params        (grads flow through frozen
                                                layers down to the deepest
                                                trainable param; slight
                                                overcount for frozen
                                                towers below it)
      weight bwd         2 * num_params_trainable

    Full fine-tuning recovers the standard 6N. Rematerialized recompute is
    intentionally NOT counted (model FLOPs, PaLM convention).
    """

    def __init__(self, num_params: Optional[int] = None,
                 num_params_trainable: Optional[int] = None,
                 flops_per_token: Optional[float] = None):
        if flops_per_token is None and num_params is not None:
            if num_params_trainable is None:
                num_params_trainable = num_params
            flops_per_token = 4.0 * num_params + 2.0 * num_params_trainable
        self.flops_per_token = flops_per_token
        self.peak = device_peak_flops() * jax.device_count()
        self.reset()

    def reset(self):
        self._tokens = 0
        self._t0 = time.perf_counter()

    def update(self, tokens: int) -> Dict[str, float]:
        self._tokens += tokens
        dt = max(time.perf_counter() - self._t0, 1e-9)
        tps = self._tokens / dt
        out = {"tokens_per_sec": tps}
        if self.flops_per_token:
            out["mfu"] = tps * self.flops_per_token / self.peak
        return out
