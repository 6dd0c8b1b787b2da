"""Device mesh construction.

The reference's distributed substrate is torchrun + NCCL + DeepSpeed ZeRO-3
(SURVEY.md §2.2). The TPU-native replacement is a single logical program
under GSPMD: a ``jax.sharding.Mesh`` with axes

  dp    — pure data parallel (inter-slice / DCN friendly)
  fsdp  — data parallel with parameter/optimizer sharding (ZeRO-3
          equivalent; rides ICI)
  tp    — tensor parallel (Megatron-style head/ffn sharding; innermost,
          fastest ICI axis)

Collectives are compiler-inserted (psum / all-gather / reduce-scatter) —
there is no NCCL analogue to manage.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

MESH_AXES = ("dp", "fsdp", "tp")


def make_mesh(
    dp: Optional[int] = None,
    fsdp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, fsdp, tp) mesh over the available devices.

    Unspecified axes are inferred: tp defaults to 1, fsdp soaks up the
    remaining devices, dp defaults to 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if fsdp is None and dp is None:
        dp, fsdp = 1, n // tp
    elif fsdp is None:
        fsdp = n // (dp * tp)
    elif dp is None:
        dp = n // (fsdp * tp)
    need = dp * fsdp * tp
    if need > n:
        raise ValueError(f"Mesh {dp}x{fsdp}x{tp} needs {need} devices, have {n}")
    arr = np.asarray(devices[:need]).reshape(dp, fsdp, tp)
    return Mesh(arr, MESH_AXES)


def multihost_initialize() -> None:
    """Initialize jax.distributed for multi-host meshes.

    Only runs when a coordinator is explicitly configured (env
    JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS) — auto-detection can
    BLOCK waiting for peers on single-host machines that carry cluster-ish
    env vars. Safe no-op otherwise."""
    import os

    if not (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    ):
        return
    import jax.distributed

    try:
        jax.distributed.initialize()
    except Exception:
        pass
