"""Device mesh construction.

The reference's distributed substrate is torchrun + NCCL + DeepSpeed ZeRO-3
(SURVEY.md §2.2). The TPU-native replacement is a single logical program
under GSPMD: a ``jax.sharding.Mesh`` with axes

  dp    — pure data parallel (inter-slice / DCN friendly)
  fsdp  — data parallel with parameter/optimizer sharding (ZeRO-3
          equivalent; rides ICI)
  tp    — tensor parallel (Megatron-style head/ffn sharding; innermost,
          fastest ICI axis)
  sp    — sequence parallel (DeepSpeed-Ulysses style: activations shard
          along the sequence outside attention, along heads inside it;
          XLA inserts the all-to-alls — set
          ``LlamaConfig.sequence_parallel`` to emit the constraints)
  ep    — expert parallel (MoE vision-expert stacks shard their leading
          expert axis)
  pp    — pipeline parallel (GPipe schedule over the decoder layer stack,
          ``parallel/pipeline.py``; stage-to-stage ppermute hops — outer
          axis, tolerates the slowest links)

Collectives are compiler-inserted (psum / all-gather / reduce-scatter /
all-to-all) — there is no NCCL analogue to manage. ``sp``/``ep``/``pp``
default to size 1, so three-axis callers are unaffected.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

MESH_AXES = ("pp", "dp", "fsdp", "tp", "sp", "ep")


def make_mesh(
    dp: Optional[int] = None,
    fsdp: Optional[int] = None,
    tp: int = 1,
    sp: int = 1,
    ep: int = 1,
    pp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (pp, dp, fsdp, tp, sp, ep) mesh over the available devices.

    Unspecified axes are inferred: tp/sp/ep/pp default to 1, fsdp soaks up
    the remaining devices, dp defaults to 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    rest = tp * sp * ep * pp
    if fsdp is None and dp is None:
        dp, fsdp = 1, n // rest
    elif fsdp is None:
        fsdp = n // (dp * rest)
    elif dp is None:
        dp = n // (fsdp * rest)
    need = dp * fsdp * rest
    if need > n:
        raise ValueError(
            f"Mesh pp{pp}x{dp}x{fsdp}x{tp}x{sp}x{ep} needs {need} devices, have {n}"
        )
    arr = np.asarray(devices[:need]).reshape(pp, dp, fsdp, tp, sp, ep)
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
