"""Shared functional building blocks: norms, rotary embeddings, losses.

All model code in this framework is pure functions over parameter pytrees —
the TPU-idiomatic equivalent of the reference's torch ``nn.Module`` stack.
Computations that affect numerics (norms, softmax, loss) run in float32
regardless of the bf16 parameter dtype.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from multimeditron_tpu.constants import IGNORE_TOKEN_INDEX


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: Optional[jax.Array], eps: float = 1e-5
) -> jax.Array:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    x = x * weight.astype(jnp.float32)
    if bias is not None:
        x = x + bias.astype(jnp.float32)
    return x.astype(dtype)


# ----------------------------------------------------------------------
# Rotary position embeddings
# ----------------------------------------------------------------------
def rope_frequencies(
    head_dim: int,
    theta: float = 10000.0,
    scaling: Optional[dict] = None,
) -> jax.Array:
    """Inverse frequencies, with optional llama3-style NTK scaling
    (matches HF ``rope_scaling={"rope_type": "llama3", ...}`` numerics so
    imported Llama-3.1/3.2 checkpoints reproduce reference logits)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if scaling and scaling.get("rope_type", scaling.get("type")) == "llama3":
        factor = scaling["factor"]
        low_factor = scaling["low_freq_factor"]
        high_factor = scaling["high_freq_factor"]
        old_len = scaling["original_max_position_embeddings"]
        low_wavelen = old_len / low_factor
        high_wavelen = old_len / high_factor
        wavelen = 2 * math.pi / inv_freq
        scaled = inv_freq / factor
        smooth = (old_len / wavelen - low_factor) / (high_factor - low_factor)
        smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
        inv_freq = jnp.where(
            wavelen < high_wavelen,
            inv_freq,
            jnp.where(wavelen > low_wavelen, scaled, smoothed),
        )
    return inv_freq


def apply_rope(
    x: jax.Array,
    position_ids: jax.Array,
    inv_freq: jax.Array,
) -> jax.Array:
    """Rotate (B, H, S, D) by positions (B, S) — HF half-split convention.

    When ``position_ids`` is (B, S, 2) the head dim is split in half and each
    half rotates with its own position channel — the TPU-native realization
    of the reference collator's 2-D position ids for image patches
    (``model/data_loader.py:159-188``).
    """
    B, H, S, D = x.shape
    x_f32 = x.astype(jnp.float32)

    def rotate(block: jax.Array, pos: jax.Array, freqs: jax.Array) -> jax.Array:
        # block: (B,H,S,d); pos: (B,S); freqs: (d//2,)
        angles = pos.astype(jnp.float32)[:, None, :, None] * freqs  # (B,1,S,d/2)
        cos = jnp.cos(angles)
        sin = jnp.sin(angles)
        d_half = block.shape[-1] // 2
        x1, x2 = block[..., :d_half], block[..., d_half:]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        )

    if position_ids.ndim == 2:
        out = rotate(x_f32, position_ids, inv_freq)
    elif position_ids.ndim == 3 and position_ids.shape[-1] == 2:
        d_half = D // 2
        freqs_half = inv_freq[: d_half // 2] * 2.0  # keep wavelength coverage
        out = jnp.concatenate(
            [
                rotate(x_f32[..., :d_half], position_ids[..., 0], freqs_half),
                rotate(x_f32[..., d_half:], position_ids[..., 1], freqs_half),
            ],
            axis=-1,
        )
    else:
        raise ValueError(f"position_ids must be (B,S) or (B,S,2), got {position_ids.shape}")
    return out.astype(x.dtype)


# ----------------------------------------------------------------------
# Losses
# ----------------------------------------------------------------------
def cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    ignore_index: int = IGNORE_TOKEN_INDEX,
) -> jax.Array:
    """Mean next-token CE over non-ignored positions.

    Expects logits (B, S, V) and labels (B, S); performs the causal shift
    internally (predict labels[t+1] from logits[t]) like the HF causal-LM
    loss the reference delegates to (``model/model.py:517-526``).
    """
    logits = logits[:, :-1, :].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(
        logits, safe_targets[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    nll = (logz - picked) * valid
    count = jnp.maximum(valid.sum(), 1)
    return nll.sum() / count


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def xielu(
    x: jax.Array,
    alpha_p: jax.Array,
    alpha_n: jax.Array,
    beta: float = 0.5,
    eps: float = -1e-6,
) -> jax.Array:
    """xIELU activation (arXiv:2411.13010) as used by Apertus' gateless MLP.

    Matches HF transformers' ``XIELUActivation`` python path
    (``activations.py``): the learnable per-MLP scalars ``alpha_p`` /
    ``alpha_n`` are stored in the softplus-inverse domain; ``beta`` and
    ``eps`` are fixed buffers.

        x > 0:  softplus(alpha_p) * x^2 + beta * x
        x <= 0: (expm1(min(x, eps)) - x) * (beta + softplus(alpha_n)) + beta * x
    """
    x = x.astype(jnp.float32)
    ap = jax.nn.softplus(alpha_p.astype(jnp.float32)).reshape(())
    an = beta + jax.nn.softplus(alpha_n.astype(jnp.float32)).reshape(())
    return jnp.where(
        x > 0,
        ap * x * x + beta * x,
        (jnp.expm1(jnp.minimum(x, eps)) - x) * an + beta * x,
    )
