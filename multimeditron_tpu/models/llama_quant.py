"""Weight-only int8 quantization of the Llama decoder (serving).

Per-output-channel symmetric int8 on every projection weight (q/k/v/o,
gate/up/down, lm_head). Activations, norms, rope and the embedding
gather stay bf16 — this is W8A16 in the usual taxonomy, the standard
near-lossless serving quantization (decode is weight-read bound, so
halving weight bytes ≈ halves the per-step floor; see
``ops/wo_matmul.py``). Opt-in via ``EngineConfig.quantize_llm``; the
training path never sees quantized trees.

Reference role: sglang's weight-only quantized serving
(``/root/reference/pyproject.toml`` sglang extra).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from multimeditron_tpu.models.llama import LlamaConfig

Params = Dict[str, Any]

_PROJ_KEYS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
)


def _quantize_stacked(w: jax.Array):
    """(L, K, N) stacked weights -> int8 values + (L, N) f32 scales."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2) / 127.0          # (L, N)
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(
        jnp.round(w / scale[:, None, :]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def _fuse_layers(qlayers: Params) -> Params:
    """Merge q/k/v (and gate/up) int8 tensors into single fused weights.

    Decode is weight-READ bound and the 1B-scale per-projection reads
    are small enough that XLA streams them at only ~370 GB/s
    (benchmarks/decode_ablate_8b.py --hidden 2048: 2.6 ms/step vs the
    757 GB/s the 8B-size reads reach) — one fused (D, Hq+2Hkv) read per
    layer recovers large-read streaming AND drops per-dot overhead.
    NOT used under tensor parallelism (the tp sharding rules split
    q/k/v along their own output axes)."""
    out = dict(qlayers)
    if all(k in out for k in ("q_proj_q", "k_proj_q", "v_proj_q")):
        out["qkv_q"] = jnp.concatenate(
            [out.pop("q_proj_q"), out.pop("k_proj_q"),
             out.pop("v_proj_q")], axis=-1)
        out["qkv_s"] = jnp.concatenate(
            [out.pop("q_proj_s"), out.pop("k_proj_s"),
             out.pop("v_proj_s")], axis=-1)
    if all(k in out for k in ("gate_proj_q", "up_proj_q")):
        out["gateup_q"] = jnp.concatenate(
            [out.pop("gate_proj_q"), out.pop("up_proj_q")], axis=-1)
        out["gateup_s"] = jnp.concatenate(
            [out.pop("gate_proj_s"), out.pop("up_proj_s")], axis=-1)
    return out


def quantize_llama_params(params: Params, cfg: LlamaConfig,
                          fuse: bool = True) -> Params:
    """Return a serving tree: projections as ``{key}_q``/``{key}_s``,
    ``lm_head_q``/``lm_head_s`` (built from the tied embedding when the
    model has no separate head), everything else untouched. ``fuse``
    merges qkv and gate/up into single streamed tensors (pass False
    under tensor parallelism)."""
    lp = params["layers"]
    qlayers = dict(lp)
    for key in _PROJ_KEYS:
        if key not in lp:  # e.g. Apertus' gateless MLP has no gate_proj
            continue
        q, s = _quantize_stacked(lp[key])
        qlayers[key + "_q"] = q
        qlayers[key + "_s"] = s
        del qlayers[key]
    if fuse:
        qlayers = _fuse_layers(qlayers)
    out = dict(params)
    out["layers"] = qlayers

    head = (
        params["embed_tokens"].T if cfg.tie_word_embeddings
        else params["lm_head"]
    )  # (D, V)
    hq, hs = _quantize_stacked(head[None])
    out["lm_head_q"] = hq[0]
    out["lm_head_s"] = hs[0]
    out.pop("lm_head", None)
    return out


def is_quantized(params: Params) -> bool:
    lp = params.get("layers", {})
    return "q_proj_q" in lp or "qkv_q" in lp


def init_quantized_llama_params(key: jax.Array, cfg: LlamaConfig,
                                fuse: bool = True) -> Params:
    """Random ALREADY-QUANTIZED serving tree, built on device.

    For benchmarking at 8B scale: ``init_llama_params`` +
    ``quantize_llama_params`` needs a bf16 master copy (~16 GB at 8B),
    which does not fit a 16 GB chip — this initializer emits the int8
    leaves directly (random values, per-channel scales sized so the
    dequantized weights match the fan-in-scaled init distribution), so
    the only bf16 tensors are the embedding and the norms. Tree layout
    identical to ``quantize_llama_params`` output."""
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    Dh = cfg.head_dim_
    H, Hkv = cfg.num_heads, cfg.num_kv_heads
    keys = jax.random.split(key, 10)

    def qw(k, shape, fan_in):
        q = jax.random.randint(k, shape, -127, 128, dtype=jnp.int8)
        # random int8 has std ~73; scale so dequantized std ~ fan_in^-0.5
        s = jnp.full(shape[:-2] + shape[-1:],
                     fan_in ** -0.5 / 73.0, jnp.float32)
        return q, s

    layers: Params = {
        "input_norm": jnp.ones((L, D), cfg.dtype),
        "post_attn_norm": jnp.ones((L, D), cfg.dtype),
    }
    specs = [
        ("q_proj", (L, D, H * Dh), D),
        ("k_proj", (L, D, Hkv * Dh), D),
        ("v_proj", (L, D, Hkv * Dh), D),
        ("o_proj", (L, H * Dh, D), H * Dh),
        ("up_proj", (L, D, F), D),
        ("down_proj", (L, F, D), F),
    ]
    if cfg.mlp_gate:
        specs.append(("gate_proj", (L, D, F), D))
    for (name, shape, fan), k in zip(specs, keys[:len(specs)]):
        q, s = qw(k, shape, fan)
        layers[name + "_q"] = q
        layers[name + "_s"] = s
    if fuse:
        layers = _fuse_layers(layers)

    embed = (jax.random.normal(keys[7], (cfg.vocab_size, D), jnp.float32)
             * (D ** -0.5)).astype(cfg.dtype)
    hq, hs = qw(keys[8], (1, D, cfg.vocab_size), D)
    return {
        "embed_tokens": embed,
        "layers": layers,
        "final_norm": jnp.ones((D,), cfg.dtype),
        "lm_head_q": hq[0],
        "lm_head_s": hs[0],
    }
