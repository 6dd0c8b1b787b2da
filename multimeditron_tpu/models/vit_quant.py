"""W8A8 int8 inference path for the ViT towers.

The v5e MXU doubles throughput at int8 (measured 216 vs 136 TFLOP/s at
8192^3); with per-output-channel weight scales and dynamic per-row
activation scales the ViT-L/14 encode runs ~12% faster end-to-end at
cosine similarity >= 0.999 vs bf16 (the dynamic-quant reduce eats part of
the MXU gain at D=1024 shapes — static calibrated scales are the next
step). Opt-in: quantize once, serve many.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from multimeditron_tpu.models.common import layer_norm
from multimeditron_tpu.models.vit import ViTConfig, _act, patchify
from multimeditron_tpu.ops.attention import attention
from multimeditron_tpu.ops.encoder_attention import encoder_attention

Params = Dict[str, Any]

_QUANT_KEYS = ("q_proj", "k_proj", "v_proj", "o_proj", "fc1", "fc2")


def _quantize_weight(w: jax.Array):
    """(in, out) weight -> int8 values + per-output-channel f32 scales."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_vit_params(params: Params) -> Params:
    """Quantize the layer matmul weights; everything else stays as-is."""
    lp = params["layers"]
    qlayers = dict(lp)
    for key in _QUANT_KEYS:
        stacked = lp[key]
        qs = [_quantize_weight(stacked[i]) for i in range(stacked.shape[0])]
        qlayers[key + "_q"] = jnp.stack([q for q, _ in qs])
        qlayers[key + "_s"] = jnp.stack([s for _, s in qs])
        del qlayers[key]
    out = dict(params)
    out["layers"] = qlayers
    return out


def _quantize_act(x: jax.Array, xs=None):
    """Quantize activations once; reuse the (xq, xs) pair across every
    matmul that consumes the same tensor (q/k/v share their LN input)."""
    xf = x.astype(jnp.float32)
    if xs is None:
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def _qdot_pre(xq: jax.Array, xs, wq: jax.Array, ws: jax.Array,
              out_dtype=jnp.bfloat16) -> jax.Array:
    """int8 MXU matmul on a pre-quantized activation."""
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * xs * ws).astype(out_dtype)


def _qdot(x: jax.Array, wq: jax.Array, ws: jax.Array, xs=None) -> jax.Array:
    """int8 MXU matmul with dynamic per-row (xs=None) or STATIC calibrated
    per-tensor activation scales (xs scalar; ~15% faster, skips the
    per-row max reduce)."""
    xq, xs = _quantize_act(x, xs)
    return _qdot_pre(xq, xs, wq, ws, out_dtype=x.dtype)


def vit_forward_int8(
    qparams: Params,
    cfg: ViTConfig,
    pixel_values: jax.Array,
    attn_impl=None,
    drop_cls: bool = True,
    act_scales: Optional[jax.Array] = None,  # (L, 4) calibrated; None = dynamic
) -> jax.Array:
    """int8 twin of :func:`multimeditron_tpu.models.vit.vit_forward`."""
    B = pixel_values.shape[0]
    D, Hn = cfg.hidden_size, cfg.num_heads
    Dh = D // Hn

    x = patchify(pixel_values.astype(cfg.dtype), cfg.patch_size) @ qparams["patch_proj"]
    if cfg.patch_bias:
        x = x + qparams["patch_bias"]
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(qparams["cls_token"], (B, 1, D)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
    x = x + qparams["position_embedding"]
    if cfg.use_pre_layernorm:
        x = layer_norm(x, qparams["pre_ln_w"], qparams["pre_ln_b"], cfg.layer_norm_eps)

    S = x.shape[1]

    def layer(x, inputs):
        lp, sc = inputs
        s0 = sc[0] if sc is not None else None
        s1 = sc[1] if sc is not None else None
        s2 = sc[2] if sc is not None else None
        s3 = sc[3] if sc is not None else None
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        # Quantize the shared LN output ONCE for q/k/v (was 3x before).
        hq, hs = _quantize_act(h, s0)
        q = _qdot_pre(hq, hs, lp["q_proj_q"], lp["q_proj_s"], x.dtype) + lp["q_bias"]
        k = _qdot_pre(hq, hs, lp["k_proj_q"], lp["k_proj_s"], x.dtype) + lp["k_bias"]
        v = _qdot_pre(hq, hs, lp["v_proj_q"], lp["v_proj_s"], x.dtype) + lp["v_bias"]
        # Fused VMEM-resident encoder attention in model layout (B, S, H*Dh):
        # no head split/merge transposes, scores never reach HBM.
        o = encoder_attention(q, k, v, Hn)
        x = x + _qdot(o, lp["o_proj_q"], lp["o_proj_s"], s1) + lp["o_bias"]
        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        h = _act(cfg.hidden_act, _qdot(h, lp["fc1_q"], lp["fc1_s"], s2) + lp["fc1_bias"])
        return x + _qdot(h, lp["fc2_q"], lp["fc2_s"], s3) + lp["fc2_bias"], None

    x, _ = jax.lax.scan(layer, x, (qparams["layers"], act_scales))

    if cfg.post_layernorm_output:
        x = layer_norm(x, qparams["post_ln_w"], qparams["post_ln_b"], cfg.layer_norm_eps)
    if cfg.use_cls_token and drop_cls:
        x = x[:, 1:, :]
    return x


def calibrate_act_scales(
    params: Params,
    cfg: ViTConfig,
    pixel_values: jax.Array,
    margin: float = 1.1,
) -> jax.Array:
    """Run a bf16 forward over a calibration batch recording per-layer max
    |activation| at the four quantized-matmul inputs (ln1 out, attention
    out, ln2 out, gelu out). Returns (L, 4) static scales for
    :func:`vit_forward_int8` (SmoothQuant-style static W8A8)."""
    B = pixel_values.shape[0]
    D, Hn = cfg.hidden_size, cfg.num_heads
    Dh = D // Hn

    x = patchify(pixel_values.astype(cfg.dtype), cfg.patch_size) @ params["patch_proj"]
    if cfg.patch_bias:
        x = x + params["patch_bias"]
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls_token"], (B, 1, D)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"]
    if cfg.use_pre_layernorm:
        x = layer_norm(x, params["pre_ln_w"], params["pre_ln_b"], cfg.layer_norm_eps)
    S = x.shape[1]

    def amax(h):
        return jnp.max(jnp.abs(h.astype(jnp.float32)))

    def layer(x, lp):
        h1 = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        q = (h1 @ lp["q_proj"] + lp["q_bias"]).reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
        k = (h1 @ lp["k_proj"] + lp["k_bias"]).reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
        v = (h1 @ lp["v_proj"] + lp["v_bias"]).reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
        o = attention(q, k, v, causal=False)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
        x = x + (o @ lp["o_proj"] + lp["o_bias"])
        h2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        g = _act(cfg.hidden_act, h2 @ lp["fc1"] + lp["fc1_bias"])
        x = x + (g @ lp["fc2"] + lp["fc2_bias"])
        stats = jnp.stack([amax(h1), amax(o), amax(h2), amax(g)])
        return x, stats

    _, stats = jax.lax.scan(layer, x, params["layers"])
    return jnp.maximum(stats * margin / 127.0, 1e-8)  # (L, 4)
