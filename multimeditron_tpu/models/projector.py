"""Modality -> LLM embedding-space projectors.

Parity with the reference ``MLPProjector`` (``model/projectors/mlp.py:33-39``):
Linear(m, m) -> GELU -> Linear(m, H) -> GELU -> Linear(H, H), biased,
exact (erf) GELU. A registry hook keeps ``projection_type: mlp`` extensible
like the reference's ``projection_type`` config field.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from multimeditron_tpu.models.common import gelu

Params = Dict[str, Any]


def init_mlp_projector(
    key: jax.Array, modality_size: int, projected_size: int, dtype=jnp.bfloat16
) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)

    def dense(k, fan_in, fan_out):
        w = jax.random.normal(k, (fan_in, fan_out), jnp.float32) * (fan_in ** -0.5)
        return w.astype(dtype)

    return {
        "fc1": dense(k1, modality_size, modality_size),
        "b1": jnp.zeros((modality_size,), dtype),
        "fc2": dense(k2, modality_size, projected_size),
        "b2": jnp.zeros((projected_size,), dtype),
        "fc3": dense(k3, projected_size, projected_size),
        "b3": jnp.zeros((projected_size,), dtype),
    }


def mlp_projector_forward(params: Params, x: jax.Array) -> jax.Array:
    x = gelu(x @ params["fc1"] + params["b1"])
    x = gelu(x @ params["fc2"] + params["b2"])
    return x @ params["fc3"] + params["b3"]


def quantize_mlp_projector(params: Params) -> Params:
    """W8A8 serving twin of the projector (per-output-channel weight scales,
    dynamic per-row activation scales). fc3 (H x H) holds ~75% of the
    projector FLOPs for the CLIP-L -> 4096 config; int8 doubles its MXU rate."""
    from multimeditron_tpu.models.vit_quant import _quantize_weight

    out = dict(params)
    for key in ("fc1", "fc2", "fc3"):
        qv, qs = _quantize_weight(params[key])
        out[key + "_q"] = qv
        out[key + "_s"] = qs
        del out[key]
    return out


def mlp_projector_forward_int8(qparams: Params, x: jax.Array) -> jax.Array:
    from multimeditron_tpu.models.vit_quant import _qdot

    x = gelu(_qdot(x, qparams["fc1_q"], qparams["fc1_s"]) + qparams["b1"])
    x = gelu(_qdot(x, qparams["fc2_q"], qparams["fc2_s"]) + qparams["b2"])
    return _qdot(x, qparams["fc3_q"], qparams["fc3_s"]) + qparams["b3"]
