"""Functional ViT vision towers (CLIP / SigLIP / BiomedCLIP-style).

TPU-native replacement for the HF CLIP vision towers the reference wraps
(``model/modalities/image_modality.py:124-133``). Patchify is a reshape +
matmul (MXU) rather than a conv; layers are stacked and scanned; attention
goes through the shared flash/XLA dispatcher (non-causal).

Output contract matches the reference embedder: ``last_hidden_state``
patch tokens with the CLS token dropped for CLIP
(``image_modality.py:133``), all patches for SigLIP.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from multimeditron_tpu.models.common import layer_norm
from multimeditron_tpu.ops.attention import attention
from multimeditron_tpu.ops.encoder_attention import encoder_attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"  # clip: quick_gelu; siglip: gelu_pytorch_tanh
    use_cls_token: bool = True      # clip: True; siglip: False
    use_pre_layernorm: bool = True  # clip: True; siglip: False
    post_layernorm_output: bool = False  # siglip normalizes last_hidden_state
    patch_bias: bool = False        # clip: False; siglip: True
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.use_cls_token else 0)

    @staticmethod
    def clip_from_hf_dict(d: dict) -> "ViTConfig":
        v = d.get("vision_config", d)
        return ViTConfig(
            image_size=v["image_size"],
            patch_size=v["patch_size"],
            hidden_size=v["hidden_size"],
            num_layers=v["num_hidden_layers"],
            num_heads=v["num_attention_heads"],
            intermediate_size=v["intermediate_size"],
            layer_norm_eps=v.get("layer_norm_eps", 1e-5),
            hidden_act=v.get("hidden_act", "quick_gelu"),
            use_cls_token=True,
            use_pre_layernorm=True,
            post_layernorm_output=False,
            patch_bias=False,
        )

    @staticmethod
    def siglip_from_hf_dict(d: dict) -> "ViTConfig":
        v = d.get("vision_config", d)
        return ViTConfig(
            image_size=v["image_size"],
            patch_size=v["patch_size"],
            hidden_size=v["hidden_size"],
            num_layers=v["num_hidden_layers"],
            num_heads=v["num_attention_heads"],
            intermediate_size=v["intermediate_size"],
            layer_norm_eps=v.get("layer_norm_eps", 1e-6),
            hidden_act=v.get("hidden_act", "gelu_pytorch_tanh"),
            use_cls_token=False,
            use_pre_layernorm=False,
            post_layernorm_output=True,
            patch_bias=True,
        )


def _act(name: str, x: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32)
    if name == "quick_gelu":
        y = x32 * jax.nn.sigmoid(1.702 * x32)
    elif name in ("gelu_pytorch_tanh", "gelu_new"):
        y = jax.nn.gelu(x32, approximate=True)
    elif name == "gelu":
        y = jax.nn.gelu(x32, approximate=False)
    else:
        raise ValueError(f"Unknown activation {name!r}")
    return y.astype(x.dtype)


# ----------------------------------------------------------------------
# Init
# ----------------------------------------------------------------------
def init_vit_params(key: jax.Array, cfg: ViTConfig) -> Params:
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    P = cfg.patch_size
    keys = jax.random.split(key, 10)

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / (fan_in ** 0.5)).astype(
            cfg.dtype
        )

    params: Params = {
        "patch_proj": dense(keys[0], (P * P * 3, D), P * P * 3),
        "position_embedding": dense(keys[1], (cfg.seq_len, D), D),
        "layers": {
            "ln1_w": jnp.ones((L, D), cfg.dtype),
            "ln1_b": jnp.zeros((L, D), cfg.dtype),
            "q_proj": dense(keys[2], (L, D, D), D),
            "q_bias": jnp.zeros((L, D), cfg.dtype),
            "k_proj": dense(keys[3], (L, D, D), D),
            "k_bias": jnp.zeros((L, D), cfg.dtype),
            "v_proj": dense(keys[4], (L, D, D), D),
            "v_bias": jnp.zeros((L, D), cfg.dtype),
            "o_proj": dense(keys[5], (L, D, D), D),
            "o_bias": jnp.zeros((L, D), cfg.dtype),
            "ln2_w": jnp.ones((L, D), cfg.dtype),
            "ln2_b": jnp.zeros((L, D), cfg.dtype),
            "fc1": dense(keys[6], (L, D, F), D),
            "fc1_bias": jnp.zeros((L, F), cfg.dtype),
            "fc2": dense(keys[7], (L, F, D), F),
            "fc2_bias": jnp.zeros((L, D), cfg.dtype),
        },
        "post_ln_w": jnp.ones((D,), cfg.dtype),
        "post_ln_b": jnp.zeros((D,), cfg.dtype),
    }
    if cfg.patch_bias:
        params["patch_bias"] = jnp.zeros((D,), cfg.dtype)
    if cfg.use_cls_token:
        params["cls_token"] = dense(keys[8], (D,), D)
    if cfg.use_pre_layernorm:
        params["pre_ln_w"] = jnp.ones((D,), cfg.dtype)
        params["pre_ln_b"] = jnp.zeros((D,), cfg.dtype)
    return params


# ----------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------
def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, 3) NHWC -> (B, N, P*P*3) patch vectors (MXU-friendly)."""
    B, H, W, C = images.shape
    P = patch_size
    x = images.reshape(B, H // P, P, W // P, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H/P, W/P, P, P, C)
    return x.reshape(B, (H // P) * (W // P), P * P * C)


def vit_forward(
    params: Params,
    cfg: ViTConfig,
    pixel_values: jax.Array,
    attn_impl: Optional[str] = None,
    drop_cls: bool = True,
    remat: bool = False,
) -> jax.Array:
    """Encode NHWC pixel_values -> (B, N[, +1], D) hidden states.

    ``drop_cls`` reproduces the reference's ``last_hidden_state[:, 1:, :]``
    (``image_modality.py:133``); it is a no-op for CLS-less towers.
    """
    B = pixel_values.shape[0]
    D, Hn = cfg.hidden_size, cfg.num_heads
    Dh = D // Hn

    patches = patchify(pixel_values.astype(cfg.dtype), cfg.patch_size)
    x = patches @ params["patch_proj"]
    if cfg.patch_bias:
        x = x + params["patch_bias"]
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls_token"], (B, 1, D)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"]

    if cfg.use_pre_layernorm:
        x = layer_norm(x, params["pre_ln_w"], params["pre_ln_b"], cfg.layer_norm_eps)

    S = x.shape[1]

    def layer(x, lp):
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        q = h @ lp["q_proj"] + lp["q_bias"]
        k = h @ lp["k_proj"] + lp["k_bias"]
        v = h @ lp["v_proj"] + lp["v_bias"]
        if attn_impl is None:
            # Fused encoder attention in model layout: no head transposes,
            # (S, S) scores stay in VMEM (ops/encoder_attention.py).
            o = encoder_attention(q, k, v, Hn)
        else:
            qh = q.reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
            kh = k.reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
            vh = v.reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
            o = attention(qh, kh, vh, causal=False, impl=attn_impl)
            o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
        x = x + (o @ lp["o_proj"] + lp["o_bias"])

        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        h = _act(cfg.hidden_act, h @ lp["fc1"] + lp["fc1_bias"])
        x = x + (h @ lp["fc2"] + lp["fc2_bias"])
        # Pin the residual dtype: mixed-precision params (e.g. the f32
        # tensors smooth_vit_params folds) must not widen the scan carry.
        return x.astype(cfg.dtype), None

    body = jax.checkpoint(layer) if remat else layer
    x, _ = jax.lax.scan(body, x, params["layers"])

    if cfg.post_layernorm_output:
        x = layer_norm(x, params["post_ln_w"], params["post_ln_b"], cfg.layer_norm_eps)

    if cfg.use_cls_token and drop_cls:
        x = x[:, 1:, :]
    return x
