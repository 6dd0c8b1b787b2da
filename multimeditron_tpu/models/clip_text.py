"""Functional CLIP text encoder + full contrastive dual-encoder model.

Backbone for the expert-training subsystem (reference
``experts/train_clip.py``: HF ``VisionTextDualEncoderModel`` contrastive
fine-tuning). The text tower matches HF ``CLIPTextModel`` numerics
(learned positions, causal mask, quick_gelu, EOS pooling); the dual
encoder adds the two projections and learnable logit scale with the
symmetric InfoNCE loss.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimeditron_tpu.models.common import layer_norm
from multimeditron_tpu.models.vit import ViTConfig, _act, init_vit_params, vit_forward
from multimeditron_tpu.ops.attention import attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    intermediate_size: int = 2048
    max_positions: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    eos_token_id: int = 49407
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_dict(d: dict) -> "CLIPTextConfig":
        t = d.get("text_config", d)
        return CLIPTextConfig(
            vocab_size=t["vocab_size"],
            hidden_size=t["hidden_size"],
            num_layers=t["num_hidden_layers"],
            num_heads=t["num_attention_heads"],
            intermediate_size=t["intermediate_size"],
            max_positions=t.get("max_position_embeddings", 77),
            layer_norm_eps=t.get("layer_norm_eps", 1e-5),
            hidden_act=t.get("hidden_act", "quick_gelu"),
            eos_token_id=t.get("eos_token_id", 49407),
        )


def init_clip_text_params(key: jax.Array, cfg: CLIPTextConfig) -> Params:
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    ks = iter(jax.random.split(key, 8))

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / fan_in ** 0.5).astype(cfg.dtype)

    return {
        "token_embedding": dense(next(ks), (cfg.vocab_size, D), D),
        "position_embedding": dense(next(ks), (cfg.max_positions, D), D),
        "layers": {
            "ln1_w": jnp.ones((L, D), cfg.dtype),
            "ln1_b": jnp.zeros((L, D), cfg.dtype),
            "q_proj": dense(next(ks), (L, D, D), D),
            "q_bias": jnp.zeros((L, D), cfg.dtype),
            "k_proj": dense(next(ks), (L, D, D), D),
            "k_bias": jnp.zeros((L, D), cfg.dtype),
            "v_proj": dense(next(ks), (L, D, D), D),
            "v_bias": jnp.zeros((L, D), cfg.dtype),
            "o_proj": dense(next(ks), (L, D, D), D),
            "o_bias": jnp.zeros((L, D), cfg.dtype),
            "ln2_w": jnp.ones((L, D), cfg.dtype),
            "ln2_b": jnp.zeros((L, D), cfg.dtype),
            "fc1": dense(next(ks), (L, D, F), D),
            "fc1_bias": jnp.zeros((L, F), cfg.dtype),
            "fc2": dense(next(ks), (L, F, D), F),
            "fc2_bias": jnp.zeros((L, D), cfg.dtype),
        },
        "final_ln_w": jnp.ones((D,), cfg.dtype),
        "final_ln_b": jnp.zeros((D,), cfg.dtype),
    }


def clip_text_forward(
    params: Params,
    cfg: CLIPTextConfig,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    attn_impl=None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (last_hidden (B,S,D), pooled (B,D)): pooled = hidden at the
    EOS position (HF CLIPTextModel semantics)."""
    B, S = input_ids.shape
    D, Hn = cfg.hidden_size, cfg.num_heads
    Dh = D // Hn
    x = jnp.take(params["token_embedding"], input_ids, axis=0)
    x = x + params["position_embedding"][:S]

    kv_mask = attention_mask

    def layer(x, lp):
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        q = (h @ lp["q_proj"] + lp["q_bias"]).reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
        k = (h @ lp["k_proj"] + lp["k_bias"]).reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
        v = (h @ lp["v_proj"] + lp["v_bias"]).reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
        o = attention(q, k, v, kv_mask=kv_mask, causal=True, impl=attn_impl)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
        x = x + (o @ lp["o_proj"] + lp["o_bias"])
        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        h = _act(cfg.hidden_act, h @ lp["fc1"] + lp["fc1_bias"])
        return x + (h @ lp["fc2"] + lp["fc2_bias"]), None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    x = layer_norm(x, params["final_ln_w"], params["final_ln_b"], cfg.layer_norm_eps)

    eos_pos = jnp.argmax(
        (input_ids == cfg.eos_token_id).astype(jnp.int32)
        * jnp.arange(1, S + 1, dtype=jnp.int32)[None, :],
        axis=-1,
    )
    pooled = x[jnp.arange(B), eos_pos]
    return x, pooled


# ----------------------------------------------------------------------
# Dual encoder (CLIPModel equivalent)
# ----------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class CLIPDualConfig:
    vision: ViTConfig
    text: CLIPTextConfig
    projection_dim: int = 512
    logit_scale_init: float = 2.6592  # ln(1/0.07), HF default


def init_clip_dual_params(key: jax.Array, cfg: CLIPDualConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dtype = cfg.vision.dtype
    return {
        "vision": init_vit_params(k1, cfg.vision),
        "text": init_clip_text_params(k2, cfg.text),
        "visual_projection": (
            jax.random.normal(k3, (cfg.vision.hidden_size, cfg.projection_dim), jnp.float32)
            * cfg.vision.hidden_size ** -0.5
        ).astype(dtype),
        "text_projection": (
            jax.random.normal(k4, (cfg.text.hidden_size, cfg.projection_dim), jnp.float32)
            * cfg.text.hidden_size ** -0.5
        ).astype(dtype),
        "logit_scale": jnp.asarray(cfg.logit_scale_init, jnp.float32),
    }


def clip_dual_forward(
    params: Params,
    cfg: CLIPDualConfig,
    pixel_values: jax.Array,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Returns dict with image_embeds, text_embeds (normalized) and
    logits_per_image/text (HF CLIPModel contract)."""
    vision_out = vit_forward(params["vision"], cfg.vision, pixel_values, drop_cls=False)
    # HF CLIPModel pools the CLS token THROUGH post_layernorm.
    cls = vision_out[:, 0]
    cls = layer_norm(
        cls, params["vision"]["post_ln_w"], params["vision"]["post_ln_b"],
        cfg.vision.layer_norm_eps,
    )
    image_embeds = cls @ params["visual_projection"]

    _, pooled_text = clip_text_forward(
        params["text"], cfg.text, input_ids, attention_mask
    )
    text_embeds = pooled_text @ params["text_projection"]

    image_embeds = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    text_embeds = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    logits_per_text = (text_embeds @ image_embeds.T).astype(jnp.float32) * scale
    return {
        "image_embeds": image_embeds,
        "text_embeds": text_embeds,
        "logits_per_text": logits_per_text,
        "logits_per_image": logits_per_text.T,
    }


def clip_contrastive_loss(logits_per_text: jax.Array) -> jax.Array:
    """Symmetric InfoNCE (HF ``clip_loss``)."""
    n = logits_per_text.shape[0]
    labels = jnp.arange(n)
    logp_t = jax.nn.log_softmax(logits_per_text, axis=-1)
    logp_i = jax.nn.log_softmax(logits_per_text.T, axis=-1)
    loss_t = -jnp.mean(logp_t[labels, labels])
    loss_i = -jnp.mean(logp_i[labels, labels])
    return (loss_t + loss_i) / 2.0


def clip_text_params_from_state_dict(state, cfg, prefix="text_model.", dtype=None) -> Params:
    from multimeditron_tpu.models.hf_import import _np

    dtype = dtype or cfg.dtype
    g = lambda k: _np(state[prefix + k])
    t = lambda w: np.ascontiguousarray(w.T)
    ident = lambda w: w
    L = cfg.num_layers

    def stack(fmt, transform):
        return jnp.asarray(
            np.stack([transform(g(fmt.format(i))) for i in range(L)]), dtype=dtype
        )

    return {
        "token_embedding": jnp.asarray(g("embeddings.token_embedding.weight"), dtype),
        "position_embedding": jnp.asarray(
            g("embeddings.position_embedding.weight"), dtype
        ),
        "layers": {
            "ln1_w": stack("encoder.layers.{}.layer_norm1.weight", ident),
            "ln1_b": stack("encoder.layers.{}.layer_norm1.bias", ident),
            "q_proj": stack("encoder.layers.{}.self_attn.q_proj.weight", t),
            "q_bias": stack("encoder.layers.{}.self_attn.q_proj.bias", ident),
            "k_proj": stack("encoder.layers.{}.self_attn.k_proj.weight", t),
            "k_bias": stack("encoder.layers.{}.self_attn.k_proj.bias", ident),
            "v_proj": stack("encoder.layers.{}.self_attn.v_proj.weight", t),
            "v_bias": stack("encoder.layers.{}.self_attn.v_proj.bias", ident),
            "o_proj": stack("encoder.layers.{}.self_attn.out_proj.weight", t),
            "o_bias": stack("encoder.layers.{}.self_attn.out_proj.bias", ident),
            "ln2_w": stack("encoder.layers.{}.layer_norm2.weight", ident),
            "ln2_b": stack("encoder.layers.{}.layer_norm2.bias", ident),
            "fc1": stack("encoder.layers.{}.mlp.fc1.weight", t),
            "fc1_bias": stack("encoder.layers.{}.mlp.fc1.bias", ident),
            "fc2": stack("encoder.layers.{}.mlp.fc2.weight", t),
            "fc2_bias": stack("encoder.layers.{}.mlp.fc2.bias", ident),
        },
        "final_ln_w": jnp.asarray(g("final_layer_norm.weight"), dtype),
        "final_ln_b": jnp.asarray(g("final_layer_norm.bias"), dtype),
    }
