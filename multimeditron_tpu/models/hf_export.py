"""HF-format export: our functional pytrees -> reference-loadable
checkpoints.

Checkpoint output fidelity with the reference's HF serialization is an
explicit parity goal (``model/model.py:152-202`` nested modality configs;
BASELINE.json north star). The exported directory contains:

- ``config.json``: ``model_type: multimodal`` with the nested modality
  config list, like ``MultimodalConfig.to_dict`` (``model.py:164-167``);
- ``model.safetensors``: bf16 tensors under the REFERENCE's module paths —
  the LLM as ``model.<hf llama keys>`` (the reference stores the HF causal
  LM under attribute ``model``), each modality as
  ``modalities_with_projection.<i>.feature_extractor.vision_model.*`` +
  ``modalities_with_projection.<i>.projector.projection.{0,2,4}.*``
  (reference ``ImageModality`` fields, ``image_modality.py:124-128``).

Export goes through ``safetensors.flax`` so bf16 round-trips without a
torch dependency.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _t(w: jax.Array) -> jax.Array:
    """(in, out) -> HF nn.Linear (out, in)."""
    return w.T


def llama_state_dict(params: Params, cfg, prefix: str = "model.") -> Dict[str, jax.Array]:
    """Our stacked llama pytree -> flat HF LlamaForCausalLM key space."""
    sd: Dict[str, jax.Array] = {}
    sd[f"{prefix}model.embed_tokens.weight"] = params["embed_tokens"]
    L = cfg.num_layers
    layer_map = {
        "input_norm": ("input_layernorm.weight", False),
        "q_proj": ("self_attn.q_proj.weight", True),
        "k_proj": ("self_attn.k_proj.weight", True),
        "v_proj": ("self_attn.v_proj.weight", True),
        "o_proj": ("self_attn.o_proj.weight", True),
        "post_attn_norm": ("post_attention_layernorm.weight", False),
        "gate_proj": ("mlp.gate_proj.weight", True),
        "up_proj": ("mlp.up_proj.weight", True),
        "down_proj": ("mlp.down_proj.weight", True),
        "q_norm": ("self_attn.q_norm.weight", False),
        "k_norm": ("self_attn.k_norm.weight", False),
    }
    for ours, (theirs, transpose) in layer_map.items():
        if ours not in params["layers"]:
            continue
        stacked = params["layers"][ours]
        for i in range(L):
            w = stacked[i]
            sd[f"{prefix}model.layers.{i}.{theirs}"] = _t(w) if transpose else w
    sd[f"{prefix}model.norm.weight"] = params["final_norm"]
    if "lm_head" in params:
        sd[f"{prefix}lm_head.weight"] = _t(params["lm_head"])
    return sd


def vit_state_dict(
    params: Params, cfg, prefix: str = "vision_model."
) -> Dict[str, jax.Array]:
    """Our ViT pytree -> flat HF CLIPVisionModel/SiglipVisionModel keys."""
    sd: Dict[str, jax.Array] = {}
    D = cfg.hidden_size
    P = cfg.patch_size
    # (P*P*3, D) -> conv (D, 3, P, P); inverse of hf_import's relayout
    patch = params["patch_proj"].reshape(P, P, 3, D).transpose(3, 2, 0, 1)
    sd[f"{prefix}embeddings.patch_embedding.weight"] = patch
    if cfg.patch_bias:
        sd[f"{prefix}embeddings.patch_embedding.bias"] = params["patch_bias"]
    sd[f"{prefix}embeddings.position_embedding.weight"] = params["position_embedding"]
    if cfg.use_cls_token:
        sd[f"{prefix}embeddings.class_embedding"] = params["cls_token"]
    if cfg.use_pre_layernorm:
        sd[f"{prefix}pre_layrnorm.weight"] = params["pre_ln_w"]
        sd[f"{prefix}pre_layrnorm.bias"] = params["pre_ln_b"]
    sd[f"{prefix}post_layernorm.weight"] = params["post_ln_w"]
    sd[f"{prefix}post_layernorm.bias"] = params["post_ln_b"]

    layer_map = {
        "ln1_w": ("layer_norm1.weight", False),
        "ln1_b": ("layer_norm1.bias", False),
        "q_proj": ("self_attn.q_proj.weight", True),
        "q_bias": ("self_attn.q_proj.bias", False),
        "k_proj": ("self_attn.k_proj.weight", True),
        "k_bias": ("self_attn.k_proj.bias", False),
        "v_proj": ("self_attn.v_proj.weight", True),
        "v_bias": ("self_attn.v_proj.bias", False),
        "o_proj": ("self_attn.out_proj.weight", True),
        "o_bias": ("self_attn.out_proj.bias", False),
        "ln2_w": ("layer_norm2.weight", False),
        "ln2_b": ("layer_norm2.bias", False),
        "fc1": ("mlp.fc1.weight", True),
        "fc1_bias": ("mlp.fc1.bias", False),
        "fc2": ("mlp.fc2.weight", True),
        "fc2_bias": ("mlp.fc2.bias", False),
    }
    for ours, (theirs, transpose) in layer_map.items():
        stacked = params["layers"][ours]
        for i in range(cfg.num_layers):
            w = stacked[i]
            sd[f"{prefix}encoder.layers.{i}.{theirs}"] = _t(w) if transpose else w
    return sd


def projector_state_dict(params: Params, prefix: str) -> Dict[str, jax.Array]:
    """MLPProjector -> reference ``projector.projection.{0,2,4}`` keys
    (``model/projectors/mlp.py:33-39``)."""
    return {
        f"{prefix}projection.0.weight": _t(params["fc1"]),
        f"{prefix}projection.0.bias": params["b1"],
        f"{prefix}projection.2.weight": _t(params["fc2"]),
        f"{prefix}projection.2.bias": params["b2"],
        f"{prefix}projection.4.weight": _t(params["fc3"]),
        f"{prefix}projection.4.bias": params["b3"],
    }


def export_multimodal(model, params: Params, out_dir: str, dtype=jnp.bfloat16) -> None:
    """Write config.json + model.safetensors in the reference's layout."""
    from safetensors.flax import save_file

    os.makedirs(out_dir, exist_ok=True)
    sd: Dict[str, jax.Array] = {}
    sd.update(llama_state_dict(params["llm"], model.config.llm, prefix="model."))
    for i, (mtype, mod) in enumerate(model.modalities.items()):
        mp = params["modalities"][mtype]
        base = f"modalities_with_projection.{i}."
        sd.update(
            vit_state_dict(
                mp["embedder"], mod.vit_cfg,
                prefix=f"{base}feature_extractor.vision_model.",
            )
        )
        sd.update(projector_state_dict(mp["projector"], prefix=f"{base}projector."))

    sd = {k: jnp.asarray(v, dtype) for k, v in sd.items()}
    save_file(sd, os.path.join(out_dir, "model.safetensors"))

    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(model.config.to_dict(), f, indent=2)


def import_multimodal(path: str):
    """Load an exported (or reference-produced) multimodal checkpoint dir
    back into (MultimodalModel, params)."""
    from multimeditron_tpu.models.hf_import import (
        llama_params_from_state_dict,
        load_hf_state_dict,
        vit_params_from_state_dict,
    )
    from multimeditron_tpu.models.multimodal import MultimodalConfig, MultimodalModel

    with open(os.path.join(path, "config.json")) as f:
        cfg = MultimodalConfig.from_dict(json.load(f))
    model = MultimodalModel(cfg)
    state = load_hf_state_dict(path)

    llm_state = {
        k[len("model."):]: v for k, v in state.items() if k.startswith("model.")
    }
    params: Params = {
        "llm": llama_params_from_state_dict(llm_state, cfg.llm, dtype=cfg.llm.dtype),
        "modalities": {},
    }
    for i, (mtype, mod) in enumerate(model.modalities.items()):
        base = f"modalities_with_projection.{i}."
        tower = vit_params_from_state_dict(
            state, mod.vit_cfg, prefix=f"{base}feature_extractor.vision_model.",
            dtype=mod.vit_cfg.dtype,
        )
        g = lambda k: jnp.asarray(state[base + "projector." + k], mod.vit_cfg.dtype)
        projector = {
            "fc1": g("projection.0.weight").T,
            "b1": g("projection.0.bias"),
            "fc2": g("projection.2.weight").T,
            "b2": g("projection.2.bias"),
            "fc3": g("projection.4.weight").T,
            "b3": g("projection.4.bias"),
        }
        params["modalities"][mtype] = {"embedder": tower, "projector": projector}
    return model, params
