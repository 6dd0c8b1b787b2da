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
    apertus = getattr(cfg, "hf_arch", "llama") == "apertus"
    ln1 = "attention_layernorm" if apertus else "input_layernorm"
    ln2 = "feedforward_layernorm" if apertus else "post_attention_layernorm"
    layer_map = {
        "input_norm": (f"{ln1}.weight", False),
        "q_proj": ("self_attn.q_proj.weight", True),
        "k_proj": ("self_attn.k_proj.weight", True),
        "v_proj": ("self_attn.v_proj.weight", True),
        "o_proj": ("self_attn.o_proj.weight", True),
        "post_attn_norm": (f"{ln2}.weight", False),
        "gate_proj": ("mlp.gate_proj.weight", True),
        "up_proj": ("mlp.up_proj.weight", True),
        "down_proj": ("mlp.down_proj.weight", True),
        "q_norm": ("self_attn.q_norm.weight", False),
        "k_norm": ("self_attn.k_norm.weight", False),
        "xielu_alpha_p": ("mlp.act_fn.alpha_p", False),
        "xielu_alpha_n": ("mlp.act_fn.alpha_n", False),
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
        if isinstance(mp.get("embedder"), dict) and "experts" in mp["embedder"]:
            sd.update(_moe_state_dict(mp, mod, base))
        else:
            sd.update(
                vit_state_dict(
                    mp["embedder"], mod.vit_cfg,
                    prefix=f"{base}feature_extractor.vision_model.",
                )
            )
            sd.update(
                projector_state_dict(mp["projector"], prefix=f"{base}projector.")
            )

    sd = {k: jnp.asarray(v, dtype) for k, v in sd.items()}
    save_file(sd, os.path.join(out_dir, "model.safetensors"))

    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(model.config.to_dict(), f, indent=2)


def _cross_attn_state_dict(p: Params, prefix: str) -> Dict[str, jax.Array]:
    """Our cross-attention pytree -> reference CrossAttention keys
    (``attention.py:36-41``: q/k/v_proj + proj)."""
    sd = {
        prefix + "q_proj.weight": _t(p["q_proj"]),
        prefix + "k_proj.weight": _t(p["k_proj"]),
        prefix + "v_proj.weight": _t(p["v_proj"]),
        prefix + "proj.weight": _t(p["out_proj"]),
        prefix + "proj.bias": p["out_bias"],
    }
    for k in ("q", "k", "v"):
        if f"{k}_bias" in p:
            sd[prefix + f"{k}_proj.bias"] = p[f"{k}_bias"]
    return sd


def _moe_state_dict(mp: Params, mod, base: str) -> Dict[str, jax.Array]:
    """MoE modality -> reference module paths: stacked expert towers as
    ``experts.<e>.*`` (``image_modality_moe.py:104-118`` appends each
    CLIPVisionModel.vision_model), shared ``projector.*`` or PEP
    ``projectors.<e>.*``, ``cross_attn.*``. The gating ResNet is NOT in
    the safetensors — the reference always loads it from ``gating_path``
    at module init (``image_modality_moe.py:123``)."""
    sd: Dict[str, jax.Array] = {}
    experts = mp["embedder"]["experts"]
    E = jax.tree.leaves(experts)[0].shape[0]
    for e in range(E):
        tower = jax.tree.map(lambda x, e=e: x[e], experts)
        sd.update(vit_state_dict(tower, mod.vit_cfg, prefix=f"{base}experts.{e}."))
    proj = mp["projector"]
    if isinstance(proj, dict) and "projectors" in proj:
        stacked = proj["projectors"]
        for e in range(E):
            p_e = jax.tree.map(lambda x, e=e: x[e], stacked)
            sd.update(projector_state_dict(p_e, prefix=f"{base}projectors.{e}."))
        if "cross_attn" in proj:
            sd.update(_cross_attn_state_dict(proj["cross_attn"],
                                             f"{base}cross_attn."))
    else:
        sd.update(projector_state_dict(proj, prefix=f"{base}projector."))
    if "cross_attn" in mp:
        sd.update(_cross_attn_state_dict(mp["cross_attn"], f"{base}cross_attn."))
    return sd


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
        if any(k.startswith(base + "experts.") for k in state):
            params["modalities"][mtype] = _moe_params_from_state(
                state, mod, base)
            continue
        tower = vit_params_from_state_dict(
            state, mod.vit_cfg, prefix=f"{base}feature_extractor.vision_model.",
            dtype=mod.vit_cfg.dtype,
        )
        projector = _projector_from_state(state, base + "projector.",
                                          mod.vit_cfg.dtype)
        params["modalities"][mtype] = {"embedder": tower, "projector": projector}
    return model, params


def _projector_from_state(state, prefix: str, dtype) -> Params:
    g = lambda k: jnp.asarray(state[prefix + k], dtype)
    return {
        "fc1": g("projection.0.weight").T,
        "b1": g("projection.0.bias"),
        "fc2": g("projection.2.weight").T,
        "b2": g("projection.2.bias"),
        "fc3": g("projection.4.weight").T,
        "b3": g("projection.4.bias"),
    }


def _cross_attn_from_state(state, prefix: str, dtype) -> Params:
    g = lambda k: jnp.asarray(state[prefix + k], dtype)
    p = {
        "q_proj": g("q_proj.weight").T,
        "k_proj": g("k_proj.weight").T,
        "v_proj": g("v_proj.weight").T,
        "out_proj": g("proj.weight").T,
        "out_bias": g("proj.bias"),
    }
    for k in ("q", "k", "v"):
        if prefix + f"{k}_proj.bias" in state:
            p[f"{k}_bias"] = g(f"{k}_proj.bias")
    return p


def _moe_params_from_state(state, mod, base: str) -> Params:
    """Inverse of :func:`_moe_state_dict`: rebuild stacked expert towers
    and (PEP) stacked projectors. The gating network is initialized fresh
    (or from gating_path via load_pretrained_params) — it is not part of
    the safetensors, matching the reference."""
    from multimeditron_tpu.models.hf_import import vit_params_from_state_dict

    init = mod.init_params(jax.random.PRNGKey(0))
    dtype = mod.vit_cfg.dtype
    E = jax.tree.leaves(init["embedder"]["experts"])[0].shape[0]
    towers = [
        vit_params_from_state_dict(
            state, mod.vit_cfg, prefix=f"{base}experts.{e}.", dtype=dtype)
        for e in range(E)
    ]
    out: Params = {
        "embedder": {
            "experts": jax.tree.map(lambda *xs: jnp.stack(xs), *towers),
            "gating": init["embedder"]["gating"],
        }
    }
    if f"{base}projectors.0.projection.0.weight" in state:
        projs = [_projector_from_state(state, f"{base}projectors.{e}.", dtype)
                 for e in range(E)]
        out["projector"] = {
            "projectors": jax.tree.map(lambda *xs: jnp.stack(xs), *projs)
        }
        if f"{base}cross_attn.q_proj.weight" in state:
            out["projector"]["cross_attn"] = _cross_attn_from_state(
                state, f"{base}cross_attn.", dtype)
    else:
        out["projector"] = _projector_from_state(state, f"{base}projector.",
                                                 dtype)
        if f"{base}cross_attn.q_proj.weight" in state:
            out["cross_attn"] = _cross_attn_from_state(
                state, f"{base}cross_attn.", dtype)
    return out
