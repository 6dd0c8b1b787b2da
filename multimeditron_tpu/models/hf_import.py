"""HF-checkpoint import: torch/safetensors state dicts → functional pytrees.

Checkpoint fidelity with the HF format is an explicit parity goal
(reference serializes via ``PreTrainedModel``/safetensors,
``model/model.py:152-202``; BASELINE.json north star). Import goes through
plain numpy — no torch dependency on the TPU path.

Weight-layout conventions: HF ``nn.Linear`` stores (out_features,
in_features); this framework stores (in, out) so forwards are plain
``x @ w``. Per-layer weights are stacked on a leading layer axis for the
``lax.scan`` decoder.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Mapping

import numpy as np

from multimeditron_tpu.models.llama import LlamaConfig

Params = Dict[str, Any]


def _np(x) -> np.ndarray:
    """Convert a torch tensor / array-like to numpy without importing torch."""
    if isinstance(x, np.ndarray):
        return x
    # torch tensors expose .detach().cpu().numpy(); bfloat16 needs a float32
    # round-trip because numpy has no bf16.
    if hasattr(x, "detach"):
        t = x.detach().cpu()
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(x)


def resolve_checkpoint(path_or_id: str) -> str:
    """Resolve a local directory OR a Hugging Face Hub model id to a
    local snapshot directory (reference ``from_pretrained`` pulls from
    the hub, ``model/model.py:253``).

    Offline-first: an existing directory wins; otherwise an
    already-downloaded hub snapshot (the HF_HOME cache) is used without
    touching the network; only then is a download attempted, with a
    clear error when the environment has no egress."""
    if os.path.isdir(path_or_id):
        return path_or_id
    import re as _re

    if not _re.fullmatch(r"[\w.\-]+/[\w.\-]+", path_or_id):
        raise FileNotFoundError(
            f"checkpoint path {path_or_id!r} does not exist and does not "
            f"look like a hub id (org/name)"
        )
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        raise FileNotFoundError(
            f"checkpoint {path_or_id!r} is not a local directory and "
            f"huggingface_hub is unavailable to fetch it ({e})"
        )
    try:  # cache hit: no network
        return snapshot_download(path_or_id, local_files_only=True)
    except Exception:
        pass
    try:
        return snapshot_download(path_or_id)
    except Exception as e:
        raise FileNotFoundError(
            f"{path_or_id!r} is not a local directory, is not in the HF "
            f"cache, and could not be downloaded ({type(e).__name__}: {e})"
        )


def load_hf_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load all safetensors shards in an HF checkpoint directory (or hub
    id — resolved via ``resolve_checkpoint``)."""
    from safetensors import safe_open

    path = resolve_checkpoint(path)
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"No .safetensors files in {path}")
    state: Dict[str, np.ndarray] = {}
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    return state


def load_hf_config(path: str) -> dict:
    path = resolve_checkpoint(path)
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


# ----------------------------------------------------------------------
# Llama / Qwen
# ----------------------------------------------------------------------
def llama_params_from_state_dict(
    state: Mapping[str, Any], cfg: LlamaConfig, dtype=None
) -> Params:
    """Map an HF Llama/Qwen3/ApertusForCausalLM state dict to our pytree.

    Apertus (``cfg.hf_arch == "apertus"``) differs in layernorm key names
    (attention_layernorm/feedforward_layernorm), has no gate_proj, and
    carries learnable xIELU scalars under ``mlp.act_fn.alpha_{p,n}``."""
    import jax.numpy as jnp

    dtype = dtype or cfg.dtype
    g = lambda k: _np(state[k])

    def stack(fmt: str, transform: Callable[[np.ndarray], np.ndarray], dt=None):
        return jnp.asarray(
            np.stack([transform(g(fmt.format(i))) for i in range(cfg.num_layers)]),
            dtype=dt or dtype,
        )

    t = lambda w: np.ascontiguousarray(w.T)
    ident = lambda w: w

    apertus = cfg.hf_arch == "apertus"
    ln1 = "attention_layernorm" if apertus else "input_layernorm"
    ln2 = "feedforward_layernorm" if apertus else "post_attention_layernorm"

    layers = {
        "input_norm": stack("model.layers.{}.%s.weight" % ln1, ident),
        "q_proj": stack("model.layers.{}.self_attn.q_proj.weight", t),
        "k_proj": stack("model.layers.{}.self_attn.k_proj.weight", t),
        "v_proj": stack("model.layers.{}.self_attn.v_proj.weight", t),
        "o_proj": stack("model.layers.{}.self_attn.o_proj.weight", t),
        "post_attn_norm": stack("model.layers.{}.%s.weight" % ln2, ident),
        "up_proj": stack("model.layers.{}.mlp.up_proj.weight", t),
        "down_proj": stack("model.layers.{}.mlp.down_proj.weight", t),
    }
    if cfg.mlp_gate:
        layers["gate_proj"] = stack("model.layers.{}.mlp.gate_proj.weight", t)
    if cfg.hidden_act == "xielu":
        layers["xielu_alpha_p"] = stack(
            "model.layers.{}.mlp.act_fn.alpha_p", ident, dt=jnp.float32
        )
        layers["xielu_alpha_n"] = stack(
            "model.layers.{}.mlp.act_fn.alpha_n", ident, dt=jnp.float32
        )
    if cfg.use_qk_norm:
        layers["q_norm"] = stack("model.layers.{}.self_attn.q_norm.weight", ident)
        layers["k_norm"] = stack("model.layers.{}.self_attn.k_norm.weight", ident)

    params: Params = {
        "embed_tokens": jnp.asarray(g("model.embed_tokens.weight"), dtype=dtype),
        "layers": layers,
        "final_norm": jnp.asarray(g("model.norm.weight"), dtype=dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(t(g("lm_head.weight")), dtype=dtype)
    return params


def load_llama(path: str, dtype=None):
    """Load (LlamaConfig, params) from an HF checkpoint directory."""
    hf_cfg = load_hf_config(path)
    cfg = LlamaConfig.from_hf_dict(hf_cfg)
    state = load_hf_state_dict(path)
    return cfg, llama_params_from_state_dict(state, cfg, dtype=dtype)


# ----------------------------------------------------------------------
# CLIP / SigLIP vision towers
# ----------------------------------------------------------------------
def vit_params_from_state_dict(
    state: Mapping[str, Any],
    cfg,
    prefix: str = "vision_model.",
    dtype=None,
) -> Params:
    """Map an HF CLIPVisionModel/SiglipVisionModel state dict to our pytree.

    The patch conv weight (D, 3, P, P) becomes a (P*P*3, D) matmul operand
    ordered to match :func:`multimeditron_tpu.models.vit.patchify`
    ((i, j, c) patch-vector layout).
    """
    import jax.numpy as jnp

    dtype = dtype or cfg.dtype
    g = lambda k: _np(state[prefix + k])
    t = lambda w: np.ascontiguousarray(w.T)
    ident = lambda w: w
    L = cfg.num_layers

    def stack(fmt: str, transform):
        return jnp.asarray(
            np.stack([transform(g(fmt.format(i))) for i in range(L)]), dtype=dtype
        )

    conv_w = g("embeddings.patch_embedding.weight")  # (D, 3, P, P)
    D, C, P, _ = conv_w.shape
    patch_proj = conv_w.transpose(2, 3, 1, 0).reshape(P * P * C, D)

    params: Params = {
        "patch_proj": jnp.asarray(patch_proj, dtype=dtype),
        "position_embedding": jnp.asarray(
            g("embeddings.position_embedding.weight"), dtype=dtype
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
        "post_ln_w": jnp.asarray(g("post_layernorm.weight"), dtype=dtype),
        "post_ln_b": jnp.asarray(g("post_layernorm.bias"), dtype=dtype),
    }
    if cfg.patch_bias:
        params["patch_bias"] = jnp.asarray(
            g("embeddings.patch_embedding.bias"), dtype=dtype
        )
    if cfg.use_cls_token:
        params["cls_token"] = jnp.asarray(g("embeddings.class_embedding"), dtype=dtype)
    if cfg.use_pre_layernorm:
        params["pre_ln_w"] = jnp.asarray(g("pre_layrnorm.weight"), dtype=dtype)
        params["pre_ln_b"] = jnp.asarray(g("pre_layrnorm.bias"), dtype=dtype)
    return params


def load_clip_vision(path: str, dtype=None):
    """Load (ViTConfig, params) from an HF CLIP/SigLIP checkpoint dir."""
    from multimeditron_tpu.models.vit import ViTConfig

    hf_cfg = load_hf_config(path)
    model_type = hf_cfg.get("model_type", "clip")
    if "siglip" in model_type:
        cfg = ViTConfig.siglip_from_hf_dict(hf_cfg)
    else:
        cfg = ViTConfig.clip_from_hf_dict(hf_cfg)
    state = load_hf_state_dict(path)
    return cfg, vit_params_from_state_dict(state, cfg, dtype=dtype)
