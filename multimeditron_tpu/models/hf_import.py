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


def load_hf_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load all safetensors shards in an HF checkpoint directory."""
    from safetensors import safe_open

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
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


# ----------------------------------------------------------------------
# Llama / Qwen
# ----------------------------------------------------------------------
def llama_params_from_state_dict(
    state: Mapping[str, Any], cfg: LlamaConfig, dtype=None
) -> Params:
    """Map an HF LlamaForCausalLM/Qwen3ForCausalLM state dict to our pytree."""
    import jax.numpy as jnp

    dtype = dtype or cfg.dtype
    g = lambda k: _np(state[k])

    def stack(fmt: str, transform: Callable[[np.ndarray], np.ndarray]):
        return jnp.asarray(
            np.stack([transform(g(fmt.format(i))) for i in range(cfg.num_layers)]),
            dtype=dtype,
        )

    t = lambda w: np.ascontiguousarray(w.T)
    ident = lambda w: w

    layers = {
        "input_norm": stack("model.layers.{}.input_layernorm.weight", ident),
        "q_proj": stack("model.layers.{}.self_attn.q_proj.weight", t),
        "k_proj": stack("model.layers.{}.self_attn.k_proj.weight", t),
        "v_proj": stack("model.layers.{}.self_attn.v_proj.weight", t),
        "o_proj": stack("model.layers.{}.self_attn.o_proj.weight", t),
        "post_attn_norm": stack(
            "model.layers.{}.post_attention_layernorm.weight", ident
        ),
        "gate_proj": stack("model.layers.{}.mlp.gate_proj.weight", t),
        "up_proj": stack("model.layers.{}.mlp.up_proj.weight", t),
        "down_proj": stack("model.layers.{}.mlp.down_proj.weight", t),
    }
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
