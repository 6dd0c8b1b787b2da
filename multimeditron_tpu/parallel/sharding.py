"""Parameter and batch sharding rules (GSPMD).

Replaces the reference's DeepSpeed ZeRO-3 runtime schedule
(``config/deepspeed.json:2-20``) with declarative NamedSharding rules:
parameters/optimizer state shard over the ``fsdp`` axis; attention heads
and FFN hidden dims additionally shard over ``tp``. XLA inserts the
all-gather / reduce-scatter schedule that DeepSpeed implements by hand.

Rules are matched on the parameter's tree path (joined with "/"), first
match wins. Every rule maps to a PartitionSpec over the trailing dims of
the (possibly layer-stacked) array.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]

# (path regex, spec) — specs are written for the LAYER-STACKED arrays
# (leading L dim unsharded). "..." in comments marks the stacked dim.
_RULES: List[Tuple[str, P]] = [
    # ---- LLM (llama.py layout) ----
    # Embedding table shards VOCAB over (tp, fsdp) with hidden replicated:
    # SPMD lowers the token gather from a vocab-sharded table to
    # masked-local-gather + psum cleanly, whereas a hidden-sharded table
    # forced "involuntary full rematerialization" (replicate-then-
    # repartition) of the gather output on sp/ep meshes (MULTICHIP_r02).
    # Per-device bytes are identical (V/(tp*fsdp) x D).
    (r"embed_tokens$",            P(("tp", "fsdp"), None)),  # (V, D)
    (r"lm_head$",                 P("fsdp", "tp")),          # (D, V)
    (r"layers/(q|k|v)_proj$",     P(None, "fsdp", "tp")),    # (L, D, H*Dh)
    (r"layers/o_proj$",           P(None, "tp", "fsdp")),    # (L, H*Dh, D)
    (r"layers/(gate|up)_proj$",   P(None, "fsdp", "tp")),    # (L, D, F)
    (r"layers/down_proj$",        P(None, "tp", "fsdp")),    # (L, F, D)
    (r"layers/(input|post_attn)_norm$", P(None, None)),      # (L, D)
    (r"layers/(q|k)_norm$",       P(None, None)),
    (r"final_norm$",              P(None)),
    # ---- weight-only int8 serving trees (models/llama_quant.py) ----
    # values shard like their bf16 source; per-output-channel scales
    # (L, N) / (V,) shard with the output dim.
    (r"layers/(q|k|v|gate|up)_proj_q$", P(None, "fsdp", "tp")),
    (r"layers/(q|k|v|gate|up)_proj_s$", P(None, "tp")),
    (r"layers/(o|down)_proj_q$",  P(None, "tp", "fsdp")),
    (r"layers/(o|down)_proj_s$",  P(None, "fsdp")),
    (r"lm_head_q$",               P("fsdp", "tp")),
    (r"lm_head_s$",               P("tp")),
    # ---- ViT towers ----
    (r"patch_proj$",              P(None, "fsdp")),          # (P*P*3, D)
    (r"patch_bias$",              P(None)),
    (r"position_embedding$",      P(None, "fsdp")),
    (r"cls_token$",               P(None)),
    (r"(pre|post)_ln_[wb]$",      P(None)),
    (r"layers/ln[12]_[wb]$",      P(None, None)),
    (r"layers/(q|k|v)_bias$",     P(None, "tp")),
    (r"layers/o_bias$",           P(None, "fsdp")),
    (r"layers/fc1$",              P(None, "fsdp", "tp")),    # (L, D, F)
    (r"layers/fc1_bias$",         P(None, "tp")),
    (r"layers/fc2$",              P(None, "tp", "fsdp")),    # (L, F, D)
    (r"layers/fc2_bias$",         P(None, "fsdp")),
    # ---- Projectors ----
    (r"projector/fc\d$",          P("fsdp", "tp")),
    (r"projector/b\d$",           P("tp")),
    # ---- fallback: replicate ----
    (r".*",                       None),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path_str: str, ndim: int, pp: bool = False) -> P:
    # MoE expert stacks ("embedder/experts/...", "projector/projectors/
    # ...") carry a leading expert axis: the suffix rules below govern
    # the inner dims and the expert axis shards over "ep".
    expert_stacked = ("experts/" in path_str) or ("projectors/" in path_str)
    # Pipeline parallelism shards the DECODER layer stack's leading axis
    # over "pp" (parallel/pipeline.py). Modality towers (which reuse the
    # same layer-param names) are never pipelined, so exclude them.
    pp_stacked = (
        pp and "layers/" in path_str and "modalities/" not in path_str
        and not expert_stacked
    )
    for pattern, spec in _RULES:
        if re.search(pattern, path_str):
            if spec is None:
                if expert_stacked and ndim >= 1:
                    return P(*(("ep",) + (None,) * (ndim - 1)))
                if pp_stacked and ndim >= 1:
                    return P(*(("pp",) + (None,) * (ndim - 1)))
                return P()
            # Trim or left-pad the spec to the array rank.
            entries = tuple(spec)
            if len(entries) > ndim:
                entries = entries[-ndim:]
            elif len(entries) < ndim:
                entries = (None,) * (ndim - len(entries)) + entries
            if expert_stacked and ndim >= 1 and entries[0] is None:
                entries = ("ep",) + entries[1:]
            if pp_stacked and ndim >= 1 and entries[0] is None:
                entries = ("pp",) + entries[1:]
            return P(*entries)
    return P()


def _fit_spec(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Drop mesh axes that don't divide the dim they shard — device_put
    requires exact divisibility (no GSPMD padding for committed arrays).
    E.g. an E=3 expert stack on an ep=2 mesh stays replicated over ep."""
    entries = []
    for i, entry in enumerate(spec):
        if entry is not None:
            axes = entry if isinstance(entry, tuple) else (entry,)
            size = 1
            for a in axes:
                size *= mesh.shape[a]
            if shape[i] % size != 0:
                entry = None
        entries.append(entry)
    return P(*entries)


def param_sharding_rules(params: Params, mesh: Mesh, pp: bool = False) -> Params:
    """Pytree of NamedShardings matching ``params``. ``pp=True`` also
    shards the decoder layer stack's leading axis over the "pp" mesh axis
    (pipeline stages)."""
    pp = pp and mesh.shape.get("pp", 1) > 1

    def leaf_sharding(path, leaf):
        spec = spec_for_path(_path_str(path), leaf.ndim, pp=pp)
        return NamedSharding(mesh, _fit_spec(spec, leaf.shape, mesh))

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_params(params: Params, mesh: Mesh, pp: bool = False) -> Params:
    """Device_put params with their sharding rules (ZeRO-3-style layout).

    Single-device meshes skip explicit NamedSharding placement: it is a
    no-op layout-wise but measured 5.6x slower per train step through the
    axon TPU relay (NamedSharding-committed buffers take a slow execute
    path there)."""
    if mesh.devices.size == 1:
        return params
    shardings = param_sharding_rules(params, mesh, pp=pp)
    return jax.tree.map(jax.device_put, params, shardings)


def opt_state_sharding_rules(tx_init, params: Params, mesh: Mesh,
                             pp: bool = False) -> Any:
    """NamedShardings for an optax init's output pytree.

    Optimizer moments mirror the param tree under prefixes like
    ``.../mu/llm/layers/q_proj`` — the suffix-matched ``_RULES`` apply
    unchanged, so moments shard exactly like their parameters. Needed
    because ``tx.init`` outputs are data-INDEPENDENT zeros: GSPMD has no
    edge to propagate the input sharding through, and without explicit
    out_shardings the moments come back unsharded (a silent ZeRO-3
    violation — 2x replicated optimizer memory per chip)."""
    pp = pp and mesh.shape.get("pp", 1) > 1
    shapes = jax.eval_shape(tx_init, params)

    def leaf(path, s):
        spec = spec_for_path(_path_str(path), len(s.shape), pp=pp)
        return NamedSharding(mesh, _fit_spec(spec, s.shape, mesh))

    return jax.tree_util.tree_map_with_path(leaf, shapes)


def init_opt_state(tx, params: Params, mesh: Mesh, pp: bool = False):
    """``tx.init(params)`` with optimizer state sharded over the mesh."""
    if mesh.devices.size == 1:
        return tx.init(params)
    shardings = opt_state_sharding_rules(tx.init, params, mesh, pp=pp)
    return jax.jit(tx.init, out_shardings=shardings)(params)


def batch_sharding(mesh: Mesh, pytree_example: Any = None):
    """Batch arrays shard their leading dim over the (dp, fsdp) data axes.
    Returns None sharding on single-device meshes (see shard_params)."""

    def leaf(x=None):
        if mesh.devices.size == 1:
            return None
        return NamedSharding(mesh, P(("dp", "fsdp")))

    if pytree_example is None:
        return leaf()
    return jax.tree.map(lambda x: leaf(), pytree_example)
