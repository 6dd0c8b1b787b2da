"""Functional Llama-architecture decoder (Llama-2/3, Qwen-compatible GQA).

TPU-native replacement for the HF ``AutoModelForCausalLM`` the reference
wraps (``model/model.py:253-262``): parameters are a pytree with layers
STACKED on a leading axis and the forward pass is a single
``lax.scan`` over layers — one XLA graph regardless of depth, friendly to
``jax.checkpoint`` remat policies and GSPMD sharding rules.

Supports:
- grouped-query attention via the Pallas flash kernel;
- RoPE incl. HF llama3 scaling and optional Qwen-style QK-norm;
- splice-ready ``inputs_embeds`` entry (multimodal embedding injection);
- KV cache with per-sample lengths for batched decode;
- 1-D or 2-D position ids (axis-split rotary).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimeditron_tpu.models.common import apply_rope, rms_norm, rope_frequencies
from multimeditron_tpu.ops.attention import attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_layers: int = 16
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: Optional[int] = None
    rope_theta: float = 500000.0
    rope_scaling: Optional[dict] = None
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 8192
    use_qk_norm: bool = False  # Qwen3/Apertus-style per-head RMSNorm on q/k
    attention_bias: bool = False
    # MLP shape: gated (llama/qwen silu(gate)*up) or plain up->act->down
    # (Apertus). ``hidden_act`` selects the activation; "xielu" carries
    # learnable per-layer alpha_p/alpha_n params (models/common.py:xielu).
    mlp_gate: bool = True
    hidden_act: str = "silu"
    # HF architecture family ("llama" | "qwen3" | "apertus"): drives the
    # checkpoint key names in hf_import/hf_export.
    hf_arch: str = "llama"
    # DeepSpeed-Ulysses-style sequence parallelism (training/prefill, no
    # kv cache): activations carry an "sp" sharding constraint along the
    # sequence outside attention and along HEADS inside it; XLA inserts
    # the all-to-alls. Requires a mesh with an "sp" axis
    # (parallel/mesh.py) in context; constraints are skipped silently
    # when no mesh is active.
    sequence_parallel: bool = False
    # Ring attention over the "sp" axis (ops/ring_attention.py): k/v
    # shards ppermute around the ring and activations stay
    # SEQUENCE-sharded inside attention — O(S/n) memory, the
    # long-context alternative to the Ulysses all-to-all (which needs
    # every device to hold the full sequence for its head slice).
    # Requires sequence_parallel=True; training/prefill only.
    ring_attention: bool = False
    # GPipe pipeline parallelism over the "pp" mesh axis
    # (parallel/pipeline.py): layer stack sharded into `pipeline_parallel`
    # contiguous stages, microbatches flow via ppermute. Training/prefill
    # only (the kv-cache decode paths ignore it). num_layers must divide
    # evenly; the batch must divide `pipeline_microbatches` (default:
    # one microbatch per stage).
    pipeline_parallel: int = 1
    pipeline_microbatches: Optional[int] = None
    # W8A8 prefill (quantized serving trees only): when the params carry
    # int8 weights AND the call processes >= w8a8_min_rows token rows
    # (prefill; decode's M = slots stays below), activations quantize
    # per-row to int8 ONCE per site and the projections run int8 x int8
    # -> int32 — measured 2.5-2.7x the bf16 dequant rate at 8B prefill
    # shapes (benchmarks/w8a8_probe.py / actquant_probe.py). 0 disables.
    w8a8_min_rows: int = 0
    dtype: Any = jnp.bfloat16

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @staticmethod
    def from_hf_dict(d: dict) -> "LlamaConfig":
        """Build from an HF ``config.json`` dict (llama/qwen3/apertus)."""
        mt = d.get("model_type", "llama")
        return LlamaConfig(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=d["num_attention_heads"],
            num_kv_heads=d.get("num_key_value_heads", d["num_attention_heads"]),
            head_dim=d.get("head_dim"),
            rope_theta=d.get("rope_theta", 10000.0),
            rope_scaling=d.get("rope_scaling"),
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            max_position_embeddings=d.get("max_position_embeddings", 8192),
            use_qk_norm=mt in ("qwen3", "apertus"),
            attention_bias=d.get("attention_bias", False),
            mlp_gate=mt != "apertus",
            hidden_act=d.get("hidden_act", "silu"),
            hf_arch=mt if mt in ("llama", "qwen3", "apertus") else "llama",
        )


# ----------------------------------------------------------------------
# Init
# ----------------------------------------------------------------------
def init_llama_params(key: jax.Array, cfg: LlamaConfig) -> Params:
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    Dh = cfg.head_dim_
    H, Hkv = cfg.num_heads, cfg.num_kv_heads
    keys = jax.random.split(key, 8)

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / (fan_in ** 0.5)).astype(
            cfg.dtype
        )

    params: Params = {
        "embed_tokens": dense(keys[0], (cfg.vocab_size, D), D),
        "layers": {
            "input_norm": jnp.ones((L, D), cfg.dtype),
            "q_proj": dense(keys[1], (L, D, H * Dh), D),
            "k_proj": dense(keys[2], (L, D, Hkv * Dh), D),
            "v_proj": dense(keys[3], (L, D, Hkv * Dh), D),
            "o_proj": dense(keys[4], (L, H * Dh, D), H * Dh),
            "post_attn_norm": jnp.ones((L, D), cfg.dtype),
            "up_proj": dense(keys[6], (L, D, F), D),
            "down_proj": dense(keys[7], (L, F, D), F),
        },
        "final_norm": jnp.ones((D,), cfg.dtype),
    }
    if cfg.mlp_gate:
        params["layers"]["gate_proj"] = dense(keys[5], (L, D, F), D)
    if cfg.hidden_act == "xielu":
        # softplus-inverse of the HF defaults (alpha_p=0.8, alpha_n-beta=0.3)
        import math

        params["layers"]["xielu_alpha_p"] = jnp.full(
            (L, 1), math.log(math.expm1(0.8)), jnp.float32
        )
        params["layers"]["xielu_alpha_n"] = jnp.full(
            (L, 1), math.log(math.expm1(0.3)), jnp.float32
        )
    if cfg.use_qk_norm:
        params["layers"]["q_norm"] = jnp.ones((L, Dh), cfg.dtype)
        params["layers"]["k_norm"] = jnp.ones((L, Dh), cfg.dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(jax.random.fold_in(key, 99), (D, cfg.vocab_size), D)
    return params


# ----------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------
def init_kv_cache(
    cfg: LlamaConfig, batch: int, max_len: int, dtype: Any = None
) -> Dict[str, jax.Array]:
    Dh = cfg.head_dim_
    dtype = dtype or cfg.dtype
    return {
        "k": jnp.zeros((cfg.num_layers, batch, cfg.num_kv_heads, max_len, Dh), dtype),
        "v": jnp.zeros((cfg.num_layers, batch, cfg.num_kv_heads, max_len, Dh), dtype),
        "length": jnp.zeros((batch,), jnp.int32),
    }


def init_paged_kv_cache(
    cfg: LlamaConfig,
    num_pages: int,
    page_size: int,
    pages_max: int,
    batch: int,
    ring_size: int = 8,
    dtype: Any = None,
) -> Dict[str, jax.Array]:
    """Paged KV pool + per-slot page tables (serving engine decode path).

    Page 0 is reserved as the TRASH page: never allocated to a slot, it
    absorbs writes for padded positions so scatter shapes stay static.
    ``ring_k/ring_v`` hold the tokens generated within the CURRENT decode
    chunk (``ring_size`` >= the engine's decode_chunk); ``pages_length``
    records how many tokens per slot are covered by the pages (the rest
    live in the ring until the engine folds them between chunks)."""
    Dh = cfg.head_dim_
    dtype = dtype or cfg.dtype
    L, Hkv = cfg.num_layers, cfg.num_kv_heads
    # round the ring up to the bf16 sublane tile (16 rows): degenerate
    # second-minor extents lower poorly in Mosaic, and the mask already
    # ignores rows past the chunk
    ring_size = max(16, -(-ring_size // 16) * 16)
    return {
        "k": jnp.zeros((L, Hkv, num_pages, page_size, Dh), dtype),
        "v": jnp.zeros((L, Hkv, num_pages, page_size, Dh), dtype),
        "ring_k": jnp.zeros((L, batch, Hkv, ring_size, Dh), dtype),
        "ring_v": jnp.zeros((L, batch, Hkv, ring_size, Dh), dtype),
        "page_table": jnp.zeros((batch, pages_max), jnp.int32),
        "pages_length": jnp.zeros((batch,), jnp.int32),
        "length": jnp.zeros((batch,), jnp.int32),
    }


def _sp_constrain(x: jax.Array, *spec) -> jax.Array:
    """Best-effort sharding constraint: a no-op when traced outside a
    mesh context (single-chip serving, CPU tests)."""
    from jax.sharding import PartitionSpec as P

    try:
        return jax.lax.with_sharding_constraint(x, P(*spec))
    except Exception:
        return x


def _ambient_mesh():
    """The mesh in context via EITHER API — ``jax.set_mesh(mesh)`` (the
    abstract mesh, visible inside jit traces) or the legacy ``with
    mesh:`` block (thread-resources env; private accessor, JAX has no
    public getter for it). None when neither is active. Checking both is
    load-bearing: a first cut only read thread_resources and silently
    fell back to full attention under set_mesh."""
    try:
        am = jax.sharding.get_abstract_mesh()
        if am is not None and am.axis_names:
            return am
    except Exception:  # pragma: no cover - API moved between versions
        pass
    try:
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
        return None if m.empty else m
    except Exception:  # pragma: no cover - accessor moved between versions
        return None


def _ring_attention_sp(q, k, v, kv_mask):
    """Ring attention over the ambient mesh's "sp" axis (partial-manual
    shard_map: dp/fsdp/tp stay GSPMD-automatic). Falls back to plain
    flash attention ONLY when no ambient mesh with a non-trivial "sp"
    axis is in context (CPU tests, single-chip) — that check is explicit,
    so real errors (bad block sizes, kernel failures, spec bugs) propagate
    instead of silently losing the O(S/n) memory behavior the flag
    promises."""
    from jax.sharding import PartitionSpec as P

    from multimeditron_tpu.ops.ring_attention import ring_attention

    mesh = _ambient_mesh()
    if (mesh is None or "sp" not in mesh.axis_names
            or mesh.shape["sp"] <= 1):
        return attention(q, k, v, kv_mask=kv_mask, causal=True, impl=None)

    interp = jax.default_backend() != "tpu"
    specs = P(None, None, "sp", None)
    in_specs = (specs,) * 3 + (
        (P(None, "sp"),) if kv_mask is not None else (P(),))
    mask_args = (kv_mask if kv_mask is not None
                 else jnp.zeros((), jnp.int32))

    def inner(q, k, v, m):
        return ring_attention(
            q, k, v, axis_name="sp", causal=True,
            kv_mask=(m if kv_mask is not None else None),
            interpret=interp)

    # Pass the mesh explicitly: shard_map's axis_names-only form needs a
    # jax.set_mesh context, but the trainer enters the LEGACY `with
    # mesh:` context — the discovered mesh covers both.
    return jax.shard_map(
        inner, mesh=mesh, in_specs=in_specs, out_specs=specs,
        check_vma=False,
    )(q, k, v, mask_args)


def _proj(h: jax.Array, lp: Params, name: str, act_q=None) -> jax.Array:
    """Projection matmul; dispatches to the weight-only int8 path when
    the params tree was quantized (``models/llama_quant.py``). With
    ``act_q`` = (int8 rows, f32 per-row scales) the projection runs the
    W8A8 int8 x int8 dot instead (compute-bound prefill; the caller
    quantizes each activation once and shares it across projections)."""
    if name + "_q" in lp:
        if act_q is not None:
            from multimeditron_tpu.ops.wo_matmul import w8a8_matmul

            return w8a8_matmul(act_q[0], act_q[1], lp[name + "_q"],
                               lp[name + "_s"], h.dtype)
        from multimeditron_tpu.ops.wo_matmul import wo_matmul

        return wo_matmul(h, lp[name + "_q"], lp[name + "_s"])
    return h @ lp[name]


def _maybe_quantize_act(h: jax.Array, lp: Params, cfg: LlamaConfig,
                        probe_name: str = "q_proj"):
    """(q, s) for the W8A8 prefill path, or None when it doesn't apply:
    needs cfg.w8a8_min_rows > 0, a quantized params tree, and at least
    that many token rows (static shape — decode's M = slots stays on
    the weight-read-bound W8A16 path)."""
    if not cfg.w8a8_min_rows or probe_name + "_q" not in lp:
        return None
    rows = 1
    for d in h.shape[:-1]:
        rows *= d
    if rows < cfg.w8a8_min_rows:
        return None
    from multimeditron_tpu.ops.wo_matmul import quantize_rows

    return quantize_rows(h)


def _layer(
    carry: Tuple[jax.Array, ...],
    layer_params: Params,
    layer_cache: Optional[Dict[str, jax.Array]],
    cfg: LlamaConfig,
    attn_impl: Optional[str],
    prefill: bool = False,
    page_table: Optional[jax.Array] = None,
    page_size: Optional[int] = None,
    layer_index: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
    """One decoder layer. When a cache is present, ``layer_cache`` holds
    the FULL stacked-over-layers cache arrays (scan carry — updated in
    place inside the while loop) and ``layer_index`` selects this layer's
    slice; without a cache the caller passes per-layer params only."""
    x, position_ids, attention_mask, cache_lengths, inv_freq = carry
    B, S, D = x.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_

    sp = cfg.sequence_parallel and layer_cache is None
    if sp:
        x = _sp_constrain(x, ("dp", "fsdp"), "sp", None)
    h = rms_norm(x, layer_params["input_norm"], cfg.rms_norm_eps)
    if "qkv_q" in layer_params:
        # fused int8 QKV: ONE streamed weight read per layer (decode is
        # weight-read bound; small per-projection reads stream at half
        # rate — see llama_quant._fuse_layers)
        hq = _maybe_quantize_act(h, layer_params, cfg, "qkv")
        qkv = _proj(h, layer_params, "qkv", hq)
        Dq, Dkv = H * Dh, Hkv * Dh
        q = qkv[..., :Dq].reshape(B, S, H, Dh)
        k = qkv[..., Dq:Dq + Dkv].reshape(B, S, Hkv, Dh)
        v = qkv[..., Dq + Dkv:].reshape(B, S, Hkv, Dh)
    else:
        # W8A8 prefill: quantize h once, share across the q/k/v dots
        hq = _maybe_quantize_act(h, layer_params, cfg)
        q = _proj(h, layer_params, "q_proj", hq).reshape(B, S, H, Dh)
        k = _proj(h, layer_params, "k_proj", hq).reshape(B, S, Hkv, Dh)
        v = _proj(h, layer_params, "v_proj", hq).reshape(B, S, Hkv, Dh)
    if cfg.use_qk_norm:
        q = rms_norm(q, layer_params["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, layer_params["k_norm"], cfg.rms_norm_eps)
    q = q.transpose(0, 2, 1, 3)  # (B,H,S,Dh)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if sp and not cfg.ring_attention:
        # Ulysses all-to-all: sequence-sharded -> head-sharded (heads
        # split over tp AND sp inside attention, full sequence visible)
        q = _sp_constrain(q, ("dp", "fsdp"), ("tp", "sp"), None, None)
        k = _sp_constrain(k, ("dp", "fsdp"), ("tp", "sp"), None, None)
        v = _sp_constrain(v, ("dp", "fsdp"), ("tp", "sp"), None, None)

    q = apply_rope(q, position_ids, inv_freq)
    k = apply_rope(k, position_ids, inv_freq)

    new_cache = None
    if layer_cache is not None and page_table is not None:
        # Paged decode (serving engine): single-token step against a page
        # pool stacked over layers (L, Hkv, n_pages, P, Dh). Pages are
        # READ-ONLY within a decode chunk; this step's K/V row goes into
        # the small per-chunk RING buffer at row ``t`` (uniform in-chunk
        # step index) — a dynamic-update-slice XLA keeps in place inside
        # the while loop. The Pallas kernel attends over pages + ring.
        # The engine folds the ring into the pages between chunks
        # (ops.paged_attention.fold_ring_into_pages).
        from multimeditron_tpu.ops.paged_attention import (
            ring_decode_attention,
            ring_verify_attention,
        )

        pages_len = layer_cache["pages_length"]
        rk, rv = layer_cache["ring_k"], layer_cache["ring_v"]
        if S == 1:
            # in-chunk row: active slots all advanced identically since
            # the chunk started, so the max generation offset IS the
            # step index
            t = jnp.max(cache_lengths - pages_len)
            # k/v: (B, Hkv, S=1, Dh) -> update block (1, B, Hkv, 1, Dh)
            rk = jax.lax.dynamic_update_slice(
                rk, k.astype(rk.dtype)[None], (layer_index, 0, 0, t, 0),
            )
            rv = jax.lax.dynamic_update_slice(
                rv, v.astype(rv.dtype)[None], (layer_index, 0, 0, t, 0),
            )
            out = ring_decode_attention(
                q[:, :, 0, :], layer_cache["k"], layer_cache["v"], rk, rv,
                page_table, pages_len, cache_lengths, layer_index,
                impl=attn_impl,
            )
            out = out[:, :, None, :]
        else:
            # Speculative VERIFY block. Contract: the engine folds the
            # ring into the pages after EVERY verify step, so all slots
            # enter with pages_len == length and the block lands at ring
            # rows [t, t+S) with ONE dynamic_update_slice (a per-slot
            # advanced scatter here cost ~28 ms/step at 8B — XLA lowers
            # it to many small slice writes). The multi-query attention
            # handles the general per-slot ring masking regardless.
            t = jnp.max(cache_lengths - pages_len)
            # k/v: (B, Hkv, S, Dh) -> update block (1, B, Hkv, S, Dh)
            rk = jax.lax.dynamic_update_slice(
                rk, k.astype(rk.dtype)[None], (layer_index, 0, 0, t, 0),
            )
            rv = jax.lax.dynamic_update_slice(
                rv, v.astype(rv.dtype)[None], (layer_index, 0, 0, t, 0),
            )
            out = ring_verify_attention(
                q, layer_cache["k"], layer_cache["v"], rk, rv,
                page_table, pages_len, cache_lengths, layer_index,
                impl=attn_impl,
            )
        new_cache = {"k": layer_cache["k"], "v": layer_cache["v"],
                     "ring_k": rk, "ring_v": rv}
    elif layer_cache is not None:
        # Write this step's K/V at each sample's current length, then attend
        # over the whole (masked) cache. Decode path: S is 1 (or a small
        # speculative block); cache length advances by S. The stacked cache
        # (L, B, Hkv, max, Dh) rides the scan carry: the scatter below
        # updates it in place inside the while loop (no per-step ys copy).
        ck_all, cv_all = layer_cache["k"], layer_cache["v"]
        max_len = ck_all.shape[3]
        pos = cache_lengths[:, None] + jnp.arange(S)[None, :]  # (B,S)
        b_idx = jnp.arange(B)[:, None]
        ck_all = ck_all.at[layer_index, b_idx, :, pos, :].set(
            k.transpose(0, 2, 1, 3).astype(ck_all.dtype)
        )
        cv_all = cv_all.at[layer_index, b_idx, :, pos, :].set(
            v.transpose(0, 2, 1, 3).astype(cv_all.dtype)
        )
        cache_k = jax.lax.dynamic_index_in_dim(ck_all, layer_index, 0,
                                               keepdims=False)
        cache_v = jax.lax.dynamic_index_in_dim(cv_all, layer_index, 0,
                                               keepdims=False)
        kv_mask = (
            jnp.arange(max_len)[None, :] < (cache_lengths + S)[:, None]
        ).astype(jnp.int32)
        # Decode (S small, causal irrelevant within the step): plain masked
        # attention over the cache. Prefill-into-cache: causal with the
        # per-sample cache length as offset (0 for fresh slots; chunked
        # prefill continues at the already-written prefix length).
        out = attention(
            q, cache_k, cache_v, kv_mask=kv_mask,
            causal=prefill, causal_offset=cache_lengths if prefill else None,
            impl=attn_impl,
        )
        new_cache = {"k": ck_all, "v": cv_all}
    elif sp and cfg.ring_attention:
        out = _ring_attention_sp(q, k, v, attention_mask)
    else:
        kv_mask = attention_mask
        out = attention(q, k, v, kv_mask=kv_mask, causal=True, impl=attn_impl)

    out = out.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)
    if sp:
        # back to sequence sharding for the MLP/residual stream
        out = _sp_constrain(out, ("dp", "fsdp"), "sp", None)
    x = x + _proj(out, layer_params, "o_proj",
                  _maybe_quantize_act(out, layer_params, cfg, "o_proj"))

    h = rms_norm(x, layer_params["post_attn_norm"], cfg.rms_norm_eps)
    if "gateup_q" in layer_params:
        hq2 = _maybe_quantize_act(h, layer_params, cfg, "gateup")
        gu = _proj(h, layer_params, "gateup", hq2).astype(jnp.float32)
        I = gu.shape[-1] // 2
        act = jax.nn.silu(gu[..., :I]) * gu[..., I:]
    else:
        hq2 = _maybe_quantize_act(h, layer_params, cfg, "up_proj")
        up = _proj(h, layer_params, "up_proj", hq2).astype(jnp.float32)
        if cfg.mlp_gate:
            gate = jax.nn.silu(
                _proj(h, layer_params, "gate_proj", hq2).astype(jnp.float32)
            )
            act = gate * up
        elif cfg.hidden_act == "xielu":
            from multimeditron_tpu.models.common import xielu

            act = xielu(
                up, layer_params["xielu_alpha_p"],
                layer_params["xielu_alpha_n"]
            )
        else:
            act = getattr(jax.nn, cfg.hidden_act)(up)
    act = act.astype(h.dtype)
    x = x + _proj(act, layer_params, "down_proj",
                  _maybe_quantize_act(act, layer_params, cfg, "down_proj"))
    return x, new_cache


def llama_forward(
    params: Params,
    cfg: LlamaConfig,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    kv_cache: Optional[Dict[str, jax.Array]] = None,
    attn_impl: Optional[str] = None,
    remat: bool = False,
    prefill: bool = False,
    page_size: Optional[int] = None,
    mesh: Optional[Any] = None,
    return_hidden: bool = False,
) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
    """Run the decoder. Returns (logits, updated_kv_cache_or_None), plus
    the final-norm hidden states as a third element when ``return_hidden``
    (value heads — rlhf/ppo.py — read the trunk without the lm_head cost
    mattering since XLA DCEs logits consumers don't use).

    A ``kv_cache`` carrying a ``page_table`` runs the PAGED decode path
    (``page_size`` must then be passed as a STATIC int — it shapes the
    Pallas grid and must not be a traced leaf of the cache pytree).

    With ``cfg.pipeline_parallel > 1`` (and no kv cache) the layer stack
    runs as a GPipe pipeline over the mesh's "pp" axis — pass the
    ``mesh`` explicitly (the trainer does)."""
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(params, input_ids)
    x = inputs_embeds
    B, S, _ = x.shape

    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)
    if position_ids is None:
        if kv_cache is not None:
            position_ids = kv_cache["length"][:, None] + jnp.arange(S)[None, :]
        else:
            position_ids = jnp.cumsum(attention_mask, axis=-1) - 1
            position_ids = jnp.where(attention_mask == 0, 0, position_ids)

    inv_freq = rope_frequencies(cfg.head_dim_, cfg.rope_theta, cfg.rope_scaling)
    cache_lengths = kv_cache["length"] if kv_cache is not None else None
    carry_consts = (position_ids, attention_mask, cache_lengths, inv_freq)
    page_table = kv_cache.get("page_table") if kv_cache is not None else None
    if page_table is not None and page_size is None:
        raise ValueError("paged kv_cache requires a static page_size argument")

    if kv_cache is None:
        if cfg.pipeline_parallel > 1:
            if mesh is None:
                raise ValueError(
                    "pipeline_parallel > 1 requires passing the mesh to "
                    "llama_forward (see parallel/pipeline.py)"
                )
            from multimeditron_tpu.parallel.pipeline import (
                pipeline_decoder_layers,
            )

            x = pipeline_decoder_layers(
                params["layers"], x, position_ids, attention_mask, cfg,
                mesh, attn_impl=attn_impl, remat=remat,
            )
        else:
            def scan_body(x, layer_params):
                x, _ = _layer(
                    (x, *carry_consts), layer_params, None, cfg, attn_impl,
                    prefill=prefill,
                )
                return x, None

            body = jax.checkpoint(scan_body) if remat else scan_body
            x, _ = jax.lax.scan(body, x, params["layers"])
        new_caches = None
    else:
        # The stacked cache arrays ride the CARRY (not xs/ys): the while
        # loop then aliases them in place across layers instead of
        # materializing a fresh ys copy of the whole cache every step
        # (measured ~2 ms/step on a 1B decode before this change).
        cache_carry = {"k": kv_cache["k"], "v": kv_cache["v"]}
        if page_table is not None:
            cache_carry["ring_k"] = kv_cache["ring_k"]
            cache_carry["ring_v"] = kv_cache["ring_v"]
        pages_length = kv_cache.get("pages_length")

        def cache_body(carry, layer_inputs):
            x, cc = carry
            layer_params, idx = layer_inputs
            lc = dict(cc)
            if pages_length is not None:
                lc["pages_length"] = pages_length
            x, new_lc = _layer(
                (x, *carry_consts), layer_params, lc,
                cfg, attn_impl, prefill=prefill, page_table=page_table,
                page_size=page_size, layer_index=idx,
            )
            return (x, {key: new_lc[key] for key in cc}), None

        (x, cache_carry), _ = jax.lax.scan(
            cache_body,
            (x, cache_carry),
            (params["layers"], jnp.arange(cfg.num_layers, dtype=jnp.int32)),
        )
        new_caches = cache_carry

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    logits = lm_head_logits(params, cfg, x)

    new_kv_cache = None
    if kv_cache is not None:
        new_kv_cache = {
            **new_caches,
            "length": kv_cache["length"] + S,
        }
        if page_table is not None:
            new_kv_cache["page_table"] = page_table
            new_kv_cache["pages_length"] = kv_cache["pages_length"]
    if return_hidden:
        return logits, new_kv_cache, x
    return logits, new_kv_cache


def lm_head_logits(params: Params, cfg: LlamaConfig, x: jax.Array) -> jax.Array:
    """Vocab projection of (final-normed) hidden states. Exposed so the
    serving prefill can project ONLY each request's last position —
    projecting every prompt position at 8B scale (8192 tokens x 128k
    vocab) costs ~60 ms of pure throwaway lm_head work per 16-request
    group (the decode path needs just the last logits)."""
    if "lm_head_q" in params:
        from multimeditron_tpu.ops.wo_matmul import wo_matmul

        return wo_matmul(x, params["lm_head_q"], params["lm_head_s"])
    if cfg.tie_word_embeddings:
        return x @ params["embed_tokens"].T
    return x @ params["lm_head"]


def embed_tokens(params: Params, input_ids: jax.Array) -> jax.Array:
    out = jnp.take(params["embed_tokens"], input_ids, axis=0)
    # Pin the gather OUTPUT to the decoder's activation layout
    # ((dp,fsdp) batch, sp sequence, replicated hidden). Without this SPMD
    # inherits the vocab/hidden-sharded table layout for the gather result
    # and then "involuntarily fully rematerializes" (replicate-then-
    # repartition) to reach the consumer's layout — observed on the
    # fsdp2xsp2xep2 dryrun leg (MULTICHIP_r02.json). Best-effort no-op
    # outside a mesh context (single-chip serving, CPU tests).
    return _sp_constrain(out, ("dp", "fsdp"), "sp", None)
