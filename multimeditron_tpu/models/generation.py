"""Compiled autoregressive generation.

Replaces the reference's eager per-token decode loop
(``model/model.py:528-640``: python loop, per-step ``.cpu()`` syncs,
``output_attentions=True``, attention-mask concat per token) with a single
jitted program: vision-tower prefill + ``lax.while_loop`` token loop over a
preallocated KV cache with per-sample lengths, in-graph sampling
(temperature / top-k / top-p), EOS finish-mask and early exit — the same
*semantics* (temperature sampling, finished sequences emit EOS, early stop
when all finished) without the per-token host round-trips.

Batches are RIGHT-padded for generation: each sample's tokens occupy
positions [0, len) and the cache tracks per-sample lengths. (The reference
left-pads instead; right padding is the TPU-friendly equivalent since it
keeps the prefill causal offset at 0 for every sample.)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimeditron_tpu.models.llama import init_kv_cache, llama_forward
from multimeditron_tpu.models.multimodal import MultimodalModel


def sample_tokens(
    logits: jax.Array,
    key: jax.Array,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    do_sample: bool = True,
) -> jax.Array:
    """(B, V) logits -> (B,) sampled token ids, all in-graph."""
    if not do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temperature = max(float(temperature), 1e-6)  # reference model.py:563
    logits = logits.astype(jnp.float32) / temperature
    if top_k is not None and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (inclusive)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff_logit = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff_logit, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def generate(
    model: MultimodalModel,
    params: Dict[str, Any],
    batch: Dict[str, Any],
    max_new_tokens: int = 512,
    temperature: float = 0.1,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    do_sample: bool = True,
    key: Optional[jax.Array] = None,
    attn_impl: Optional[str] = None,
) -> jax.Array:
    """Generate up to ``max_new_tokens`` for a RIGHT-padded collated batch.

    ``batch`` is a collator output (with ``add_generation_prompt=True``).
    Returns (B, max_new_tokens) int32; positions after a sample's EOS are
    filled with the EOS id (reference semantics, ``model.py:623-634``).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    cfg = model.config.llm
    eos_id = model.config.eos_token_idx

    input_ids = jnp.asarray(batch["input_ids"], jnp.int32)
    attention_mask = jnp.asarray(batch["attention_mask"], jnp.int32)
    B, S = input_ids.shape
    lengths = attention_mask.sum(axis=-1).astype(jnp.int32)
    # Generation requires RIGHT padding (tokens at [0, len)); a left-padded
    # batch (reference inference default) must be re-collated with
    # padding_side="right". The check needs concrete values, so it only
    # runs outside jit (under jit the guard is the caller's contract —
    # wrapping it in `bool()` on tracers was the round-1 jit crash).
    if not isinstance(attention_mask, jax.core.Tracer):
        first_valid = jnp.argmax(attention_mask, axis=-1)
        if bool((first_valid != 0).any()) and bool((lengths > 0).all()):
            raise ValueError(
                "generate() expects right-padded batches; re-collate with "
                "padding_side='right' (see module docstring)"
            )

    mm_inputs = batch.get("mm_inputs")
    if mm_inputs is not None:
        mm_inputs = jax.tree.map(jnp.asarray, mm_inputs)

    position_ids = batch.get("position_ids")
    if position_ids is not None:
        position_ids = jnp.asarray(position_ids, jnp.int32)

    # ------------------------------------------------------------------
    # Prefill: vision encode + splice + full forward into the cache.
    # ------------------------------------------------------------------
    inputs_embeds = model.embed(params, input_ids, mm_inputs)
    cache = init_kv_cache(cfg, B, S + max_new_tokens)
    logits, cache = llama_forward(
        params["llm"],
        cfg,
        inputs_embeds=inputs_embeds,
        attention_mask=attention_mask,
        position_ids=position_ids,
        kv_cache=cache,
        prefill=True,
        attn_impl=attn_impl,
    )
    # True per-sample lengths (cache slots past a sample's length hold
    # garbage from padding rows; they stay masked by `length`).
    cache = {**cache, "length": lengths}

    # Next-token position in the rope stream (2-D position ids may compress
    # the stream, so derive it from the actual position ids).
    if position_ids is not None:
        flat_pos = (
            position_ids.max(axis=-1) if position_ids.ndim == 3 else position_ids
        )
        next_pos = (flat_pos * attention_mask).max(axis=-1) + 1
    else:
        next_pos = lengths
    pos_is_2d = position_ids is not None and position_ids.ndim == 3

    last_logits = jnp.take_along_axis(
        logits, (lengths - 1)[:, None, None], axis=1
    )[:, 0]

    key, sub = jax.random.split(key)
    first_token = sample_tokens(
        last_logits, sub, temperature, top_k, top_p, do_sample
    )
    finished0 = first_token == eos_id
    out0 = jnp.full((B, max_new_tokens), eos_id, jnp.int32)
    out0 = out0.at[:, 0].set(first_token)

    # ------------------------------------------------------------------
    # Decode loop.
    # ------------------------------------------------------------------
    def cond(state):
        step, _, _, finished, _, _, _ = state
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(finished))

    def body(state):
        step, tokens, cache, finished, out, next_pos, key = state
        embeds = jnp.take(params["llm"]["embed_tokens"], tokens, axis=0)[:, None, :]
        pos = next_pos[:, None]
        if pos_is_2d:
            pos = jnp.broadcast_to(pos[..., None], (B, 1, 2))
        logits, cache = llama_forward(
            params["llm"],
            cfg,
            inputs_embeds=embeds,
            position_ids=pos,
            kv_cache=cache,
            attn_impl=attn_impl,
        )
        key, sub = jax.random.split(key)
        next_token = sample_tokens(
            logits[:, 0], sub, temperature, top_k, top_p, do_sample
        )
        next_token = jnp.where(finished, eos_id, next_token)
        out = out.at[:, step + 1].set(next_token)
        finished = jnp.logical_or(finished, next_token == eos_id)
        # cache["length"] advanced by llama_forward (+1); keep next_pos in
        # rope-stream coordinates.
        return (step + 1, next_token, cache, finished, out, next_pos + 1, key)

    state = (jnp.int32(0), first_token, cache, finished0, out0, next_pos, key)
    _, _, _, _, out, _, _ = jax.lax.while_loop(cond, body, state)
    return out


def make_generate_fn(model: MultimodalModel, **gen_kwargs):
    """jit-compiled generate closed over static generation params."""

    @functools.partial(jax.jit, static_argnames=("max_new_tokens", "do_sample"))
    def fn(params, batch, key, max_new_tokens=128, do_sample=True):
        return generate(
            model, params, batch,
            max_new_tokens=max_new_tokens,
            do_sample=do_sample,
            key=key,
            **gen_kwargs,
        )

    return fn
