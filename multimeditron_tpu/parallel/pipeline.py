"""GPipe-style pipeline parallelism over the ``pp`` mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.2 — its scaling
story is DeepSpeed ZeRO-3 data parallelism only); this module is a
beyond-parity scaling axis for models too deep to replicate per chip even
with FSDP. TPU-native design, not a port of any torch pipeline engine:

- decoder layers are already STACKED on a leading axis (``models/llama.py``);
  pipeline stages are simply that axis sharded over the ``pp`` mesh axis —
  each stage holds ``L / pp`` contiguous layers;
- the schedule is a ``shard_map`` manual only over ``pp``
  (``axis_names={"pp"}``): dp/fsdp/tp/sp/ep stay GSPMD-managed *inside*
  the pipelined region, so pipeline composes with every other axis;
- microbatches flow stage-to-stage with ``lax.ppermute`` (ICI
  neighbour hops); the whole schedule is one ``lax.scan`` of
  ``M + pp - 1`` steps (GPipe fill/steady/drain), so XLA sees a single
  compiled loop;
- the backward pipeline falls out of autodiff: ``ppermute`` transposes to
  the reverse permutation, giving the textbook reversed schedule without
  hand-written machinery. Per-layer ``jax.checkpoint`` bounds activation
  memory exactly like the non-pipelined path.

Embedding, final norm and the LM head run OUTSIDE the pipelined region,
replicated over ``pp`` (sharded over fsdp/tp as usual) — the standard
cheap choice when the embedding is a small fraction of total FLOPs.

Bubble fraction is the GPipe ``(pp - 1) / (M + pp - 1)``; raise
``LlamaConfig.pipeline_microbatches`` (must divide the batch) to amortize.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Params = Dict[str, Any]


def pipeline_decoder_layers(
    layers: Params,
    x: jax.Array,
    position_ids: jax.Array,
    attention_mask: jax.Array,
    cfg,
    mesh: Mesh,
    attn_impl: Optional[str] = None,
    remat: bool = False,
) -> jax.Array:
    """Run the stacked decoder layers as a ``pp``-stage pipeline.

    ``layers`` leaves are (L, ...) with L sharded over ``pp`` (see
    ``parallel/sharding.py``); ``x`` is (B, S, D). Returns the hidden
    states after all L layers, identical (up to float assoc.) to the
    plain ``lax.scan`` path in ``models/llama.py:llama_forward``.
    """
    from multimeditron_tpu.models.common import rope_frequencies
    from multimeditron_tpu.models.llama import _layer

    stages = cfg.pipeline_parallel
    if mesh.shape.get("pp", 1) != stages:
        raise ValueError(
            f"LlamaConfig.pipeline_parallel={stages} but mesh pp axis is "
            f"{mesh.shape.get('pp', 1)}"
        )
    if cfg.num_layers % stages != 0:
        raise ValueError(
            f"num_layers={cfg.num_layers} not divisible by pipeline stages {stages}"
        )
    B, S, D = x.shape
    M = cfg.pipeline_microbatches or stages
    if B % M != 0:
        raise ValueError(
            f"batch {B} not divisible by pipeline_microbatches={M}"
        )
    mb = B // M
    T = M + stages - 1  # fill + steady + drain steps

    inv_freq = rope_frequencies(cfg.head_dim_, cfg.rope_theta, cfg.rope_scaling)

    # (B, ...) -> (M, mb, ...) microbatch stacks, padded with `stages - 1`
    # trailing garbage steps that drain the pipeline. The mask pads with
    # ones (not zeros) so garbage steps never produce fully-masked
    # attention rows.
    def split(a: jax.Array, pad_value) -> jax.Array:
        a = a.reshape(M, mb, *a.shape[1:])
        pad = jnp.full((stages - 1, *a.shape[1:]), pad_value, a.dtype)
        return jnp.concatenate([a, pad], axis=0)

    # xs crosses the shard_map boundary in f32: the transpose rule psums
    # the cotangent of pp-replicated inputs, and a bf16 psum inside
    # shard_map crashes XLA CPU's AllReducePromotion pass (the Shardy
    # sharding custom-call in the reduction body clones as an invalid
    # binary op, jaxlib 0.9). f32 keeps that auto-psum f32. Converted
    # back to the compute dtype at stage-0 ingestion below.
    xs = split(x, 0).astype(jnp.float32)
    pos = split(position_ids, 0)
    msk = split(attention_mask, 1)

    def stage_fn(local_layers: Params, x_mb, pos_mb, msk_mb):
        def body(h, layer_params):
            h, _ = _layer(
                (h, pos_mb, msk_mb, None, inv_freq),
                layer_params, None, cfg, attn_impl,
            )
            return h, None

        body = jax.checkpoint(body) if remat else body
        x_mb, _ = jax.lax.scan(body, x_mb, local_layers)
        return x_mb

    def pipelined(local_layers: Params, xs, pos, msk):
        i = jax.lax.axis_index("pp")
        perm = [(s, s + 1) for s in range(stages - 1)]

        def step(carry, inputs):
            h, p, m = carry
            in_h, in_p, in_m = inputs
            # stage 0 ingests microbatch t; everyone else keeps what the
            # previous stage ppermuted in last step
            h = jnp.where(i == 0, in_h.astype(h.dtype), h)
            p = jnp.where(i == 0, in_p, p)
            m = jnp.where(i == 0, in_m, m)
            y = stage_fn(local_layers, h, p, m)
            h = jax.lax.ppermute(y, "pp", perm)
            p_next = jax.lax.ppermute(p, "pp", perm)
            m_next = jax.lax.ppermute(m, "pp", perm)
            return (h, p_next, m_next), y

        carry0 = (
            jnp.zeros(xs.shape[1:], x.dtype),
            jnp.zeros(pos.shape[1:], pos.dtype),
            jnp.ones(msk.shape[1:], msk.dtype),
        )
        _, ys = jax.lax.scan(step, carry0, (xs, pos, msk))
        # the LAST stage's outputs at steps `stages-1 .. T-1` are the M
        # finished microbatches; broadcast them back to every pp rank.
        # The psum runs in f32: XLA's AllReducePromotion pass crashes
        # cloning a bf16 all-reduce on the CPU backend (jaxlib 0.9), and
        # f32 costs nothing extra — the pass would promote to f32 anyway.
        out = ys[stages - 1 :].astype(jnp.float32)
        out = jnp.where(i == stages - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, "pp").astype(x.dtype)

    out = jax.shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(P("pp"), P(), P(), P()),
        out_specs=P(),
        axis_names={"pp"},
        check_vma=False,
    )(layers, xs, pos, msk)
    return out.reshape(B, S, D)
