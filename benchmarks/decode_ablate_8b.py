"""8B decode attribution (run on TPU): is the step floor-bound?

Round-4's 8B "decode 330 tok/s" divided by the WHOLE session wall —
prefill included — while the weight-stream roofline bounds only the
decode steps. serve_bench now reports steady_decode_tok_per_sec
(~940-960 at 16 slots = ~17 ms/step). This probe attributes that step,
all in ONE process at real 8B dims with int8 weights:

  wstream     — ONLY the W8A16 projections + lm_head at M=16 through
                all 32 layers (the weight-read floor; prints achieved
                GB/s against the 598 GB/s int8 stream rate)
  +attn       — wstream + the paged ring-decode attention kernel over
                ~576-token contexts (KV page reads)
  +sample     — +attn + f32 softmax/categorical over the 128k vocab
  engine      — the REAL engine decode chunk (chunk=16), per-step

Usage: python benchmarks/decode_ablate_8b.py [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--slots", type=int, default=16)
    parser.add_argument("--chunk", type=int, default=16)
    parser.add_argument("--ctx", type=int, default=576)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--hidden", type=int, default=4096)
    parser.add_argument("--layers", type=int, default=32)
    parser.add_argument("--heads", type=int, default=32)
    parser.add_argument("--kv-heads", type=int, default=8)
    parser.add_argument("--intermediate", type=int, default=14336)
    parser.add_argument("--vocab", type=int, default=128256)
    parser.add_argument("--no-fuse", action="store_true",
                        help="unfused per-projection weights (the "
                             "pre-round-5 layout)")
    parser.add_argument("--json", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimeditron_tpu.models.llama import LlamaConfig
    from multimeditron_tpu.models.llama_quant import (
        init_quantized_llama_params,
    )
    from multimeditron_tpu.ops.wo_matmul import wo_matmul

    cfg = LlamaConfig(
        vocab_size=args.vocab, hidden_size=args.hidden,
        intermediate_size=args.intermediate,
        num_layers=args.layers, num_heads=args.heads,
        num_kv_heads=args.kv_heads, dtype=jnp.bfloat16,
    )
    params = jax.jit(lambda k: init_quantized_llama_params(
        k, cfg, fuse=not args.no_fuse))(jax.random.PRNGKey(0))
    weight_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    B = args.slots
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    D, I = cfg.hidden_size, cfg.intermediate_size

    def layer_mats(x, lp):
        if "qkv_q" in lp:
            qkv = wo_matmul(x, lp["qkv_q"], lp["qkv_s"])
            Dq, Dkv = H * Dh, Hkv * Dh
            q = qkv[:, :Dq]
            k = qkv[:, Dq:Dq + Dkv]
            v = qkv[:, Dq + Dkv:]
        else:
            q = wo_matmul(x, lp["q_proj_q"], lp["q_proj_s"])
            k = wo_matmul(x, lp["k_proj_q"], lp["k_proj_s"])
            v = wo_matmul(x, lp["v_proj_q"], lp["v_proj_s"])
        o = wo_matmul(q, lp["o_proj_q"], lp["o_proj_s"])
        # consume k/v through full-width row reductions so XLA cannot
        # DCE their dots (a *0 coupling zeroed this variant out entirely)
        x = x + o + (jnp.max(k, axis=-1, keepdims=True)
                     + jnp.max(v, axis=-1, keepdims=True)) * 1e-30
        if "gateup_q" in lp:
            gu = wo_matmul(x, lp["gateup_q"], lp["gateup_s"])
            g, u = gu[:, :I], gu[:, I:]
        else:
            g = wo_matmul(x, lp["gate_proj_q"], lp["gate_proj_s"])
            u = wo_matmul(x, lp["up_proj_q"], lp["up_proj_s"])
        x = x + wo_matmul(
            (jax.nn.silu(g.astype(jnp.float32)) * u).astype(x.dtype),
            lp["down_proj_q"], lp["down_proj_s"])
        return x

    def mk_wstream():
        def step(params, x, tok):
            def body(x, lp):
                return layer_mats(x, lp), None
            x, _ = jax.lax.scan(body, x, params["layers"])
            logits = wo_matmul(x, params["lm_head_q"], params["lm_head_s"])
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return x, tok

        def run(params, x, tok):
            def body(carry, _):
                x, tok = carry
                x, tok = step(params, x, tok)
                # couple steps: embed the token back into x
                x = x + (tok[:, None] % 3).astype(x.dtype) * 1e-6
                return (x, tok), tok
            (x, tok), toks = jax.lax.scan(body, (x, tok), None,
                                          length=args.chunk)
            return x, toks
        return jax.jit(run)

    results = {}
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(B, D)) * 0.1,
                     jnp.bfloat16)
    tok0 = jnp.zeros((B,), jnp.int32)
    fn = mk_wstream()
    # np.asarray, not block_until_ready: through the axon relay the
    # latter returns without waiting (a first cut measured NEGATIVE
    # per-step times after RT correction)
    np.asarray(fn(params, x0, tok0)[1])
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        np.asarray(fn(params, x0, tok0)[1])
        best = min(best, time.perf_counter() - t0)
    per_step = (best - 0.010) / args.chunk
    results["wstream_ms_per_step"] = per_step * 1000
    results["wstream_gbps"] = weight_bytes / per_step / 1e9

    # ---- engine: the real decode chunk at the same dims ----
    from multimeditron_tpu.modalities.image_clip import ImageConfig
    from multimeditron_tpu.models.multimodal import (
        MultimodalConfig, MultimodalModel,
    )
    from multimeditron_tpu.serve.engine import EngineConfig, ServingEngine
    import dataclasses as dc

    img = ImageConfig(
        model_type="meditron_clip", hidden_size=D, clip_name="",
        image_size=224, patch_size=16, vision_hidden_size=768,
        vision_layers=12, vision_heads=12, vision_intermediate_size=3072,
        param_dtype="bfloat16", wire_dtype="uint8",
    )
    stub_llm = dc.replace(cfg, num_layers=1, vocab_size=256)
    stub = MultimodalModel(MultimodalConfig(llm=stub_llm, modalities=[img]))
    mm_params = stub.init_params(jax.random.PRNGKey(1))
    mm_params["llm"] = params
    model = MultimodalModel(MultimodalConfig(llm=cfg, modalities=[img]))
    model.config.eos_token_idx = 1
    engine = ServingEngine(
        model, mm_params,
        EngineConfig(
            max_slots=args.slots, max_seq_len=args.ctx + 64,
            max_new_tokens=48, prefill_buckets=(512,), temperature=0.7,
            decode_chunk=args.chunk, quantize_llm=True,
        ),
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(2, cfg.vocab_size, (1, 512)).astype(np.int32)
    for i in range(args.slots):
        engine.submit({"input_ids": ids, "attention_mask": np.ones_like(ids)},
                      max_new_tokens=48)
    engine._admit()
    decode_fn = engine._get_decode_fn(args.chunk)
    state = engine.state
    state, toks = decode_fn(engine.params, state)  # warm/compile
    np.asarray(toks)
    best_e = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        state, toks = decode_fn(engine.params, state)
        np.asarray(toks)
        best_e = min(best_e, time.perf_counter() - t0)
    results["engine_ms_per_step"] = (best_e - 0.010) / args.chunk * 1000
    results["engine_steady_tok_per_sec"] = (
        args.slots / ((best_e - 0.010) / args.chunk))
    results["attn_sample_other_ms"] = (
        results["engine_ms_per_step"] - results["wstream_ms_per_step"])
    results["weight_gb"] = weight_bytes / 1e9

    # greedy engine: same decode graph minus the categorical sampler —
    # its delta vs the engine number is the sampling marginal in context
    engine_g = ServingEngine(
        model, mm_params,
        EngineConfig(
            max_slots=args.slots, max_seq_len=args.ctx + 64,
            max_new_tokens=48, prefill_buckets=(512,), do_sample=False,
            decode_chunk=args.chunk, quantize_llm=True,
        ),
    )
    for i in range(args.slots):
        engine_g.submit(
            {"input_ids": ids, "attention_mask": np.ones_like(ids)},
            max_new_tokens=48)
    engine_g._admit()
    decode_g = engine_g._get_decode_fn(args.chunk)
    state_g = engine_g.state
    state_g, toks = decode_g(engine_g.params, state_g)
    np.asarray(toks)
    best_g = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        state_g, toks = decode_g(engine_g.params, state_g)
        np.asarray(toks)
        best_g = min(best_g, time.perf_counter() - t0)
    results["engine_greedy_ms_per_step"] = (
        (best_g - 0.010) / args.chunk * 1000)
    results["sampling_marginal_ms"] = (
        results["engine_ms_per_step"]
        - results["engine_greedy_ms_per_step"])

    out = {"metric": "decode_ablate_8b", "slots": B, "chunk": args.chunk,
           **{k: round(v, 2) for k, v in results.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
