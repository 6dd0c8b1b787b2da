"""Serving benchmark: TTFT + decode throughput through the
continuous-batching engine on a ~1B multimodal model (run on TPU).

Usage: python benchmarks/serve_bench.py [--slots 8] [--new-tokens 64]
Prints per-request TTFT percentiles and aggregate decode tokens/sec.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--slots", type=int, default=8)
    parser.add_argument("--requests", type=int, default=16)
    parser.add_argument("--new-tokens", type=int, default=64)
    parser.add_argument("--prompt-len", type=int, default=512)
    parser.add_argument("--layers", type=int, default=16)
    parser.add_argument("--hidden", type=int, default=2048)
    parser.add_argument("--heads", type=int, default=16)
    parser.add_argument("--kv-heads", type=int, default=8)
    parser.add_argument("--intermediate", type=int, default=0,
                        help="FFN width; 0 = hidden * 2.75")
    parser.add_argument("--vocab", type=int, default=32768)
    parser.add_argument("--init-quantized", action="store_true",
                        help="Init LLM weights directly as int8 ON DEVICE "
                             "(8B scale: a bf16 master copy would not fit "
                             "a 16 GB chip); implies --quantize-llm")
    parser.add_argument("--load-sweep", type=str, default="",
                        help="Comma list of offered request counts (e.g. "
                             "4,8,16,32): after the main sessions, measure "
                             "TTFT at each offered load on the same engine")
    parser.add_argument("--speculative-k", type=int, default=0,
                        help="n-gram speculative decode; greedy unless "
                             "--spec-sample; reports accepted tokens "
                             "per verify step")
    parser.add_argument("--spec-sample", action="store_true",
                        help="speculative decode WITH position-keyed "
                             "sampling (temperature 0.7) instead of "
                             "greedy verify")
    parser.add_argument("--w8a8-prefill", action="store_true",
                        help="int8-activation prefill for the quantized "
                             "LLM (2.5x the bf16-dequant prefill rate; "
                             "implies --quantize-llm)")
    parser.add_argument("--prefill-group-cap", type=int, default=0,
                        help="Staggered admission: at most this many "
                             "requests per batched prefill call, one group "
                             "per engine step (0 = admit everything at "
                             "once, the pre-round-5 behavior)")
    parser.add_argument("--kv-mode", choices=("paged", "slab"), default="paged")
    parser.add_argument("--decode-chunk", type=int, default=8)
    parser.add_argument("--quantize-llm", action="store_true")
    parser.add_argument("--sessions", type=int, default=1,
                        help="Timed sessions; reports the MEDIAN p50/decode "
                             "(dispatch latency through the axon relay varies "
                             "run to run — a single session over/understates)")
    parser.add_argument("--json", action="store_true",
                        help="Print one JSON line instead of text")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimeditron_tpu.modalities.image_clip import ImageConfig
    from multimeditron_tpu.models.llama import LlamaConfig
    from multimeditron_tpu.models.multimodal import MultimodalConfig, MultimodalModel
    from multimeditron_tpu.serve.engine import EngineConfig, ServingEngine

    if args.init_quantized:
        args.quantize_llm = True
    llm = LlamaConfig(
        vocab_size=args.vocab, hidden_size=args.hidden,
        intermediate_size=args.intermediate or int(args.hidden * 2.75),
        num_layers=args.layers, num_heads=args.heads,
        num_kv_heads=args.kv_heads,
        dtype=jnp.bfloat16,
    )
    img = ImageConfig(
        model_type="meditron_clip", hidden_size=args.hidden, clip_name="",
        image_size=224, patch_size=16, vision_hidden_size=768,
        vision_layers=12, vision_heads=12, vision_intermediate_size=3072,
        param_dtype="bfloat16", wire_dtype="uint8",
    )
    model = MultimodalModel(MultimodalConfig(llm=llm, modalities=[img]))
    model.config.eos_token_idx = 1  # never sampled (random model emits junk)
    if args.init_quantized:
        # Towers/projector init from a 1-layer stub (cheap), then the LLM
        # tree is built directly int8 on device — the 8B bf16 master copy
        # (~16 GB) never exists (llama_quant.init_quantized_llama_params).
        import dataclasses

        from multimeditron_tpu.models.llama_quant import (
            init_quantized_llama_params,
        )

        stub_llm = dataclasses.replace(llm, num_layers=1, vocab_size=256)
        stub = MultimodalModel(
            MultimodalConfig(llm=stub_llm, modalities=[img]))
        params = stub.init_params(jax.random.PRNGKey(0))
        params["llm"] = jax.jit(
            lambda k: init_quantized_llama_params(k, llm)
        )(jax.random.PRNGKey(1))
    else:
        params = model.init_params(jax.random.PRNGKey(0))

    engine = ServingEngine(
        model, params,
        EngineConfig(
            max_slots=args.slots,
            max_seq_len=args.prompt_len + args.new_tokens + 64,
            max_new_tokens=args.new_tokens,
            prefill_buckets=(args.prompt_len,),
            temperature=0.7,
            kv_mode=args.kv_mode,
            decode_chunk=args.decode_chunk,
            quantize_llm=args.quantize_llm,
            prefill_group_cap=args.prefill_group_cap or None,
            w8a8_prefill=args.w8a8_prefill,
            speculative_k=args.speculative_k,
            do_sample=(not args.speculative_k) or args.spec_sample,
        ),
    )

    rng = np.random.default_rng(0)
    n_emb = 196

    def make_request(i):
        ids = rng.integers(2, args.vocab, (1, args.prompt_len)).astype(np.int32)
        pos = np.arange(8, 8 + n_emb, dtype=np.int32)
        return {
            "input_ids": ids,
            "attention_mask": np.ones_like(ids),
            "mm_inputs": {
                "image": {
                    "values": rng.integers(0, 256, (1, 224, 224, 3)).astype(np.uint8),
                    "batch_idx": np.zeros((n_emb,), np.int32),
                    "token_pos": pos,
                }
            },
        }

    # warmup/compile: one full round at the same arrival pattern so all
    # batched-prefill and decode-chunk variants are compiled before timing
    warm = [engine.submit(make_request(-1 - i), max_new_tokens=4)
            for i in range(args.requests)]
    engine.run()

    sessions = []
    for s in range(max(1, args.sessions)):
        reqs = [engine.submit(make_request(s * args.requests + i))
                for i in range(args.requests)]
        t0 = time.time()
        # Drive step-by-step so the decode PHASE is timed separately:
        # ``decode_tok_per_sec`` divides by the whole session wall
        # (including prefill), which at 8B is dominated by the ~2 s
        # fleet prefill — steady_decode_tok_per_sec isolates the pure
        # decode steps (queue already empty at entry), the number the
        # weight-stream roofline bounds.
        steady_time = 0.0
        steady_tokens = 0
        while True:
            queue_before = len(engine.queue)
            tok_before = sum(len(r.tokens) for r in reqs)
            ts = time.time()
            more = engine.step()
            dt_step = time.time() - ts
            if queue_before == 0:
                steady_time += dt_step
                steady_tokens += sum(len(r.tokens) for r in reqs) - tok_before
            if not more:
                break
        wall = time.time() - t0
        ttfts = sorted(r.ttft for r in reqs)
        total_tokens = sum(len(r.tokens) for r in reqs)
        prefill_wall = max(r.first_token_time for r in reqs) - t0
        sessions.append({
            "ttft_p50_ms": ttfts[len(ttfts) // 2] * 1000,
            "ttft_p95_ms": ttfts[int(len(ttfts) * 0.95)] * 1000,
            "prefill_wall_ms": prefill_wall * 1000,
            "tok_per_sec": total_tokens / wall,
            "decode_tok_per_sec": (total_tokens - len(reqs)) / wall,
            "steady_decode_tok_per_sec": (
                steady_tokens / steady_time if steady_time > 0 else 0.0),
        })

    # TTFT-vs-offered-load sweep: the <300 ms claim should hold (or degrade
    # gracefully, with queueing visible) when more requests arrive than the
    # engine has slots (sglang-style continuous batching under overload).
    sweep = []
    if args.load_sweep:
        for offered in [int(x) for x in args.load_sweep.split(",") if x]:
            # warm this offered load's batch shapes first: a different
            # arrival count compiles new prefill/decode batch variants,
            # and an un-warmed point times XLA compilation as "TTFT"
            # (7-10 s artifacts in the round-4 full bench).
            warm = [engine.submit(make_request(-20_000 - offered * 100 - i),
                                  max_new_tokens=4)
                    for i in range(offered)]
            engine.run()
            reqs = [engine.submit(make_request(10_000 + offered * 100 + i))
                    for i in range(offered)]
            t0 = time.time()
            engine.run()
            wall = time.time() - t0
            ttfts = sorted(r.ttft for r in reqs)
            total_tokens = sum(len(r.tokens) for r in reqs)
            sweep.append({
                "offered": offered,
                "ttft_p50_ms": round(ttfts[len(ttfts) // 2] * 1000, 1),
                "ttft_p95_ms": round(
                    ttfts[min(len(ttfts) - 1, int(len(ttfts) * 0.95))] * 1000, 1),
                "decode_tok_per_sec": round((total_tokens - len(reqs)) / wall, 1),
            })

    import json as _json

    import numpy as _np

    # rough per-chip parameter count for the metric label
    n_params = (llm.vocab_size * llm.hidden_size
                + llm.num_layers * (
                    llm.hidden_size * (llm.num_heads + 2 * llm.num_kv_heads)
                    * llm.head_dim_
                    + llm.num_heads * llm.head_dim_ * llm.hidden_size
                    + (3 if llm.mlp_gate else 2)
                    * llm.hidden_size * llm.intermediate_size))
    size_tag = f"{n_params / 1e9:.0f}b" if n_params >= 3e9 else "1b"

    median = {k: float(_np.median([s[k] for s in sessions])) for k in sessions[0]}
    spec_extra = {}
    if args.speculative_k and getattr(engine, "spec_slot_steps", 0):
        spec_extra = {
            "speculative_k": args.speculative_k,
            "spec_accept_tokens_per_slot_step": round(
                engine.spec_emitted / engine.spec_slot_steps, 2),
        }
    if args.json:
        record = {
            "metric": f"serve_{size_tag}_multimodal",
            **spec_extra,
            "requests": args.requests, "slots": args.slots,
            "prompt_len": args.prompt_len, "new_tokens": args.new_tokens,
            "sessions": len(sessions),
            **{k: round(v, 1) for k, v in median.items()},
            "per_session": [
                {k: round(v, 1) for k, v in s.items()} for s in sessions
            ],
        }
        if sweep:
            record["load_sweep"] = sweep
        print(_json.dumps(record))
        return
    print(f"requests={args.requests} slots={args.slots} "
          f"prompt={args.prompt_len} new={args.new_tokens} "
          f"sessions={len(sessions)}")
    print(f"TTFT p50={median['ttft_p50_ms']:.0f} ms "
          f"p95={median['ttft_p95_ms']:.0f} ms "
          f"(median of {len(sessions)} sessions, includes queue wait)")
    print(f"aggregate: {median['tok_per_sec']:.0f} tok/s; "
          f"decode-only {median['decode_tok_per_sec']:.0f} tok/s")
    for row in sweep:
        print(f"  load {row['offered']:>3}: TTFT p50={row['ttft_p50_ms']:.0f} "
              f"p95={row['ttft_p95_ms']:.0f} ms, "
              f"decode {row['decode_tok_per_sec']:.0f} tok/s")


if __name__ == "__main__":
    main()
