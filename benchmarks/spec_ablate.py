"""Attribute the speculative verify step at 8B dims (run on TPU).

The paged verify step measures ~44 ms against the plain decode step's
~15.4 — this probe times ablated builds of the REAL spec decode fn in
one process (engine fn cache cleared + module attrs patched between
builds):

  plain       — the engine's plain decode chunk (per step)
  spec        — the real verify chunk (per step)
  spec_nofold — fold_ring_into_pages stubbed to identity
  spec_noattn — ring_verify_attention_xla stubbed to a q-passthrough
                (kills the page gather + multi-query attention)

Usage: python benchmarks/spec_ablate.py [--json]
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
    parser.add_argument("--chunk", type=int, default=8)
    parser.add_argument("--k", type=int, default=4)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--json", action="store_true")
    args = parser.parse_args()

    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    import multimeditron_tpu.ops.paged_attention as pa
    from multimeditron_tpu.modalities.image_clip import ImageConfig
    from multimeditron_tpu.models.llama import LlamaConfig
    from multimeditron_tpu.models.llama_quant import (
        init_quantized_llama_params,
    )
    from multimeditron_tpu.models.multimodal import (
        MultimodalConfig, MultimodalModel,
    )
    from multimeditron_tpu.serve.engine import EngineConfig, ServingEngine

    cfg = LlamaConfig(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, dtype=jnp.bfloat16,
    )
    img = ImageConfig(
        model_type="meditron_clip", hidden_size=4096, clip_name="",
        image_size=224, patch_size=16, vision_hidden_size=768,
        vision_layers=12, vision_heads=12, vision_intermediate_size=3072,
        param_dtype="bfloat16", wire_dtype="uint8",
    )
    stub_llm = dc.replace(cfg, num_layers=1, vocab_size=256)
    stub = MultimodalModel(MultimodalConfig(llm=stub_llm, modalities=[img]))
    params = stub.init_params(jax.random.PRNGKey(1))
    params["llm"] = jax.jit(
        lambda key: init_quantized_llama_params(key, cfg))(
        jax.random.PRNGKey(0))
    model = MultimodalModel(MultimodalConfig(llm=cfg, modalities=[img]))
    model.config.eos_token_idx = 1
    engine = ServingEngine(
        model, params,
        EngineConfig(
            max_slots=args.slots, max_seq_len=640, max_new_tokens=600,
            prefill_buckets=(512,), do_sample=False,
            decode_chunk=args.chunk, quantize_llm=True,
            speculative_k=args.k,
        ),
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(2, cfg.vocab_size, (1, 512)).astype(np.int32)
    for i in range(args.slots):
        engine.submit({"input_ids": ids, "attention_mask": np.ones_like(ids)},
                      max_new_tokens=600)
    engine._admit()

    results = {}

    def timed(label, fn, state):
        state, out = fn(engine.params, state)  # warm/compile
        jax.tree.map(lambda _: None, out)
        np.asarray(jax.tree.leaves(out)[0])
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, out = fn(engine.params, state)
            np.asarray(jax.tree.leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        results[label] = (best - 0.010) / args.chunk * 1000
        return state

    state = engine.state
    state = timed("plain_ms_per_step",
                  engine._get_decode_fn(args.chunk), state)

    real_fold = pa.fold_ring_into_pages
    real_attn = pa.ring_verify_attention_xla

    state = timed("spec_ms_per_step",
                  engine._build_spec_decode_fn(args.chunk), state)

    pa.fold_ring_into_pages = (
        lambda k, v, rk, rv, pt, pl_, rows, lengths=None, **kw: (k, v))
    state = timed("spec_nofold_ms_per_step",
                  engine._build_spec_decode_fn(args.chunk), state)
    pa.fold_ring_into_pages = real_fold

    def fake_attn(q, *a, **kw):
        return q

    pa.ring_verify_attention_xla = fake_attn
    state = timed("spec_noattn_ms_per_step",
                  engine._build_spec_decode_fn(args.chunk), state)
    pa.ring_verify_attention_xla = real_attn

    results["fold_marginal_ms"] = (results["spec_ms_per_step"]
                                   - results["spec_nofold_ms_per_step"])
    results["attn_marginal_ms"] = (results["spec_ms_per_step"]
                                   - results["spec_noattn_ms_per_step"])
    out = {"metric": "spec_ablate_8b", "k": args.k, "chunk": args.chunk,
           **{kk: round(vv, 2) for kk, vv in results.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
