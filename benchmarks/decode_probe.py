"""Decode-path latency probe: where does serving decode time go?

Measures, on the attached TPU chip, with REAL value fetches per rep
(block_until_ready through remote relays can return before execution
finishes; downloading the result is the only trustworthy sync):

  1. one compiled decode chunk for the serve_bench 1B model:
     slab vs paged-pallas vs paged-xla, at several chunk sizes;
  2. isolated pieces of the paged path: the per-layer KV scatter write
     and the paged attention op alone.

Usage: python benchmarks/decode_probe.py [--slots 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--slots", type=int, default=16)
    parser.add_argument("--layers", type=int, default=16)
    parser.add_argument("--hidden", type=int, default=2048)
    parser.add_argument("--seq", type=int, default=640)
    parser.add_argument("--full", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimeditron_tpu.models.llama import (
        LlamaConfig, init_llama_params, init_kv_cache, init_paged_kv_cache,
        llama_forward,
    )
    from multimeditron_tpu.ops.paged_attention import paged_attention

    cfg = LlamaConfig(
        vocab_size=32768, hidden_size=args.hidden,
        intermediate_size=int(args.hidden * 2.75),
        num_layers=args.layers, num_heads=16, num_kv_heads=8,
        dtype=jnp.bfloat16,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"model: {n_params/1e9:.2f}B params ({n_params*2/1e9:.2f} GB bf16); "
          f"weight-read bound {n_params*2/819e9*1000:.2f} ms/step")

    B = args.slots
    P = 128
    pages_max = -(-args.seq // P)
    Dh = cfg.head_dim_

    def timed(fn, reps=8):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

    def make_cache(paged, ring=8):
        if paged:
            cache = init_paged_kv_cache(
                cfg, 1 + B * pages_max, P, pages_max, B, ring_size=ring)
            pt = np.arange(1, 1 + B * pages_max, dtype=np.int32).reshape(B, pages_max)
            cache["page_table"] = jnp.asarray(pt)
            cache["pages_length"] = jnp.full((B,), 512, jnp.int32)
        else:
            cache = init_kv_cache(cfg, B, args.seq)
        cache["length"] = jnp.full((B,), 512, jnp.int32)
        return cache

    def bench_chunk(mode: str, chunk: int):
        paged = mode.startswith("paged")
        impl = "xla" if mode == "paged-xla" else None
        cache = make_cache(paged, ring=chunk)

        def decode(params, cache, tokens):
            def body(carry, _):
                cache, tokens = carry
                embeds = jnp.take(params["embed_tokens"], tokens, axis=0)[:, None, :]
                logits, cache = llama_forward(
                    params, cfg, inputs_embeds=embeds, kv_cache=cache,
                    page_size=P if paged else None, attn_impl=impl,
                )
                tokens = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                return (cache, tokens), tokens

            (cache, tokens), toks = jax.lax.scan(
                body, (cache, tokens), None, length=chunk)
            if paged:
                # match the engine: fold the chunk's ring into the pages,
                # reset lengths so the donated cache can be re-fed
                from multimeditron_tpu.ops.paged_attention import (
                    fold_ring_into_pages,
                )
                k, v = fold_ring_into_pages(
                    cache["k"], cache["v"], cache["ring_k"], cache["ring_v"],
                    cache["page_table"], cache["pages_length"], chunk,
                )
                cache = {**cache, "k": k, "v": v,
                         "length": cache["length"] - chunk}
            else:
                cache = {**cache, "length": cache["length"] - chunk}
            return cache, toks

        fn = jax.jit(decode, donate_argnums=(1,))
        state = {"cache": cache, "tokens": jnp.zeros((B,), jnp.int32)}

        def run():
            cache, toks = fn(params, state["cache"], state["tokens"])
            t = np.asarray(toks)       # force a real device->host fetch
            state["cache"] = cache
            state["tokens"] = jnp.asarray(t[-1])

        dt = timed(run, reps=max(2, 16 // chunk))
        per_tok = dt / chunk
        print(f"  {mode:11s} chunk={chunk:3d}: {dt*1000:7.1f} ms/call  "
              f"{per_tok*1000:6.2f} ms/step  {B/per_tok:7.0f} tok/s agg")

    print(f"decode chunk timings (B={B} slots, len=512, seq={args.seq}):")
    chunks = (1, 8, 32, 64) if args.full else (1, 8, 32)
    for mode in ("slab", "paged-pallas", "paged-xla"):
        for chunk in chunks:
            bench_chunk(mode, chunk)

    # ---- isolated pieces --------------------------------------------
    from multimeditron_tpu.ops.paged_attention import (
        fold_ring_into_pages, ring_decode_attention,
    )

    print("isolated pieces (ring design):")
    ring = 8
    cache = make_cache(True, ring=ring)
    pt = cache["page_table"]
    lengths = cache["length"]
    pages_len = cache["pages_length"]

    f_fold = jax.jit(
        lambda kp, vp, rk, rv: fold_ring_into_pages(
            kp, vp, rk, rv, pt, pages_len, ring),
        donate_argnums=(0, 1),
    )
    st = {"k": cache["k"], "v": cache["v"]}

    def run_fold():
        k, v = f_fold(st["k"], st["v"], cache["ring_k"], cache["ring_v"])
        st["k"], st["v"] = k, v
        np.asarray(v[0, 0, 0, 0, 0])

    print(f"  ring fold ({ring} rows, all layers): {timed(run_fold)*1000:7.2f} ms")

    q = jnp.zeros((cfg.num_layers, B, cfg.num_heads, Dh), jnp.bfloat16)

    for impl in ("pallas", "xla"):
        def attn_all(q, kp, rk):
            def body(_, xs):
                ql, li = xs
                o = ring_decode_attention(
                    ql, kp, kp, rk, rk, pt, pages_len, lengths, li,
                    impl=impl)
                return None, o

            _, o = jax.lax.scan(
                body, None, (q, jnp.arange(cfg.num_layers, dtype=jnp.int32)))
            return o

        f_attn = jax.jit(attn_all)

        def run_attn():
            np.asarray(
                f_attn(q, st["k"], cache["ring_k"])[0, 0, 0, 0])

        print(f"  ring decode attention ({impl}, all layers): "
              f"{timed(run_attn)*1000:7.2f} ms")


if __name__ == "__main__":
    main()
