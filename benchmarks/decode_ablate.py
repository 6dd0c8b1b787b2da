"""Ablate the decode step to find the ~13 ms/step of non-weight time.

Variants of a single slab decode step (chunk=8 scan), 1B model, B=16:
  full        — the real path
  no-write    — skip the KV cache scatter write (attend over stale cache)
  no-attn     — skip attention entirely (out = broadcast of q)
  no-head     — skip the vocab projection/argmax (constant next token)
  matmuls     — ONLY the weight matmuls (no attention, no cache, no head)

Usage: python benchmarks/decode_ablate.py
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
    parser.add_argument("--chunk", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimeditron_tpu.models.common import apply_rope, rms_norm, rope_frequencies
    from multimeditron_tpu.models.llama import (
        LlamaConfig, init_llama_params, init_kv_cache,
    )
    from multimeditron_tpu.ops.attention import attention

    cfg = LlamaConfig(
        vocab_size=32768, hidden_size=args.hidden,
        intermediate_size=int(args.hidden * 2.75),
        num_layers=args.layers, num_heads=16, num_kv_heads=8,
        dtype=jnp.bfloat16,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"model {n_params/1e9:.2f}B; weight bound "
          f"{n_params*2/819e9*1000:.2f} ms/step; B={args.slots} chunk={args.chunk}")

    B, S = args.slots, 1
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    inv_freq = rope_frequencies(Dh, cfg.rope_theta, cfg.rope_scaling)

    def make_decode(variant: str):
        def layer(x, lp, lc, lengths):
            h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
            q = (h @ lp["q_proj"]).reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
            k = (h @ lp["k_proj"]).reshape(B, S, Hkv, Dh).transpose(0, 2, 1, 3)
            v = (h @ lp["v_proj"]).reshape(B, S, Hkv, Dh).transpose(0, 2, 1, 3)
            pos = lengths[:, None] + jnp.arange(S)[None, :]
            q = apply_rope(q, pos, inv_freq)
            k = apply_rope(k, pos, inv_freq)

            new_lc = lc
            if variant in ("full", "no-attn"):
                ck, cv = lc["k"], lc["v"]
                b_idx = jnp.arange(B)[:, None]
                ck = ck.at[b_idx, :, pos, :].set(
                    k.transpose(0, 2, 1, 3).astype(ck.dtype))
                cv = cv.at[b_idx, :, pos, :].set(
                    v.transpose(0, 2, 1, 3).astype(cv.dtype))
                new_lc = {"k": ck, "v": cv}
            else:
                ck, cv = lc["k"], lc["v"]

            if variant in ("full", "no-write", "no-head"):
                kv_mask = (jnp.arange(ck.shape[2])[None, :]
                           < (lengths + S)[:, None]).astype(jnp.int32)
                out = attention(q, ck, cv, kv_mask=kv_mask)
            else:
                out = jnp.broadcast_to(q[:, :Hkv].repeat(2, axis=1), q.shape)
            out = out.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)
            x = x + out @ lp["o_proj"]
            hh = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps)
            gate = jax.nn.silu((hh @ lp["gate_proj"]).astype(jnp.float32))
            up = (hh @ lp["up_proj"]).astype(jnp.float32)
            x = x + ((gate * up).astype(hh.dtype) @ lp["down_proj"])
            return x, new_lc

        def step(params, cache, tokens):
            x = jnp.take(params["embed_tokens"], tokens, axis=0)[:, None, :]
            lengths = cache["length"]

            def body(x, xs):
                lp, lc = xs
                return layer(x, lp, lc, lengths)

            x, new_caches = jax.lax.scan(
                body, x, (params["layers"], {"k": cache["k"], "v": cache["v"]}))
            x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
            if variant in ("no-head", "matmuls"):
                tok = tokens
            else:
                logits = x @ params["lm_head"]
                tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            return {"k": new_caches["k"], "v": new_caches["v"],
                    "length": lengths + 1}, tok

        def decode(params, cache, tokens):
            def body(carry, _):
                cache, tokens = carry
                cache, tokens = step(params, cache, tokens)
                return (cache, tokens), tokens

            (cache, _), toks = jax.lax.scan(
                body, (cache, tokens), None, length=args.chunk)
            return cache, toks

        return jax.jit(decode, donate_argnums=(1,))

    for variant in ("full", "no-write", "no-attn", "no-head", "matmuls"):
        fn = make_decode(variant)
        cache = init_kv_cache(cfg, B, args.seq)
        cache["length"] = jnp.full((B,), 512, jnp.int32)
        state = {"cache": cache, "tokens": jnp.zeros((B,), jnp.int32)}

        def run():
            cache, toks = fn(params, state["cache"], state["tokens"])
            t = np.asarray(toks)
            state["cache"] = cache
            state["tokens"] = jnp.asarray(t[-1] % 32768)

        run()
        t0 = time.perf_counter()
        reps = 4
        for _ in range(reps):
            run()
        dt = (time.perf_counter() - t0) / reps
        print(f"  {variant:9s}: {dt*1000:7.1f} ms/call  "
              f"{dt/args.chunk*1000:6.2f} ms/step")


if __name__ == "__main__":
    main()
