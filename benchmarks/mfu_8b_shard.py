"""Measured 8B-scale MFU estimate from a per-chip shard run (VERDICT r3 #3).

Under fsdp=8 (ZeRO-3) every chip executes the FULL 8B layer shapes on its
local batch shard — only the *parameter residency* is sharded (each layer
is all-gathered around its use). So the per-chip compute of the 8B train
step can be measured on ONE chip by running the real trainer with 8B
layer dimensions (hidden 4096, ffn 14336, 32 heads / 8 kv, 128k vocab —
reference scale: ``config_alignment.yaml:32`` + ``deepspeed.json``) but
fewer layers, and extrapolating linearly in layer count:

    t_step(L) = t_fixed + L * t_layer     (embed/lm_head/tower = t_fixed)

Two measured points (L_a, L_b) give the slope and intercept; the 32-layer
step time, tokens/sec and MFU follow. What this measurement cannot see is
the fsdp all-gather traffic; the JSON therefore also reports the analytic
overlap check: per-layer all-gather bytes / ICI bandwidth vs measured
per-layer compute time (overlappable iff ag_ms < compute_ms).

Usage: python benchmarks/mfu_8b_shard.py [--steps 4] [--layers-a 1 --layers-b 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _measure(num_layers: int, args) -> dict:
    import jax
    import jax.numpy as jnp

    from multimeditron_tpu.modalities.image_clip import ImageConfig
    from multimeditron_tpu.models.llama import LlamaConfig
    from multimeditron_tpu.models.multimodal import (
        MultimodalConfig,
        MultimodalModel,
        TrainingMode,
    )
    from multimeditron_tpu.train.trainer import MultimodalTrainer, TrainerConfig

    llm = LlamaConfig(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=num_layers, num_heads=32, num_kv_heads=8,
        dtype=jnp.bfloat16,
    )
    image = ImageConfig(
        model_type="meditron_clip", hidden_size=4096, clip_name="",
        image_size=224, patch_size=14, vision_hidden_size=1024,
        vision_layers=24, vision_heads=16, vision_intermediate_size=4096,
        param_dtype="bfloat16",
    )
    model = MultimodalModel(MultimodalConfig(llm=llm, modalities=[image]))
    params = model.init_params(jax.random.PRNGKey(0))
    cfg = TrainerConfig(
        total_steps=args.steps,
        training_mode=TrainingMode[args.mode],
        remat=True,
        adam_moment_dtype="bfloat16",
        output_dir="/tmp/mmt_mfu8b",
    )
    trainer = MultimodalTrainer(model, params, cfg)

    B, S = args.batch, args.seq
    n_emb = model.modalities["image"].num_embeddings
    rng = np.random.default_rng(0)
    token_pos = np.concatenate(
        [np.arange(4, 4 + n_emb) for _ in range(B)]).astype(np.int32)
    batch_idx = np.repeat(np.arange(B), n_emb).astype(np.int32)
    ids = rng.integers(0, llm.vocab_size, (B, S))
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(ids, jnp.int32),
        "mm_inputs": {"image": {
            "values": jnp.asarray(rng.normal(size=(B, 224, 224, 3)),
                                  jnp.float32),
            "batch_idx": jnp.asarray(batch_idx),
            "token_pos": jnp.asarray(token_pos),
        }},
    }

    m = trainer.train_step(batch)   # warmup/compile
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        m = trainer.train_step(batch)
    float(m["loss"])  # sync
    dt = (time.perf_counter() - t0) / args.steps

    n_llm_layer = sum(
        x.size for k, x in params["llm"]["layers"].items()) // num_layers
    n_fixed = (sum(x.size for x in jax.tree.leaves(params))
               - n_llm_layer * num_layers)
    return {"layers": num_layers, "step_s": dt,
            "n_llm_layer": n_llm_layer, "n_fixed": n_fixed}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1,
                    help="per-chip batch (deepspeed.json trains at 4 per "
                         "GPU with accumulation; 1 is the fsdp=8 memory fit)")
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--mode", default="END2END")
    ap.add_argument("--layers-a", type=int, default=1)
    ap.add_argument("--layers-b", type=int, default=3)
    ap.add_argument("--target-layers", type=int, default=32)
    ap.add_argument("--fsdp", type=int, default=8)
    args = ap.parse_args()

    from multimeditron_tpu.profiling import ThroughputMeter

    a = _measure(args.layers_a, args)
    b = _measure(args.layers_b, args)

    t_layer = (b["step_s"] - a["step_s"]) / (b["layers"] - a["layers"])
    t_fixed = a["step_s"] - a["layers"] * t_layer
    t_8b = t_fixed + args.target_layers * t_layer
    tokens_per_sec = args.batch * args.seq / t_8b

    n_total = a["n_fixed"] + args.target_layers * a["n_llm_layer"]
    # END2END trains llm + projector (the tower stays frozen) — close
    # enough to all-trainable at this scale for the 4N+2N accounting.
    meter = ThroughputMeter(num_params=n_total, num_params_trainable=n_total)
    mfu = tokens_per_sec * meter.flops_per_token / meter.peak

    # fsdp all-gather overlap check (analytic: v5e ICI ~45 GB/s/dir x 2
    # directions usable for the ring all-gather; each chip must ingest
    # (fsdp-1)/fsdp of every layer's bf16 bytes while computing it).
    layer_bytes = a["n_llm_layer"] * 2
    ici_gbps = 90e9
    ag_ms = layer_bytes * (args.fsdp - 1) / args.fsdp / ici_gbps * 1e3

    print(json.dumps({
        "metric": "sft_mfu_8b_shard_est",
        "model_b": round(n_total / 1e9, 2),
        "batch": args.batch, "seq": args.seq, "mode": args.mode,
        "measured": [{"layers": x["layers"],
                      "step_ms": round(x["step_s"] * 1e3, 1)}
                     for x in (a, b)],
        "per_layer_ms": round(t_layer * 1e3, 2),
        "fixed_ms": round(t_fixed * 1e3, 1),
        "est_step_ms_32l": round(t_8b * 1e3, 1),
        "tokens_per_sec_per_chip": round(tokens_per_sec, 1),
        "mfu_est": round(mfu, 4),
        "ag_ms_per_layer": round(ag_ms, 2),
        "ag_overlappable": bool(ag_ms < t_layer * 1e3),
    }))


if __name__ == "__main__":
    main()
