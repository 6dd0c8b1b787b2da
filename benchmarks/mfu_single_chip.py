"""Measured single-chip MFU for multimodal SFT (round-1 VERDICT #4).

Runs the real trainer train step (masked AdamW, remat, collator-shaped
batch with spliced images) on the attached TPU for a ~2B Llama + CLIP-L
tower — the largest configuration that also fits a 16 GB v5e chip with
bf16 params + bf16 Adam moments — and reports tokens/sec and MFU with
the corrected total-FLOPs accounting (4*N_total + 2*N_trainable per
token; reference scale story: config_alignment.yaml + deepspeed.json).

Usage:  python benchmarks/mfu_single_chip.py [--steps 8] [--batch 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--mode", default="END2END")
    ap.add_argument("--quantize-frozen-towers", action="store_true",
                    help="Route the frozen CLIP tower through the fused "
                         "W8A8 Pallas path (TrainerConfig option; legal "
                         "for modes that freeze the embedder)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimeditron_tpu.modalities.image_clip import ImageConfig
    from multimeditron_tpu.models.llama import LlamaConfig
    from multimeditron_tpu.models.multimodal import (
        MultimodalConfig,
        MultimodalModel,
        TrainingMode,
    )
    from multimeditron_tpu.profiling import ThroughputMeter
    from multimeditron_tpu.train.trainer import MultimodalTrainer, TrainerConfig

    # Largest config that fits the 15.75 GB v5e HBM with bf16 params +
    # bf16 Adam moments + grads + remat activations (a 2.4B config
    # compiles to 17.9 GB and is rejected by the XLA TPU compiler).
    llm = LlamaConfig(
        vocab_size=32064,
        hidden_size=2048,
        intermediate_size=5632,
        num_layers=22,
        num_heads=16,
        num_kv_heads=8,
        dtype=jnp.bfloat16,
    )
    image = ImageConfig(
        model_type="meditron_clip", hidden_size=2048, clip_name="",
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
        quantize_frozen_towers=args.quantize_frozen_towers,
        output_dir="/tmp/mmt_mfu",
    )
    trainer = MultimodalTrainer(model, params, cfg)

    n_total = sum(x.size for x in jax.tree.leaves(trainer.params))
    n_train = sum(
        x.size for x, m in zip(jax.tree.leaves(trainer.params),
                               jax.tree.leaves(trainer.trainable_mask)) if m)

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

    # warmup / compile
    m = trainer.train_step(batch)
    float(m["loss"])

    meter = ThroughputMeter(num_params=n_total, num_params_trainable=n_train)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        m = trainer.train_step(batch)
    loss = float(m["loss"])  # sync
    dt = time.perf_counter() - t0
    tps = args.steps * B * S / dt
    mfu = tps * meter.flops_per_token / meter.peak
    print(json.dumps({
        "metric": "sft_single_chip_mfu",
        "model_b": round(n_total / 1e9, 2),
        "trainable_b": round(n_train / 1e9, 2),
        "batch": B, "seq": S, "mode": args.mode,
        "step_ms": round(dt / args.steps * 1e3, 1),
        "tokens_per_sec": round(tps, 1),
        # bf16-equivalent MFU: with --quantize-frozen-towers the tower's
        # FLOPs execute as int8, so this can legitimately exceed the bf16
        # fraction — read tokens_per_sec / step_ms for the speedup.
        "mfu": round(mfu, 4),
        "quantize_frozen_towers": args.quantize_frozen_towers,
        "loss": round(loss, 4),
    }))


if __name__ == "__main__":
    main()
