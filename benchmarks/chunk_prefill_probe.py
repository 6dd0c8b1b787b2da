"""Long-prompt (beyond-largest-bucket) chunked-prefill TTFT, paged mode.

VERDICT r2 item 8: the round-2 paged chunked prefill gathered the slot's
whole page allotment into a slab and scattered it back on EVERY chunk —
O(max_seq_len) HBM traffic per chunk. The round-3 design keeps a
persistent slab across chunks (donated through each call) and folds the
finished prompt's KV into the page pool once.

Run on TPU from the repo root (PYTHONPATH=/root/.axon_site:/root/repo):
    python benchmarks/chunk_prefill_probe.py [--prompt-len 1536]

To reproduce the BEFORE number, run the same command from a worktree at
the pre-slab commit (git worktree add /tmp/before <rev>).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt-len", type=int, default=1536,
                    help="prompt tokens; > largest bucket (512) forces "
                         "the chunked path (default = 3 chunks)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from multimeditron_tpu.models.llama import LlamaConfig
    from multimeditron_tpu.models.multimodal import (
        MultimodalConfig, MultimodalModel,
    )
    from multimeditron_tpu.serve.engine import EngineConfig, ServingEngine
    import jax

    plen = args.prompt_len
    llm = LlamaConfig(
        vocab_size=32768, hidden_size=2048, intermediate_size=5632,
        num_layers=16, num_heads=16, num_kv_heads=8, dtype=jnp.bfloat16,
    )
    model = MultimodalModel(MultimodalConfig(llm=llm, modalities=[]))
    model.config.eos_token_idx = 1
    params = model.init_params(jax.random.PRNGKey(0))

    engine = ServingEngine(
        model, params,
        EngineConfig(max_slots=4, max_seq_len=plen + 128, max_new_tokens=8,
                     prefill_buckets=(512,), kv_mode="paged"),
    )

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 32768, (1, plen)).astype(np.int32)
    mask = np.ones_like(ids)

    def one_request():
        req = engine.submit(
            {"input_ids": ids, "attention_mask": mask},
            max_new_tokens=2,
        )
        t0 = time.time()
        while req.first_token_time is None:
            engine.step()
        ttft = (time.time() - t0) * 1000
        engine.run()
        return ttft

    one_request()  # compile chunk variants
    best = min(one_request() for _ in range(args.reps))
    n_chunks = -(-plen // 512)
    print(f"chunked prefill  plen={plen} ({n_chunks} chunks of 512, paged) "
          f"TTFT {best:7.1f} ms  ({best / n_chunks:.1f} ms/chunk)")


if __name__ == "__main__":
    main()
