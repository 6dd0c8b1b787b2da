"""Break the serving TTFT into parts (run on TPU).

TTFT at full admission = one grouped prefill call. This probe times, for
the serve_bench model/shape (1B LLM, 16x512-token prompts, one 224px
image each):
  1. host->device upload of the group's arrays (ids/mask/images)
  2. image encode (tower + projector) alone
  3. full LLM prefill forward alone (no cache writeback)
  4. the engine's actual compiled prefill fn (everything incl. the page
     scatter + in-graph sampling + state scatter)
Each timed with the device synced before/after; min of 3.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best * 1000


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimeditron_tpu.modalities.image_clip import ImageConfig
    from multimeditron_tpu.models.llama import (
        LlamaConfig, init_kv_cache, llama_forward,
    )
    from multimeditron_tpu.models.multimodal import (
        MultimodalConfig, MultimodalModel,
    )
    from multimeditron_tpu.serve.engine import EngineConfig, ServingEngine

    n, bucket = 16, 512
    llm = LlamaConfig(
        vocab_size=32768, hidden_size=2048, intermediate_size=5632,
        num_layers=16, num_heads=16, num_kv_heads=8, dtype=jnp.bfloat16,
    )
    img = ImageConfig(
        model_type="meditron_clip", hidden_size=2048, clip_name="",
        image_size=224, patch_size=16, vision_hidden_size=768,
        vision_layers=12, vision_heads=12, vision_intermediate_size=3072,
        param_dtype="bfloat16", wire_dtype="uint8",
    )
    model = MultimodalModel(MultimodalConfig(llm=llm, modalities=[img]))
    model.config.eos_token_idx = 1
    params = model.init_params(jax.random.PRNGKey(0))

    engine = ServingEngine(
        model, params,
        EngineConfig(max_slots=n, max_seq_len=bucket + 128,
                     max_new_tokens=64, prefill_buckets=(bucket,),
                     kv_mode="paged"),
    )

    rng = np.random.default_rng(0)
    n_emb = 196
    ids_np = rng.integers(2, 32768, (n, bucket)).astype(np.int32)
    mask_np = np.ones_like(ids_np)
    imgs_np = rng.integers(0, 256, (n, 224, 224, 3)).astype(np.uint8)
    bi_np = np.repeat(np.arange(n, dtype=np.int32), n_emb)
    tp_np = np.tile(np.arange(8, 8 + n_emb, dtype=np.int32), n)

    # NOTE: on the axon relay block_until_ready does NOT sync; every
    # timing below forces completion by downloading a scalar reduction.
    probe = jax.jit(lambda a: a.astype(jnp.float32).sum())

    def sync(x):
        return float(probe(x))

    def upload():
        arrs = [jnp.asarray(ids_np), jnp.asarray(mask_np),
                jnp.asarray(imgs_np), jnp.asarray(bi_np), jnp.asarray(tp_np)]
        sync(arrs[2])  # the big one
        return arrs

    ids, mask, imgs, bi, tp = upload()
    sync(ids)
    t_upload = timed(upload)

    mm = {"image": {"values": imgs, "batch_idx": bi, "token_pos": tp}}

    embed = jax.jit(lambda p, i, m: model.embed(p, i, m))
    sync(embed(params, ids, mm))
    t_embed = timed(lambda: sync(embed(params, ids, mm)))

    def fwd(p, e, msk):
        local = init_kv_cache(llm, n, bucket, dtype=jnp.bfloat16)
        logits, local = llama_forward(
            p["llm"], llm, inputs_embeds=e, attention_mask=msk,
            kv_cache=local, prefill=True)
        return logits

    fwd_j = jax.jit(fwd)
    e = embed(params, ids, mm)
    sync(fwd_j(params, e, mask))
    t_fwd = timed(lambda: sync(fwd_j(params, e, mask)))

    # the engine's real prefill (group of n) via submit/warmup
    def make_request(i):
        return {
            "input_ids": ids_np[i:i + 1],
            "attention_mask": mask_np[i:i + 1],
            "mm_inputs": {"image": {
                "values": imgs_np[i:i + 1],
                "batch_idx": np.zeros((n_emb,), np.int32),
                "token_pos": tp_np[:n_emb],
            }},
        }

    reqs = [engine.submit(make_request(i), max_new_tokens=2) for i in range(n)]
    engine.run()  # compiles prefill + decode variants

    def grouped_prefill():
        rs = [engine.submit(make_request(i), max_new_tokens=2)
              for i in range(n)]
        t0 = time.time()
        engine.step()  # one _admit -> one grouped prefill
        dt = time.time() - t0
        engine.run()
        return dt

    t_engine = min(grouped_prefill() for _ in range(3)) * 1000

    print(f"group n={n} bucket={bucket} (+1 image/request)")
    print(f"upload        {t_upload:7.1f} ms  "
          f"({(ids_np.nbytes + mask_np.nbytes + imgs_np.nbytes) / 1e6:.1f} MB)")
    print(f"image encode  {t_embed:7.1f} ms")
    print(f"llm prefill   {t_fwd:7.1f} ms  (forward only)")
    print(f"engine call   {t_engine:7.1f} ms  (encode+prefill+scatter+sample)")


if __name__ == "__main__":
    main()
