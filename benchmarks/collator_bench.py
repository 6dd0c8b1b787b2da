"""Host collation throughput: thread pool vs process pool.

The 2,000 img/s/chip encode target needs the HOST pipeline (JPEG decode,
PIL resize, numpy collation) to keep up. PIL releases the GIL for
decode/resize but tokenization + numpy collation are GIL-bound, and
process mode pays ~20 MB/batch of result pickling — which mode wins is
host-dependent, so measure on the deployment host. Prints images/sec
through the DataLoader for both worker modes.

Usage: python benchmarks/collator_bench.py [--workers 8] [--batches 24]
"""

from __future__ import annotations

import argparse
import io
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--batches", type=int, default=24)
    args = ap.parse_args()

    from PIL import Image

    from multimeditron_tpu.data.chat_template import ChatTemplate
    from multimeditron_tpu.data.collator import DataCollatorForMultimodal
    from multimeditron_tpu.data.loaders import AutoModalityLoader
    from multimeditron_tpu.modalities.image_clip import ImageConfig
    from multimeditron_tpu.models.llama import LlamaConfig
    from multimeditron_tpu.models.multimodal import MultimodalConfig, MultimodalModel
    from multimeditron_tpu.train.data import DataLoader
    from tests.fixtures.toy_tokenizer import ToyTokenizer

    rng = np.random.default_rng(0)

    def jpeg_sample(i: int):
        arr = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
        img = Image.fromarray(arr)
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=85)
        return {
            "conversations": [
                {"role": "user", "content": f"look <|attachment|> sample {i}"},
                {"role": "assistant", "content": f"reply {i}"},
            ],
            "modalities": [{"type": "image", "value": buf.getvalue()}],
        }

    dataset = [jpeg_sample(i) for i in range(args.batch_size * 4)]

    llm = LlamaConfig(vocab_size=32768, hidden_size=256, intermediate_size=512,
                      num_layers=2, num_heads=4, num_kv_heads=2)
    img_cfg = ImageConfig(
        model_type="meditron_clip", hidden_size=256, clip_name="",
        image_size=224, patch_size=14, vision_hidden_size=64,
        vision_layers=1, vision_heads=4, vision_intermediate_size=128,
        param_dtype="float32",
    )
    model = MultimodalModel(MultimodalConfig(llm=llm, modalities=[img_cfg]))
    collator = DataCollatorForMultimodal(
        tokenizer=ToyTokenizer(),
        modality_processors=model.processors(),
        modality_loaders={"image": AutoModalityLoader.create("raw-image")},
        attachment_token="<|attachment|>",
        chat_template=ChatTemplate.llama(),
        pad_to_multiple=64,
        modality_budgets={"image": args.batch_size},
    )

    for mode in ("thread", "process"):
        loader = DataLoader(
            dataset, collator, batch_size=args.batch_size, seed=0,
            num_workers=args.workers, num_epochs=None, worker_mode=mode,
            process_index=0, process_count=1,
        )
        it = iter(loader)
        next(it)  # pipeline warm (and process-pool spawn) outside timing
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.batches):
            batch = next(it)
            n += batch["input_ids"].shape[0]
        dt = time.perf_counter() - t0
        print(f"{mode:8s} x{args.workers}: {n / dt:8.1f} img/s "
              f"({args.batches} batches of {args.batch_size})", flush=True)


if __name__ == "__main__":
    main()
