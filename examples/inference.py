"""Batch-inference smoke script (reference ``inference.py`` parity):
a two-sample batch — one with an image, one text-only — through the
collator and the compiled generate path.

Run:  python examples/inference.py [--config path.yaml]
With no config it builds a tiny randomly-initialized model over the
mock dataset so the full pipeline is exercised offline.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiny_setup():
    import jax
    import jax.numpy as jnp

    from multimeditron_tpu.data.chat_template import ChatTemplate
    from multimeditron_tpu.data.collator import DataCollatorForMultimodal
    from multimeditron_tpu.data.loaders import AutoModalityLoader
    from multimeditron_tpu.modalities.image_clip import ImageConfig
    from multimeditron_tpu.models.llama import LlamaConfig
    from multimeditron_tpu.models.multimodal import MultimodalConfig, MultimodalModel

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "/tests")
    from fixtures.toy_tokenizer import ToyTokenizer

    llm = LlamaConfig(vocab_size=4096, hidden_size=128, intermediate_size=256,
                      num_layers=2, num_heads=4, num_kv_heads=2, dtype=jnp.float32)
    image = ImageConfig(model_type="meditron_clip", hidden_size=128, clip_name="",
                        image_size=32, patch_size=8, vision_hidden_size=64,
                        vision_layers=2, vision_heads=4,
                        vision_intermediate_size=128, param_dtype="float32")
    model = MultimodalModel(MultimodalConfig(llm=llm, modalities=[image]))
    model.config.eos_token_idx = 2
    params = model.init_params(jax.random.PRNGKey(0))
    tok = ToyTokenizer()
    collator = DataCollatorForMultimodal(
        tokenizer=tok,
        modality_processors=model.processors(),
        modality_loaders={"image": AutoModalityLoader.create("fs-image")},
        attachment_token="<|attachment|>",
        chat_template=ChatTemplate.llama(),
        add_generation_prompt=True,
        pad_to_multiple=16,
    )
    return model, params, tok, collator, "<|attachment|>"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--max-new-tokens", type=int, default=16)
    args = parser.parse_args()

    if args.config:
        from multimeditron_tpu.cli.common import load_config
        from multimeditron_tpu.cli.generate import _load_model_and_collator

        cfg = load_config(args.config)
        model, params, tok, collator = _load_model_and_collator(cfg)
        attach = cfg["attachment_token"]
    else:
        model, params, tok, collator, attach = tiny_setup()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    samples = [
        {
            "conversations": [
                {"role": "user", "content": f"{attach} What is shown in this picture?"}
            ],
            "modalities": [
                {"type": "image", "value": os.path.join(repo, "mock_dataset/cat.jpg")}
            ],
        },
        {
            "conversations": [
                {"role": "user", "content": "What are the symptoms of pneumonia?"}
            ],
            "modalities": [],
        },
    ]
    batch = collator(samples)

    from multimeditron_tpu.models.generation import generate

    tokens = generate(model, params, batch, max_new_tokens=args.max_new_tokens,
                      temperature=0.7)
    import numpy as np

    for i, sample in enumerate(samples):
        ids = [int(t) for t in np.asarray(tokens[i])
               if int(t) != model.config.eos_token_idx]
        print(f"--- sample {i} ---")
        print("prompt:", sample["conversations"][0]["content"])
        print("generated:", tok.decode(ids))


if __name__ == "__main__":
    main()
