"""Per-specialty expert CLIP training: contrastive dual-encoder fine-tuning.

Capability parity with the reference's expert trainer
(``experts/train_clip.py``, 620 LoC around HF Trainer +
VisionTextDualEncoderModel): weighted dataset mixtures via
``interleave_datasets`` (reference :250-323), corrupt-image filtering
(:495-510), checkpoint auto-resume (:379-398), contrastive
(symmetric InfoNCE) objective — re-built on the jitted JAX dual encoder.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimeditron_tpu.data.image_processing import CLIP_MEAN, CLIP_STD, preprocess_image
from multimeditron_tpu.models.clip_text import (
    CLIPDualConfig,
    CLIPTextConfig,
    clip_contrastive_loss,
    clip_dual_forward,
    init_clip_dual_params,
)
from multimeditron_tpu.models.vit import ViTConfig

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ExpertTrainConfig:
    # towers (defaults: small; override from HF config dicts for real runs)
    image_size: int = 224
    patch_size: int = 32
    vision_hidden_size: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vision_intermediate_size: int = 3072
    text_vocab_size: int = 49408
    text_hidden_size: int = 512
    text_layers: int = 12
    text_heads: int = 8
    text_intermediate_size: int = 2048
    projection_dim: int = 512
    max_text_len: int = 77
    # data
    image_column: str = "image"
    caption_column: str = "caption"
    # optimization
    learning_rate: float = 5e-5
    weight_decay: float = 0.1
    batch_size: int = 64
    num_steps: int = 1000
    warmup_steps: int = 0
    freeze_vision: bool = False
    freeze_text: bool = False
    output_dir: str = "expert_out"
    save_every: int = 500
    seed: int = 0

    def dual_config(self) -> CLIPDualConfig:
        return CLIPDualConfig(
            vision=ViTConfig(
                image_size=self.image_size,
                patch_size=self.patch_size,
                hidden_size=self.vision_hidden_size,
                num_layers=self.vision_layers,
                num_heads=self.vision_heads,
                intermediate_size=self.vision_intermediate_size,
            ),
            text=CLIPTextConfig(
                vocab_size=self.text_vocab_size,
                hidden_size=self.text_hidden_size,
                num_layers=self.text_layers,
                num_heads=self.text_heads,
                intermediate_size=self.text_intermediate_size,
                max_positions=self.max_text_len,
            ),
            projection_dim=self.projection_dim,
        )


def get_combined_dataset(dataset_specs: List[Dict[str, Any]], seed: int = 0):
    """Weighted mixture via interleave_datasets (reference
    ``get_combined_dataset``, ``train_clip.py:250-323``)."""
    from datasets import interleave_datasets, load_dataset, load_from_disk

    parts, weights = [], []
    for spec in dataset_specs:
        path = spec["path"]
        if os.path.isdir(path) and os.path.exists(os.path.join(path, "state.json")):
            ds = load_from_disk(path)
        elif path.endswith(".parquet"):
            ds = load_dataset("parquet", data_files=path)["train"]
        else:
            ds = load_dataset(path)[spec.get("split", "train")]
        parts.append(ds)
        weights.append(float(spec.get("weight", 1.0)))
    if len(parts) == 1:
        return parts[0]
    total = sum(weights)
    return interleave_datasets(
        parts, probabilities=[w / total for w in weights], seed=seed,
        stopping_strategy="all_exhausted",
    )


def filter_corrupt_images(ds, image_column: str, num_proc: int = 0):
    """Drop rows whose image fails to decode (reference :495-510)."""

    def ok(row):
        try:
            from multimeditron_tpu.data.loaders import RawImageLoader

            RawImageLoader().load({"value": row[image_column], "type": "image"})
            return True
        except Exception:
            return False

    return ds.filter(ok, num_proc=num_proc or None)


class ExpertCLIPTrainer:
    def __init__(self, cfg: ExpertTrainConfig, tokenizer, params=None):
        self.cfg = cfg
        self.dual_cfg = cfg.dual_config()
        self.tokenizer = tokenizer
        key = jax.random.PRNGKey(cfg.seed)
        self.params = params if params is not None else init_clip_dual_params(
            key, self.dual_cfg
        )

        mask = {
            "vision": jax.tree.map(lambda _: not cfg.freeze_vision, self.params["vision"]),
            "text": jax.tree.map(lambda _: not cfg.freeze_text, self.params["text"]),
            "visual_projection": True,
            "text_projection": True,
            "logit_scale": True,
        }
        schedule = optax.warmup_cosine_decay_schedule(
            0.0 if cfg.warmup_steps else cfg.learning_rate,
            cfg.learning_rate, cfg.warmup_steps, max(cfg.num_steps, 1),
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.masked(optax.adamw(schedule, weight_decay=cfg.weight_decay), mask),
        )
        self.opt_state = self.tx.init(self.params)
        self.step = 0
        self._mask = mask
        self._train_step = jax.jit(self._make_step(), donate_argnums=(0, 1))

    def _make_step(self):
        dual_cfg, mask = self.dual_cfg, self._mask

        def loss_fn(params, pixel_values, input_ids, attention_mask):
            p = jax.tree.map(
                lambda x, m: x if m else jax.lax.stop_gradient(x), params, mask
            )
            out = clip_dual_forward(p, dual_cfg, pixel_values, input_ids, attention_mask)
            return clip_contrastive_loss(out["logits_per_text"])

        def step(params, opt_state, pixel_values, input_ids, attention_mask):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, pixel_values, input_ids, attention_mask
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    # ------------------------------------------------------------------
    def collate(self, rows: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        from multimeditron_tpu.data.loaders import RawImageLoader

        loader = RawImageLoader()
        pixels, texts = [], []
        for row in rows:
            img = loader.load({"value": row[self.cfg.image_column], "type": "image"})
            pixels.append(
                preprocess_image(img, self.cfg.image_size, CLIP_MEAN, CLIP_STD)
            )
            texts.append(str(row[self.cfg.caption_column]))
        ids = np.zeros((len(rows), self.cfg.max_text_len), np.int32)
        mask = np.zeros_like(ids)
        for i, text in enumerate(texts):
            toks = self.tokenizer.encode(text)[: self.cfg.max_text_len - 1]
            toks = toks + [self.tokenizer.eos_id]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {
            "pixel_values": np.stack(pixels),
            "input_ids": ids,
            "attention_mask": mask,
        }

    def train(self, dataset, num_steps: Optional[int] = None) -> float:
        num_steps = num_steps or self.cfg.num_steps
        rng = np.random.default_rng(self.cfg.seed)
        n = len(dataset)
        loss = float("nan")
        while self.step < num_steps:
            idx = rng.choice(n, size=min(self.cfg.batch_size, n), replace=False)
            batch = self.collate([dataset[int(i)] for i in idx])
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state,
                jnp.asarray(batch["pixel_values"]),
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"]),
            )
            self.step += 1
            if self.step % 10 == 0 or self.step == num_steps:
                logger.info("expert step %d loss %.4f", self.step, float(loss))
            if self.cfg.save_every and self.step % self.cfg.save_every == 0:
                self.save()
        self.save()
        return float(loss)

    # ------------------------------------------------------------------
    def save(self) -> str:
        from safetensors.flax import save_file

        out = os.path.join(self.cfg.output_dir, f"checkpoint-{self.step}")
        os.makedirs(out, exist_ok=True)
        flat = {}

        def flatten(prefix, tree):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    flatten(f"{prefix}{k}.", v)
            else:
                flat[prefix[:-1]] = jnp.asarray(tree)

        flatten("", self.params)
        save_file(flat, os.path.join(out, "model.safetensors"))
        with open(os.path.join(out, "trainer_state.json"), "w") as f:
            json.dump({"step": self.step}, f)
        return out

    @staticmethod
    def latest_checkpoint(output_dir: str) -> Optional[str]:
        """Auto-resume discovery (reference ``train_clip.py:379-398``)."""
        if not os.path.isdir(output_dir):
            return None
        ckpts = [
            d for d in os.listdir(output_dir)
            if d.startswith("checkpoint-") and d.split("-")[-1].isdigit()
        ]
        if not ckpts:
            return None
        latest = max(ckpts, key=lambda d: int(d.split("-")[-1]))
        return os.path.join(output_dir, latest)

    def resume(self, ckpt_dir: str) -> None:
        from safetensors import safe_open

        flat = {}
        with safe_open(os.path.join(ckpt_dir, "model.safetensors"), framework="np") as f:
            for k in f.keys():
                flat[k] = f.get_tensor(k)

        def unflatten(tree, prefix=""):
            if isinstance(tree, dict):
                return {k: unflatten(v, f"{prefix}{k}.") for k, v in tree.items()}
            return jnp.asarray(flat[prefix[:-1]])

        self.params = unflatten(self.params)
        state_path = os.path.join(ckpt_dir, "trainer_state.json")
        if os.path.exists(state_path):
            self.step = json.load(open(state_path))["step"]
