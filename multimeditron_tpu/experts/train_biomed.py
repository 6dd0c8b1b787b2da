"""BiomedCLIP contrastive fine-tuning (reference ``scripts/biomed_train.py``).

The reference script fine-tunes
``microsoft/BiomedCLIP-PubMedBERT_256-vit_base_patch16_224`` on a JSONL /
HF dataset of ``{"modalities": [{"type": "image", "value": path}],
"text": caption}`` rows: 90/10 train/eval split, Adam(lr, betas=(0.9,
0.98), eps=1e-6, weight_decay=0.2), image→text InfoNCE over
``logit_scale * img @ txt.T`` (``biomed_train.py:63-117``), per-epoch
validation loss, and resume-from-output when a model already exists there
(``biomed_train.py:40-44``).

TPU-native rebuild: the timm-style ViT tower from the biomed modality
(CLS pooling + linear projection) paired with the PubMedBERT text tower
(``models/bert_text.py``, CLS pooling + open_clip-style MLP projection),
one jitted train step with donated params/opt-state.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimeditron_tpu.models.bert_text import (
    BertTextConfig,
    bert_text_forward,
    init_bert_text_params,
)
from multimeditron_tpu.models.vit import (
    ViTConfig,
    init_vit_params,
    vit_forward,
)

from multimeditron_tpu.data.image_processing import (
    CLIP_MEAN,
    CLIP_STD,
    preprocess_image,
)

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


@dataclasses.dataclass
class BiomedTrainConfig:
    # reference argparse defaults (biomed_train.py:14-19)
    learning_rate: float = 5e-5
    batch_size: int = 16
    num_epochs: int = 20
    output_dir: str = "output"
    save_model: bool = False
    # model shape (BiomedCLIP: ViT-B/16 @224 + PubMedBERT-base, 512-dim space)
    image_size: int = 224
    embed_dim: int = 512
    max_text_len: int = 256  # context_length=256 (biomed_train.py:79)
    eval_fraction: float = 0.1
    seed: int = 0
    vision: Optional[ViTConfig] = None
    text: Optional[BertTextConfig] = None

    def __post_init__(self):
        if self.vision is None:
            from multimeditron_tpu.modalities.image_biomed import (
                BioMedCLIPImageConfig,
            )

            self.vision = BioMedCLIPImageConfig(
                image_size=self.image_size
            ).vit_config()
        if self.text is None:
            self.text = BertTextConfig()


def init_biomed_dual_params(key: jax.Array, cfg: BiomedTrainConfig) -> Params:
    kv, kt, kp1, kp2, kp3 = jax.random.split(key, 5)
    Dv = cfg.vision.hidden_size
    Dt = cfg.text.hidden_size
    mid = (Dt + cfg.embed_dim) // 2  # open_clip "mlp" text proj

    def dense(k, shape, fan_in):
        return jax.random.normal(k, shape, jnp.float32) / fan_in ** 0.5

    return {
        "vision": init_vit_params(kv, cfg.vision),
        "text": init_bert_text_params(kt, cfg.text),
        "visual_projection": dense(kp1, (Dv, cfg.embed_dim), Dv),
        "text_projection": {
            "fc1": dense(kp2, (Dt, mid), Dt),
            "b1": jnp.zeros((mid,), jnp.float32),
            "fc2": dense(kp3, (mid, cfg.embed_dim), mid),
            "b2": jnp.zeros((cfg.embed_dim,), jnp.float32),
        },
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
    }


def biomed_dual_forward(
    params: Params,
    cfg: BiomedTrainConfig,
    pixel_values: jax.Array,
    input_ids: jax.Array,
    attention_mask: jax.Array,
) -> Dict[str, jax.Array]:
    tokens = vit_forward(params["vision"], cfg.vision, pixel_values, drop_cls=False)
    img = tokens[:, 0] @ params["visual_projection"]  # CLS pooling

    hidden, _ = bert_text_forward(
        params["text"], cfg.text, input_ids, attention_mask
    )
    tp = params["text_projection"]
    h = jax.nn.gelu(hidden[:, 0] @ tp["fc1"] + tp["b1"], approximate=False)
    txt = h @ tp["fc2"] + tp["b2"]

    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * img @ txt.T
    return {
        "image_embeds": img,
        "text_embeds": txt,
        "logits_per_image": logits_per_image,
    }


def biomed_loss(params, cfg, pixel_values, input_ids, attention_mask):
    """Image→text cross-entropy on the diagonal (the reference defines
    symmetric losses but applies only ``loss_img``, biomed_train.py:110-117)."""
    out = biomed_dual_forward(params, cfg, pixel_values, input_ids, attention_mask)
    logits = out["logits_per_image"].astype(jnp.float32)
    labels = jnp.arange(logits.shape[0])
    return jnp.mean(
        -jax.nn.log_softmax(logits, axis=-1)[labels, labels]
    )


class BiomedTrainer:
    def __init__(self, cfg: BiomedTrainConfig, tokenizer, params=None):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.params = params if params is not None else init_biomed_dual_params(
            jax.random.PRNGKey(cfg.seed), cfg
        )
        # Adam exactly as the reference (biomed_train.py:63)
        self.tx = optax.adamw(
            cfg.learning_rate, b1=0.9, b2=0.98, eps=1e-6, weight_decay=0.2
        )
        self.opt_state = self.tx.init(self.params)
        self.epoch = 0

        def step(params, opt_state, pixel_values, input_ids, attention_mask):
            loss, grads = jax.value_and_grad(biomed_loss)(
                params, cfg, pixel_values, input_ids, attention_mask
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_step = jax.jit(step, donate_argnums=(0, 1))
        self._eval_loss = jax.jit(
            lambda p, px, ii, am: biomed_loss(p, cfg, px, ii, am)
        )

    # ------------------------------------------------------------------
    def collate(self, rows: List[Dict[str, Any]], base_dir: str = "") -> Dict[str, np.ndarray]:
        """First image per row + its text, like the reference
        (biomed_train.py:77-80)."""
        from multimeditron_tpu.data.loaders import FileSystemImageLoader

        loader = FileSystemImageLoader(base_path=base_dir)
        pixels, texts = [], []
        for row in rows:
            images = [
                m["value"] for m in row.get("modalities", [])
                if m.get("type") == "image"
            ]
            img = loader.load({"value": images[0], "type": "image"})
            pixels.append(
                preprocess_image(img, self.cfg.image_size, CLIP_MEAN, CLIP_STD)
            )
            texts.append(str(row["text"]))
        ids = np.zeros((len(rows), self.cfg.max_text_len), np.int32)
        mask = np.zeros_like(ids)
        for i, text in enumerate(texts):
            toks = self.tokenizer.encode(text)[: self.cfg.max_text_len]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {
            "pixel_values": np.stack(pixels),
            "input_ids": ids,
            "attention_mask": mask,
        }

    def _batches(self, rows, base_dir, shuffle, rng):
        if not rows:
            return
        order = np.arange(len(rows))
        if shuffle:
            rng.shuffle(order)
        bs = min(self.cfg.batch_size, len(rows))
        for i in range(0, len(order) - bs + 1, bs):
            yield self.collate([rows[int(j)] for j in order[i : i + bs]], base_dir)

    def train(
        self,
        train_rows: List[Dict[str, Any]],
        eval_rows: List[Dict[str, Any]],
        base_dir: str = "",
        num_epochs: Optional[int] = None,
    ) -> Tuple[float, float]:
        """Epoch loop with per-epoch validation loss (biomed_train.py:93-144)."""
        rng = np.random.default_rng(self.cfg.seed)
        train_loss = eval_loss = float("nan")
        for _ in range(num_epochs or self.cfg.num_epochs):
            self.epoch += 1
            total, count = 0.0, 0
            for batch in self._batches(train_rows, base_dir, True, rng):
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state,
                    jnp.asarray(batch["pixel_values"]),
                    jnp.asarray(batch["input_ids"]),
                    jnp.asarray(batch["attention_mask"]),
                )
                total += float(loss)
                count += 1
            train_loss = total / max(count, 1)
            eval_loss = self.evaluate(eval_rows, base_dir)
            logger.info(
                "biomed epoch %d train_loss %.4f eval_loss %.4f",
                self.epoch, train_loss, eval_loss,
            )
        return train_loss, eval_loss

    def evaluate(self, rows, base_dir: str = "") -> float:
        total, count = 0.0, 0
        for batch in self._batches(rows, base_dir, False, np.random.default_rng(0)):
            total += float(self._eval_loss(
                self.params,
                jnp.asarray(batch["pixel_values"]),
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"]),
            ))
            count += 1
        return total / max(count, 1)

    # ------------------------------------------------------------------
    def save(self) -> str:
        from safetensors.flax import save_file

        os.makedirs(self.cfg.output_dir, exist_ok=True)
        flat = {}

        def flatten(prefix, tree):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    flatten(f"{prefix}{k}.", v)
            else:
                flat[prefix[:-1]] = jnp.asarray(tree)

        flatten("", self.params)
        path = os.path.join(self.cfg.output_dir, "model.safetensors")
        save_file(flat, path)
        with open(os.path.join(self.cfg.output_dir, "trainer_state.json"), "w") as f:
            json.dump({"epoch": self.epoch}, f)
        return path

    def maybe_resume(self) -> bool:
        """The reference prefers an existing model in output_dir — "assumed
        to be the better version" (biomed_train.py:38-44)."""
        path = os.path.join(self.cfg.output_dir, "model.safetensors")
        if not os.path.exists(path):
            return False
        from safetensors import safe_open

        flat = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                flat[k] = f.get_tensor(k)

        def unflatten(tree, prefix=""):
            if isinstance(tree, dict):
                return {k: unflatten(v, f"{prefix}{k}.") for k, v in tree.items()}
            return jnp.asarray(flat[prefix[:-1]])

        self.params = unflatten(self.params)
        state = os.path.join(self.cfg.output_dir, "trainer_state.json")
        if os.path.exists(state):
            self.epoch = json.load(open(state)).get("epoch", 0)
        return True


def load_biomed_rows(data_url: str) -> Tuple[List[Dict[str, Any]], str]:
    """JSONL path or HF dataset dir -> (rows, image base dir)
    (biomed_train.py:24-31)."""
    if data_url.endswith(".jsonl"):
        from multimeditron_tpu.utils.jsonl import JSONLGenerator

        return list(JSONLGenerator(data_url)), os.path.dirname(data_url)
    from datasets import load_from_disk

    ds = load_from_disk(data_url)
    if hasattr(ds, "keys") and "train" in ds:
        ds = ds["train"]
    return [ds[i] for i in range(len(ds))], data_url


def split_rows(rows, eval_fraction: float, seed: int = 0):
    """Deterministic 90/10 split (biomed_train.py:54-56)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(rows))
    n_eval = max(1, int(len(rows) * eval_fraction)) if len(rows) > 1 else 0
    eval_idx = set(order[:n_eval].tolist())
    train = [rows[i] for i in range(len(rows)) if i not in eval_idx]
    evals = [rows[i] for i in range(len(rows)) if i in eval_idx]
    return train, evals
