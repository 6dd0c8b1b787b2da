"""Embedding probes over CLIP towers (the reference's
``scripts/clip_playground/``: ``load_from_clip.py`` encodes a jsonl image
dataset with a dual-encoder CLIP; ``neural_covid_pneu.py`` trains a small
classifier on those embeddings and reports accuracy).

TPU-native: encoding is one jitted scan over fixed-size image batches
through the functional ViT tower (MXU path, bf16), the probe is a linear
head trained full-batch with optax — no sklearn/torch.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


# ----------------------------------------------------------------------
# Encoding
# ----------------------------------------------------------------------
def encode_image_embeddings(params, dual_cfg, images: np.ndarray,
                            batch_size: int = 64) -> np.ndarray:
    """Normalized CLIP image embeddings for (N, H, W, 3) uint8 images.

    Matches the reference's ``encode_img`` (get_image_features + L2
    normalize, ``load_from_clip.py:50-67``): CLS token through the post
    layernorm, visual projection, unit norm.
    """
    import jax
    import jax.numpy as jnp

    from multimeditron_tpu.models.common import layer_norm
    from multimeditron_tpu.models.vit import vit_forward
    from multimeditron_tpu.ops.image_ops import preprocess_images_device

    cfg = dual_cfg.vision

    @jax.jit
    def encode(pixel_uint8):
        px = preprocess_images_device(pixel_uint8, cfg.image_size)
        out = vit_forward(params["vision"], cfg, px, drop_cls=False)
        cls = out[:, 0]
        cls = layer_norm(cls, params["vision"]["post_ln_w"],
                         params["vision"]["post_ln_b"], cfg.layer_norm_eps)
        emb = cls @ params["visual_projection"]
        emb = emb.astype(jnp.float32)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    n = images.shape[0]
    pad = (-n) % batch_size
    if pad:
        images = np.concatenate([images, np.zeros_like(images[:pad])], axis=0)
    chunks = [
        np.asarray(encode(images[i:i + batch_size]))
        for i in range(0, images.shape[0], batch_size)
    ]
    return np.concatenate(chunks, axis=0)[:n]


def load_jsonl_images(jsonl_path: str, dataset_root: str,
                      classes: Sequence[str], image_size: int = 224,
                      image_key: str = "modalities",
                      limit: Optional[int] = None
                      ) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Rows whose serialized form mentions one of ``classes`` (the
    reference's keyword filter, ``neural_covid_pneu.py:46-48``), loaded
    and resized to (N, S, S, 3) uint8 + integer labels."""
    from PIL import Image

    images, labels = [], []
    with open(jsonl_path) as f:
        for line in f:
            if not line.strip():
                continue
            hits = [i for i, c in enumerate(classes) if c in line]
            if len(hits) != 1:
                continue  # ambiguous or unlabeled rows are skipped
            row = json.loads(line)
            path = _first_image_path(row, image_key)
            if path is None:
                continue
            full = path if os.path.isabs(path) else os.path.join(
                dataset_root, path)
            try:
                img = Image.open(full).convert("RGB").resize(
                    (image_size, image_size))
            except Exception:
                logger.warning("skipping unreadable image %s", full)
                continue
            images.append(np.asarray(img, np.uint8))
            labels.append(hits[0])
            if limit and len(images) >= limit:
                break
    if not images:
        raise ValueError(f"no usable rows in {jsonl_path} for {classes}")
    return np.stack(images), np.asarray(labels, np.int32), list(classes)


def _first_image_path(row: dict, image_key: str) -> Optional[str]:
    v = row.get(image_key)
    if isinstance(v, str):
        return v
    if isinstance(v, list):  # reference sample schema: modalities[].value
        for m in v:
            if isinstance(m, dict) and m.get("type") == "image":
                return m.get("value")
    return None


# ----------------------------------------------------------------------
# Linear probe
# ----------------------------------------------------------------------
@dataclasses.dataclass
class ProbeReport:
    train_accuracy: float
    test_accuracy: float
    per_class: Dict[str, float]
    n_train: int
    n_test: int

    def __str__(self) -> str:
        per_class = " ".join(f"{k}={v:.3f}" for k, v in self.per_class.items())
        return (
            f"probe: train_acc={self.train_accuracy:.4f} "
            f"test_acc={self.test_accuracy:.4f} "
            f"(n_train={self.n_train} n_test={self.n_test}) {per_class}"
        )


def train_linear_probe(embeds: np.ndarray, labels: np.ndarray,
                       class_names: Sequence[str], steps: int = 300,
                       lr: float = 1e-2, test_size: float = 0.3,
                       seed: int = 42) -> ProbeReport:
    """Linear classifier on frozen embeddings (the reference trains a tiny
    MLP with torch.optim, ``neural_covid_pneu.py``; a linear head on unit
    embeddings is the standard probe and trains in one jitted loop)."""
    import jax
    import jax.numpy as jnp
    import optax

    n, d = embeds.shape
    c = len(class_names)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_test = max(1, int(n * test_size))
    test_idx, train_idx = perm[:n_test], perm[n_test:]

    xtr = jnp.asarray(embeds[train_idx])
    ytr = jnp.asarray(labels[train_idx])
    w = jnp.zeros((d, c), jnp.float32)
    b = jnp.zeros((c,), jnp.float32)

    tx = optax.adam(lr)

    def loss_fn(p, x, y):
        logits = x @ p[0] + p[1]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    @jax.jit
    def fit(p, opt_state, x, y):
        def body(carry, _):
            p, opt_state = carry
            grads = jax.grad(loss_fn)(p, x, y)
            updates, opt_state = tx.update(grads, opt_state, p)
            return (optax.apply_updates(p, updates), opt_state), None

        (p, opt_state), _ = jax.lax.scan(body, (p, opt_state), None,
                                         length=steps)
        return p

    p = fit((w, b), tx.init((w, b)), xtr, ytr)
    w, b = map(np.asarray, p)

    def acc(idx):
        logits = embeds[idx] @ w + b
        return float((logits.argmax(-1) == labels[idx]).mean())

    per_class = {}
    for i, name in enumerate(class_names):
        mask = labels[test_idx] == i
        if mask.any():
            logits = embeds[test_idx][mask] @ w + b
            per_class[name] = float((logits.argmax(-1) == i).mean())
    return ProbeReport(
        train_accuracy=acc(train_idx),
        test_accuracy=acc(test_idx),
        per_class=per_class,
        n_train=len(train_idx),
        n_test=len(test_idx),
    )
