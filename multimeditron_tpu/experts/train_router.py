"""Gating-router training: ResNet classifier over labeled specialty images.

Capability parity with the reference's router trainer
(``scripts/image_router_train.py``: ResNet18/34/50 classification) —
trains the :class:`GatingNetwork` with cross-entropy and saves it in the
reference-compatible format so the MoE modalities load it via
``gating_path``.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimeditron_tpu.data.image_processing import CLIP_MEAN, CLIP_STD, preprocess_image
from multimeditron_tpu.modalities.moe.gating import GatingNetwork, GatingNetworkConfig
from multimeditron_tpu.models.resnet import resnet_forward

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class RouterTrainConfig:
    class_names: List[str] = dataclasses.field(default_factory=list)
    resnet_depth: int = 50
    image_size: int = 224
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    batch_size: int = 64
    num_steps: int = 1000
    top_k: int = 1
    output_dir: str = "router_out"
    image_column: str = "image"
    label_column: str = "label"
    seed: int = 0


class RouterTrainer:
    def __init__(self, cfg: RouterTrainConfig):
        self.cfg = cfg
        self.net = GatingNetwork(
            GatingNetworkConfig(
                num_classes=len(cfg.class_names),
                top_k=cfg.top_k,
                class_names=cfg.class_names,
                resnet_depth=cfg.resnet_depth,
            )
        )
        self.params = self.net.init(jax.random.PRNGKey(cfg.seed))
        self.tx = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
        self.opt_state = self.tx.init(self.params["resnet"])
        self.step = 0
        self._train_step = jax.jit(self._make_step(), donate_argnums=(0, 1, 2))

    def _make_step(self):
        resnet_cfg = self.net.resnet_cfg

        def loss_fn(resnet_params, bn_state, pixels, labels):
            logits, new_state = resnet_forward(
                resnet_params, bn_state, resnet_cfg, pixels, train=True
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            return loss, (new_state, acc)

        def step(resnet_params, opt_state, bn_state, pixels, labels):
            (loss, (new_state, acc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(resnet_params, bn_state, pixels, labels)
            updates, opt_state = self.tx.update(grads, opt_state, resnet_params)
            resnet_params = optax.apply_updates(resnet_params, updates)
            return resnet_params, opt_state, new_state, loss, acc

        return step

    def collate(self, rows: List[Dict[str, Any]]):
        from multimeditron_tpu.data.loaders import (
            FileSystemImageLoader,
            RawImageLoader,
        )

        raw, fs = RawImageLoader(), FileSystemImageLoader()

        def load(value):
            # string values are filesystem paths (ImageFolder flows,
            # notebooks/selector/fine-tuning.py); everything else is an
            # in-memory image/bytes
            loader = fs if isinstance(value, str) else raw
            return loader.load({"value": value, "type": "image"})

        pixels = [
            preprocess_image(
                load(r[self.cfg.image_column]),
                self.cfg.image_size, CLIP_MEAN, CLIP_STD,
            )
            for r in rows
        ]
        labels = [
            r[self.cfg.label_column]
            if isinstance(r[self.cfg.label_column], int)
            else self.cfg.class_names.index(r[self.cfg.label_column])
            for r in rows
        ]
        return np.stack(pixels), np.asarray(labels, np.int32)

    def train(self, dataset, num_steps: Optional[int] = None):
        num_steps = num_steps or self.cfg.num_steps
        rng = np.random.default_rng(self.cfg.seed)
        metrics = {}
        while self.step < num_steps:
            idx = rng.choice(len(dataset), size=min(self.cfg.batch_size, len(dataset)))
            pixels, labels = self.collate([dataset[int(i)] for i in idx])
            (
                self.params["resnet"], self.opt_state, self.params["bn_state"],
                loss, acc,
            ) = self._train_step(
                self.params["resnet"], self.opt_state, self.params["bn_state"],
                jnp.asarray(pixels), jnp.asarray(labels),
            )
            self.step += 1
            metrics = {"loss": float(loss), "acc": float(acc)}
            if self.step % 10 == 0 or self.step == num_steps:
                logger.info("router step %d %s", self.step, metrics)
        self.net.save_pretrained(self.params, self.cfg.output_dir)
        return metrics
