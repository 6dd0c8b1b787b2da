"""Selector (gating network) fine-tuning — companion script.

Parity with the reference's ``notebooks/selector/fine-tuning.py``:

- ``prepare_data``: flatten a modality jsonl into an ImageFolder-style
  class directory (offline core; the reference hardcodes cluster paths);
- ``create_subset``: equal-representation subset across class dirs;
- ``fine_tune``: epoch-based fine-tuning of the GatingNetwork with an
  80/20 train/val split, per-epoch train+val loss/accuracy, the
  reference's early-stopping rule (stop when loss rises AND accuracy
  stops improving once past 90%), and ``save_pretrained`` to the
  reference-compatible checkpoint format.

The TPU path rides RouterTrainer's jitted step (experts/train_router.py)
instead of a torch DataLoader loop. ``--mock`` builds a tiny synthetic
ImageFolder (colored-noise classes) and runs the whole flow offline —
the CI-checkable path (tests/test_selector_finetune.py).

Usage:
  python notebooks/selector/fine-tuning.py --data-dir <ImageFolder root>
  python notebooks/selector/fine-tuning.py --mock
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np


def prepare_data(source_jsonl: str, target_dir: str, modality: str,
                 image_root: str = "") -> int:
    """Copy each jsonl row's first image into ``target_dir/<modality>/``
    (ImageFolder layout). Returns the number of images copied."""
    copied = 0
    cls_dir = os.path.join(target_dir, modality)
    os.makedirs(cls_dir, exist_ok=True)
    with open(source_jsonl) as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            rel = row["modalities"][0]["value"]
            src = os.path.join(image_root, rel) if image_root else rel
            if not os.path.exists(src):
                continue
            study_id = os.path.basename(os.path.dirname(rel)) or "s"
            dst = os.path.join(cls_dir,
                               f"{study_id}_{os.path.basename(rel)}")
            shutil.copy(src, dst)
            copied += 1
    return copied


def create_subset(input_dirs, output_dir, subset_size: int = 100) -> None:
    """Equal-representation subset: first ``subset_size`` files of each
    class directory, copied under ``output_dir/<class>/``."""
    os.makedirs(output_dir, exist_ok=True)
    for input_dir in input_dirs:
        if not os.path.isdir(input_dir):
            print(f"Directory {input_dir} does not exist. Skipping.")
            continue
        files = sorted(
            f for f in os.listdir(input_dir)
            if os.path.isfile(os.path.join(input_dir, f)))[:subset_size]
        cls_out = os.path.join(output_dir, os.path.basename(input_dir))
        os.makedirs(cls_out, exist_ok=True)
        for f in files:
            shutil.copyfile(os.path.join(input_dir, f),
                            os.path.join(cls_out, f))
        print(f"Copied {len(files)} files from {input_dir} to {cls_out}")


def scan_image_folder(root: str):
    """ImageFolder scan -> (rows [{'image', 'label'}], class_names)."""
    class_names = sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)))
    rows = []
    for li, cls in enumerate(class_names):
        cdir = os.path.join(root, cls)
        for f in sorted(os.listdir(cdir)):
            p = os.path.join(cdir, f)
            if os.path.isfile(p):
                rows.append({"image": p, "label": li})
    return rows, class_names


def fine_tune(data_dir: str, output_dir: str = "gating/checkpoint",
              pretrained: str = "", num_epochs: int = 20,
              batch_size: int = 32, learning_rate: float = 1e-4,
              resnet_depth: int = 50, image_size: int = 224,
              seed: int = 0) -> dict:
    """Epoch loop with 80/20 split, validation metrics and the
    reference's early-stopping rule; saves the reference-format
    checkpoint. Returns the final metrics dict."""
    import jax

    from multimeditron_tpu.experts.train_router import (
        RouterTrainConfig, RouterTrainer,
    )

    rows, class_names = scan_image_folder(data_dir)
    if not rows:
        raise SystemExit(f"no images under {data_dir}")
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(rows))
    n_train = max(1, int(0.8 * len(rows)))
    train_rows = [rows[i] for i in order[:n_train]]
    val_rows = [rows[i] for i in order[n_train:]] or train_rows[:1]

    trainer = RouterTrainer(RouterTrainConfig(
        class_names=class_names, resnet_depth=resnet_depth,
        image_size=image_size, learning_rate=learning_rate,
        batch_size=batch_size, output_dir=output_dir, seed=seed,
    ))
    if pretrained:
        from multimeditron_tpu.modalities.moe.gating import GatingNetwork

        net, params = GatingNetwork.from_pretrained(pretrained)
        trainer.net, trainer.params = net, params
        trainer.opt_state = trainer.tx.init(trainer.params["resnet"])

    import jax.numpy as jnp

    from multimeditron_tpu.models.resnet import resnet_forward

    def evaluate(rows_):
        losses, correct, total = [], 0, 0
        for i in range(0, len(rows_), batch_size):
            pixels, labels = trainer.collate(rows_[i:i + batch_size])
            logits, _ = resnet_forward(
                trainer.params["resnet"], trainer.params["bn_state"],
                trainer.net.resnet_cfg, jnp.asarray(pixels), train=False)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            losses.append(float(-jnp.mean(
                jnp.take_along_axis(logp, jnp.asarray(labels)[:, None], -1))))
            pred = np.asarray(jnp.argmax(logits, -1))
            correct += int((pred == labels).sum())
            total += len(labels)
        return float(np.mean(losses)), 100.0 * correct / max(total, 1)

    best_accuracy, prev_loss = 0.0, float("inf")
    metrics = {}
    steps_per_epoch = max(1, len(train_rows) // batch_size)
    for epoch in range(num_epochs):
        running, correct, total = 0.0, 0, 0
        epoch_rng = np.random.default_rng(seed + epoch + 1)
        for _ in range(steps_per_epoch):
            idx = epoch_rng.choice(len(train_rows),
                                   size=min(batch_size, len(train_rows)))
            pixels, labels = trainer.collate(
                [train_rows[int(i)] for i in idx])
            (trainer.params["resnet"], trainer.opt_state,
             trainer.params["bn_state"], loss, acc) = trainer._train_step(
                trainer.params["resnet"], trainer.opt_state,
                trainer.params["bn_state"],
                jnp.asarray(pixels), jnp.asarray(labels))
            running += float(loss)
            correct += int(float(acc) * len(labels))
            total += len(labels)
        epoch_loss = running / steps_per_epoch
        epoch_accuracy = 100.0 * correct / max(total, 1)
        print(f"Epoch [{epoch + 1}/{num_epochs}], "
              f"Loss: {epoch_loss:.4f}, Accuracy: {epoch_accuracy:.2f}%")

        # reference early-stopping rule: past 90% accuracy, stop when the
        # loss rises and accuracy stops improving
        if (epoch > 0 and epoch_loss > prev_loss
                and epoch_accuracy <= best_accuracy
                and best_accuracy > 90):
            print(f"Stopping early at epoch {epoch + 1} due to no "
                  "improvement in accuracy and an increase in loss.")
            break
        best_accuracy = max(best_accuracy, epoch_accuracy)
        prev_loss = epoch_loss

        val_loss, val_accuracy = evaluate(val_rows)
        print(f"Validation Loss: {val_loss:.4f}, "
              f"Accuracy: {val_accuracy:.2f}%")
        metrics = {"epoch": epoch + 1, "train_loss": epoch_loss,
                   "train_acc": epoch_accuracy, "val_loss": val_loss,
                   "val_acc": val_accuracy}

    trainer.net.save_pretrained(trainer.params, output_dir)
    print(f"Saved fine-tuned gating checkpoint to {output_dir}")
    return metrics


def make_mock_folder(root: str, classes=("Mri", "Ct", "X-ray"),
                     per_class: int = 6, size: int = 32) -> None:
    """Tiny synthetic ImageFolder: each class is noise around a distinct
    base color (learnable in a couple of epochs at toy sizes)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    base = {c: rng.integers(30, 220, 3) for c in classes}
    for c in classes:
        cdir = os.path.join(root, c)
        os.makedirs(cdir, exist_ok=True)
        for i in range(per_class):
            arr = np.clip(
                base[c][None, None, :]
                + rng.normal(0, 25, (size, size, 3)), 0, 255
            ).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(cdir, f"{i}.png"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default="")
    parser.add_argument("--output-dir", default="gating/checkpoint")
    parser.add_argument("--pretrained", default="",
                        help="existing gating checkpoint to fine-tune")
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--resnet-depth", type=int, default=50)
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--subset", type=int, default=0,
                        help="take the first N images per class first")
    parser.add_argument("--mock", action="store_true",
                        help="synthesize a tiny ImageFolder and run the "
                             "whole flow offline (2 epochs, resnet18, "
                             "64px)")
    args = parser.parse_args()

    if args.mock:
        import tempfile

        root = tempfile.mkdtemp(prefix="selector_mock_")
        make_mock_folder(root)
        out = os.path.join(root, "ckpt")
        fine_tune(root, output_dir=out, num_epochs=2, batch_size=6,
                  resnet_depth=18, image_size=64)
        return

    if not args.data_dir:
        raise SystemExit("--data-dir (ImageFolder root) or --mock required")
    data_dir = args.data_dir
    if args.subset:
        subset_dir = data_dir.rstrip("/") + "_subset"
        create_subset(
            [os.path.join(data_dir, d) for d in sorted(os.listdir(data_dir))
             if os.path.isdir(os.path.join(data_dir, d))],
            subset_dir, args.subset)
        data_dir = subset_dir
    fine_tune(data_dir, output_dir=args.output_dir,
              pretrained=args.pretrained, num_epochs=args.epochs,
              batch_size=args.batch_size, learning_rate=args.lr,
              resnet_depth=args.resnet_depth, image_size=args.image_size)


if __name__ == "__main__":
    main()
