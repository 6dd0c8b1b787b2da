"""Host-side image preprocessing (PIL decode stays on CPU; math matches the
HF CLIP/SigLIP image processors the reference uses via
``AutoImageProcessor.from_pretrained`` (``image_modality.py:77``)).

The device-side fused resize/normalize fast path lives in
``multimeditron_tpu/ops/image_ops.py``; this module is the
correctness-first path and the one used for arbitrary-size inputs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


def preprocess_image(
    image: Image.Image,
    image_size: int,
    mean: Sequence[float] = CLIP_MEAN,
    std: Sequence[float] = CLIP_STD,
    resize_mode: str = "shortest_edge",  # clip: shortest_edge+crop; siglip: squash
    normalize: bool = True,
) -> np.ndarray:
    """PIL image -> normalized float32 NHWC array (H, W, 3).

    ``normalize=False`` stops after the geometric transform and returns
    the uint8 pixels (the HF processors also resize in uint8 and only
    then rescale/normalize) — the wire format for device-side
    normalization (``ops/image_ops.py``), 4x fewer host->device bytes."""
    image = image.convert("RGB")
    if resize_mode == "shortest_edge":
        w, h = image.size
        scale = image_size / min(w, h)
        new_w, new_h = round(w * scale), round(h * scale)
        image = image.resize((new_w, new_h), Image.BICUBIC)
        left = (new_w - image_size) // 2
        top = (new_h - image_size) // 2
        image = image.crop((left, top, left + image_size, top + image_size))
    elif resize_mode == "squash":
        image = image.resize((image_size, image_size), Image.BICUBIC)
    else:
        raise ValueError(f"Unknown resize_mode {resize_mode!r}")

    if not normalize:
        return np.asarray(image, dtype=np.uint8)  # (H, W, 3)
    arr = np.asarray(image, dtype=np.float32) / 255.0
    arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return arr  # (H, W, 3)
