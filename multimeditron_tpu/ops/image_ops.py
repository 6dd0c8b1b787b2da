"""Device-side fused image preprocessing.

The reference preprocesses images on CPU per sample via HF image processors
(PIL resize + normalize, ``image_modality.py:96``). The TPU-native fast
path keeps decode on host but runs resize/normalize/patchify ON DEVICE in
fixed-shape uint8 batches, fused by XLA into the encoder's first matmul —
this is the "fused resize/normalize/patchify pipeline" named in
BASELINE.json's north star.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from multimeditron_tpu.data.image_processing import CLIP_MEAN, CLIP_STD


def preprocess_images_device(
    images_uint8: jax.Array,
    image_size: int,
    mean: Sequence[float] = CLIP_MEAN,
    std: Sequence[float] = CLIP_STD,
    method: str = "bilinear",
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """(B, H, W, 3) uint8 -> (B, image_size, image_size, 3) normalized.

    Resize happens only when the input shape differs from the target; a
    uniform-size batch (the serving/training hot path) is just a cast +
    fused multiply-add.
    """
    x = images_uint8.astype(jnp.float32) / 255.0
    B, H, W, C = x.shape
    if (H, W) != (image_size, image_size):
        x = jax.image.resize(
            x, (B, image_size, image_size, C), method=method, antialias=True
        )
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    x = (x - mean) / std
    return x.astype(out_dtype)
