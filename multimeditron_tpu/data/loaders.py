"""Modality value loaders: raw sample values (paths / bytes) -> PIL images.

Capability parity with the reference's loader layer
(``dataset/loader/__init__.py``, ``dataset/loader/image/{fs,bytes}.py``),
including the same registered names (``fs-image``, ``raw-image``) and the
decompression-bomb-warning escalation (``fs.py:9``).
"""

from __future__ import annotations

import abc
import io
import warnings
from typing import Any, Dict

from PIL import Image

from multimeditron_tpu.constants import (
    MODALITIES_KEY,
    MODALITY_TYPE_KEY,
    MODALITY_VALUE_KEY,
)
from multimeditron_tpu.registry import Registry

# A decompression bomb is an input-data fault, not a warning (reference
# promotes it to an error, ``dataset/loader/image/fs.py:9``).
warnings.filterwarnings("error", category=Image.DecompressionBombWarning)


class BaseModalityLoader(abc.ABC):
    name: str = ""

    @abc.abstractmethod
    def load(self, modality: Dict[str, Any]) -> Any:
        ...

    def __call__(self, modality: Dict[str, Any]) -> Any:
        return self.load(modality)

    @staticmethod
    def load_modalities(
        sample: Dict[str, Any], loaders: Dict[str, "BaseModalityLoader"]
    ) -> Dict[str, Any]:
        """Resolve each modality's raw value through the loader registered
        for its type (reference ``loader/__init__.py:42-85``)."""
        if MODALITIES_KEY not in sample:
            return sample
        out = sample.copy()
        out[MODALITIES_KEY] = []
        for modality in sample[MODALITIES_KEY]:
            loader = loaders.get(modality[MODALITY_TYPE_KEY])
            if loader is None:
                raise ValueError(
                    f"Modality loader for type {modality[MODALITY_TYPE_KEY]!r} not found"
                )
            loaded = modality.copy()
            loaded[MODALITY_VALUE_KEY] = loader(modality)
            out[MODALITIES_KEY].append(loaded)
        return out


AutoModalityLoader = Registry("modality loader", BaseModalityLoader)


@AutoModalityLoader.register("fs-image")
class FileSystemImageLoader(BaseModalityLoader):
    """value = filesystem path -> PIL image."""

    def __init__(self, base_path: str = ""):
        self.base_path = base_path

    def load(self, modality: Dict[str, Any]) -> Image.Image:
        import os

        path = modality[MODALITY_VALUE_KEY]
        if self.base_path:
            path = os.path.join(self.base_path, path)
        with Image.open(path) as img:
            return img.convert("RGB")


@AutoModalityLoader.register("raw-image")
class RawImageLoader(BaseModalityLoader):
    """value = bytes / {'bytes': ...} / PIL image -> PIL image."""

    def load(self, modality: Dict[str, Any]) -> Image.Image:
        value = modality[MODALITY_VALUE_KEY]
        if isinstance(value, Image.Image):
            return value.convert("RGB")
        if isinstance(value, dict) and "bytes" in value:
            value = value["bytes"]
        if isinstance(value, (bytes, bytearray)):
            return Image.open(io.BytesIO(value)).convert("RGB")
        raise TypeError(
            f"raw-image loader cannot handle value of type {type(value).__name__}"
        )
