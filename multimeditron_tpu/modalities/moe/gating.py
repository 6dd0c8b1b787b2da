"""Gating network: ResNet classifier over pixel values -> per-expert
logits / top-k / softmax weights.

Parity with the reference ``GatingNetwork`` (``modalities/moe/gating.py``):
same outputs, same HF-style serialization (config.json with
``class_names`` + safetensors with torchvision ResNet key names, so gating
checkpoints trained by the reference's router trainer import directly).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from multimeditron_tpu.models.resnet import (
    ResNetConfig,
    init_resnet,
    resnet_forward,
    resnet_params_from_torch_state_dict,
)

Params = Dict[str, Any]


@dataclasses.dataclass
class GatingNetworkConfig:
    num_classes: int = 2
    top_k: int = 1
    image_processor_path: str = "openai/clip-vit-base-patch32"
    class_names: List[str] = dataclasses.field(default_factory=list)
    resnet_depth: int = 50

    def to_dict(self) -> dict:
        return dataclasses.asdict(self) | {"model_type": "gating_network"}

    @staticmethod
    def from_dict(d: dict) -> "GatingNetworkConfig":
        fields = {f.name for f in dataclasses.fields(GatingNetworkConfig)}
        return GatingNetworkConfig(**{k: v for k, v in d.items() if k in fields})


class GatingNetwork:
    def __init__(self, config: GatingNetworkConfig):
        self.config = config
        self.resnet_cfg = ResNetConfig(
            depth=config.resnet_depth, num_classes=config.num_classes
        )

    def init(self, key: jax.Array) -> Params:
        params, state = init_resnet(key, self.resnet_cfg)
        return {"resnet": params, "bn_state": state}

    def forward(
        self,
        params: Params,
        pixel_values: jax.Array,  # (B, H, W, 3) NHWC
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, Params]:
        """Returns (logits, topk_indices, weights, new_params)."""
        logits, new_state = resnet_forward(
            params["resnet"], params["bn_state"], self.resnet_cfg,
            pixel_values, train=train,
        )
        _, topk_indices = jax.lax.top_k(logits, self.config.top_k)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return logits, topk_indices, weights, {**params, "bn_state": new_state}

    # ------------------------------------------------------------------
    # Serialization (reference-compatible: torchvision resnet key names)
    # ------------------------------------------------------------------
    def save_pretrained(self, params: Params, out_dir: str) -> None:
        from safetensors.flax import save_file

        os.makedirs(out_dir, exist_ok=True)
        sd: Dict[str, jax.Array] = {}
        p, s = params["resnet"], params["bn_state"]
        sd["resnet.conv1.weight"] = p["stem_conv"].transpose(3, 2, 0, 1)
        sd["resnet.bn1.weight"] = p["stem_bn"]["scale"]
        sd["resnet.bn1.bias"] = p["stem_bn"]["bias"]
        sd["resnet.bn1.running_mean"] = s["stem_bn"]["mean"]
        sd["resnet.bn1.running_var"] = s["stem_bn"]["var"]
        for stage_idx, blocks in enumerate(p["stages"]):
            for i, b in enumerate(blocks):
                bs = s["stages"][stage_idx][i]
                pfx = f"resnet.layer{stage_idx + 1}.{i}"
                n_convs = 3 if self.resnet_cfg.block_type == "bottleneck" else 2
                for c in range(1, n_convs + 1):
                    sd[f"{pfx}.conv{c}.weight"] = b[f"conv{c}"].transpose(3, 2, 0, 1)
                    sd[f"{pfx}.bn{c}.weight"] = b[f"bn{c}"]["scale"]
                    sd[f"{pfx}.bn{c}.bias"] = b[f"bn{c}"]["bias"]
                    sd[f"{pfx}.bn{c}.running_mean"] = bs[f"bn{c}"]["mean"]
                    sd[f"{pfx}.bn{c}.running_var"] = bs[f"bn{c}"]["var"]
                if "down_conv" in b:
                    sd[f"{pfx}.downsample.0.weight"] = b["down_conv"].transpose(3, 2, 0, 1)
                    sd[f"{pfx}.downsample.1.weight"] = b["down_bn"]["scale"]
                    sd[f"{pfx}.downsample.1.bias"] = b["down_bn"]["bias"]
                    sd[f"{pfx}.downsample.1.running_mean"] = bs["down_bn"]["mean"]
                    sd[f"{pfx}.downsample.1.running_var"] = bs["down_bn"]["var"]
        sd["resnet.fc.weight"] = p["fc_w"].T
        sd["resnet.fc.bias"] = p["fc_b"]
        save_file(sd, os.path.join(out_dir, "model.safetensors"))
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            json.dump(self.config.to_dict(), f, indent=2)

    @staticmethod
    def from_pretrained(path: str) -> Tuple["GatingNetwork", Params]:
        from multimeditron_tpu.models.hf_import import load_hf_state_dict

        with open(os.path.join(path, "config.json")) as f:
            config = GatingNetworkConfig.from_dict(json.load(f))
        net = GatingNetwork(config)
        state = load_hf_state_dict(path)
        state = {
            (k[len("resnet."):] if k.startswith("resnet.") else k): v
            for k, v in state.items()
        }
        params, bn_state = resnet_params_from_torch_state_dict(state, net.resnet_cfg)
        return net, {"resnet": params, "bn_state": bn_state}
