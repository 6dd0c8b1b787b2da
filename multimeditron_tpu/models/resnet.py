"""Functional ResNet (18/34/50) in NHWC for the MoE gating router.

TPU-native replacement for the torchvision ResNet the reference uses as
its gating classifier (``model/modalities/moe/gating.py:9-104``) and for
router training (``scripts/image_router_train.py``). BatchNorm carries
explicit running-stat state: ``resnet_forward(..., train=True)`` returns
updated state, eval mode consumes it — the functional equivalent of
``model.train()/eval()``.

Weight import from a torchvision state dict (OIHW conv -> HWIO) gives
numerical parity with pretrained gating checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_LAYER_SPECS = {
    18: ("basic", [2, 2, 2, 2]),
    34: ("basic", [3, 4, 6, 3]),
    50: ("bottleneck", [3, 4, 6, 3]),
}


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    depth: int = 50
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @property
    def block_type(self) -> str:
        return _LAYER_SPECS[self.depth][0]

    @property
    def stage_sizes(self) -> List[int]:
        return _LAYER_SPECS[self.depth][1]

    @property
    def expansion(self) -> int:
        return 4 if self.block_type == "bottleneck" else 1


def _conv_init(key, h, w, cin, cout, dtype):
    fan_in = h * w * cin
    return (jax.random.normal(key, (h, w, cin, cout), jnp.float32)
            * (2.0 / fan_in) ** 0.5).astype(dtype)


def _bn_init(c, dtype):
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
    }


def _bn_state(c):
    return {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}


def init_resnet(key: jax.Array, cfg: ResNetConfig) -> Tuple[Params, Params]:
    """Returns (params, state) where state holds BN running stats."""
    dtype = cfg.dtype
    keys = iter(jax.random.split(key, 256))
    params: Params = {"stem_conv": _conv_init(next(keys), 7, 7, 3, 64, dtype),
                      "stem_bn": _bn_init(64, dtype)}
    state: Params = {"stem_bn": _bn_state(64)}

    in_c = 64
    stages = []
    stages_state = []
    for stage_idx, n_blocks in enumerate(cfg.stage_sizes):
        planes = 64 * (2 ** stage_idx)
        out_c = planes * cfg.expansion
        blocks = []
        blocks_state = []
        for block_idx in range(n_blocks):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            b: Params = {}
            bs: Params = {}
            if cfg.block_type == "bottleneck":
                b["conv1"] = _conv_init(next(keys), 1, 1, in_c, planes, dtype)
                b["bn1"] = _bn_init(planes, dtype); bs["bn1"] = _bn_state(planes)
                b["conv2"] = _conv_init(next(keys), 3, 3, planes, planes, dtype)
                b["bn2"] = _bn_init(planes, dtype); bs["bn2"] = _bn_state(planes)
                b["conv3"] = _conv_init(next(keys), 1, 1, planes, out_c, dtype)
                b["bn3"] = _bn_init(out_c, dtype); bs["bn3"] = _bn_state(out_c)
            else:
                b["conv1"] = _conv_init(next(keys), 3, 3, in_c, planes, dtype)
                b["bn1"] = _bn_init(planes, dtype); bs["bn1"] = _bn_state(planes)
                b["conv2"] = _conv_init(next(keys), 3, 3, planes, out_c, dtype)
                b["bn2"] = _bn_init(out_c, dtype); bs["bn2"] = _bn_state(out_c)
            if stride != 1 or in_c != out_c:
                b["down_conv"] = _conv_init(next(keys), 1, 1, in_c, out_c, dtype)
                b["down_bn"] = _bn_init(out_c, dtype); bs["down_bn"] = _bn_state(out_c)
            blocks.append(b)
            blocks_state.append(bs)
            in_c = out_c
        stages.append(blocks)
        stages_state.append(blocks_state)
    params["stages"] = stages
    state["stages"] = stages_state
    params["fc_w"] = (jax.random.normal(next(keys), (in_c, cfg.num_classes), jnp.float32)
                      * (in_c ** -0.5)).astype(dtype)
    params["fc_b"] = jnp.zeros((cfg.num_classes,), dtype)
    return params, state


def _conv(x, w, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x, p, s, train: bool, momentum=0.1, eps=1e-5):
    if train:
        axes = (0, 1, 2)
        mean = jnp.mean(x.astype(jnp.float32), axes)
        var = jnp.var(x.astype(jnp.float32), axes)
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + eps)
    out = (x.astype(jnp.float32) - mean) * inv * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype), new_s


def resnet_forward(
    params: Params,
    state: Params,
    cfg: ResNetConfig,
    pixel_values: jax.Array,  # (B, H, W, 3) NHWC, normalized
    train: bool = False,
) -> Tuple[jax.Array, Params]:
    """Returns (logits, new_state)."""
    new_state: Params = {"stages": []}
    # torchvision uses padding=3 for the 7x7 stem conv (equivalent to SAME
    # here since 224 % 2 == 0).
    x = _conv(pixel_values, params["stem_conv"], stride=2, padding=[(3, 3), (3, 3)])
    x, ns = _bn(x, params["stem_bn"], state["stem_bn"], train)
    new_state["stem_bn"] = ns
    x = jax.nn.relu(x)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )

    for stage_idx, blocks in enumerate(params["stages"]):
        stage_state = []
        for block_idx, b in enumerate(blocks):
            s = state["stages"][stage_idx][block_idx]
            ns: Params = {}
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            identity = x
            if cfg.block_type == "bottleneck":
                out = _conv(x, b["conv1"], 1)
                out, ns["bn1"] = _bn(out, b["bn1"], s["bn1"], train)
                out = jax.nn.relu(out)
                out = _conv(out, b["conv2"], stride)
                out, ns["bn2"] = _bn(out, b["bn2"], s["bn2"], train)
                out = jax.nn.relu(out)
                out = _conv(out, b["conv3"], 1)
                out, ns["bn3"] = _bn(out, b["bn3"], s["bn3"], train)
            else:
                out = _conv(x, b["conv1"], stride)
                out, ns["bn1"] = _bn(out, b["bn1"], s["bn1"], train)
                out = jax.nn.relu(out)
                out = _conv(out, b["conv2"], 1)
                out, ns["bn2"] = _bn(out, b["bn2"], s["bn2"], train)
            if "down_conv" in b:
                identity = _conv(x, b["down_conv"], stride)
                identity, ns["down_bn"] = _bn(
                    identity, b["down_bn"], s["down_bn"], train
                )
            x = jax.nn.relu(out + identity)
            stage_state.append(ns)
        new_state["stages"].append(stage_state)

    x = jnp.mean(x, axis=(1, 2))  # global average pool
    logits = x @ params["fc_w"] + params["fc_b"]
    return logits, new_state


# ----------------------------------------------------------------------
# torchvision import
# ----------------------------------------------------------------------
def resnet_params_from_torch_state_dict(
    sd: Dict[str, Any], cfg: ResNetConfig, dtype=None
) -> Tuple[Params, Params]:
    from multimeditron_tpu.models.hf_import import _np

    dtype = dtype or cfg.dtype
    conv = lambda k: jnp.asarray(_np(sd[k]).transpose(2, 3, 1, 0), dtype)  # OIHW->HWIO
    vec = lambda k: jnp.asarray(_np(sd[k]), dtype)
    f32 = lambda k: jnp.asarray(_np(sd[k]), jnp.float32)

    def bn(prefix):
        return (
            {"scale": vec(f"{prefix}.weight"), "bias": vec(f"{prefix}.bias")},
            {"mean": f32(f"{prefix}.running_mean"), "var": f32(f"{prefix}.running_var")},
        )

    params: Params = {"stem_conv": conv("conv1.weight")}
    params["stem_bn"], stem_bn_state = bn("bn1")
    state: Params = {"stem_bn": stem_bn_state, "stages": []}

    stages = []
    for stage_idx, n_blocks in enumerate(cfg.stage_sizes):
        blocks, blocks_state = [], []
        for i in range(n_blocks):
            pfx = f"layer{stage_idx + 1}.{i}"
            b: Params = {}
            bs: Params = {}
            n_convs = 3 if cfg.block_type == "bottleneck" else 2
            for c in range(1, n_convs + 1):
                b[f"conv{c}"] = conv(f"{pfx}.conv{c}.weight")
                b[f"bn{c}"], bs[f"bn{c}"] = bn(f"{pfx}.bn{c}")
            if f"{pfx}.downsample.0.weight" in sd:
                b["down_conv"] = conv(f"{pfx}.downsample.0.weight")
                b["down_bn"], bs["down_bn"] = bn(f"{pfx}.downsample.1")
            blocks.append(b)
            blocks_state.append(bs)
        stages.append(blocks)
        state["stages"].append(blocks_state)
    params["stages"] = stages
    params["fc_w"] = jnp.asarray(_np(sd["fc.weight"]).T, dtype)
    params["fc_b"] = vec("fc.bias")
    return params, state
