"""Mixture-of-expert-CLIPs image modalities.

Parity with the reference's two MoE variants:

- ``moe_meditron_clip`` (``image_modality_moe.py``): N expert vision
  towers evaluated DENSELY per image, a ResNet gating network producing
  per-expert weights, fusion in the NATIVE embedding space
  (weighted_average | sequence_append | cross_attn with generalist
  queries over gating-weighted specialists), one shared MLP projector;
- ``moe_meditron_clip_pep`` (``image_modality_moe_pep.py``): one projector
  PER EXPERT, fusion in the PROJECTED (LLM-dim) space.

Behavioral notes kept from the reference: the gating-class -> expert
permutation buffer (``image_modality_moe.py:126-138``), specialist-only
softmax for cross_attn. Deviations (documented intent-over-bug,
SURVEY.md §7.4): ``sequence_append`` declares P^2 * num_experts
embeddings (the size it actually produces — the reference declares
``* top_k_experts`` which only matches when top_k == E), and the PEP
weighted_average applies the gating permutation like the shared variant
does.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from multimeditron_tpu.modalities.base import AutoModality, BaseModality
from multimeditron_tpu.modalities.image_clip import ImageConfig, ImageProcessor
from multimeditron_tpu.modalities.moe.gating import GatingNetwork, GatingNetworkConfig
from multimeditron_tpu.models.cross_attention import (
    cross_attention_forward,
    init_cross_attention,
)
from multimeditron_tpu.models.projector import (
    init_mlp_projector,
    mlp_projector_forward,
)
from multimeditron_tpu.models.vit import init_vit_params, vit_forward

Params = Dict[str, Any]


@dataclasses.dataclass
class MOEImageConfig(ImageConfig):
    expert_clip_names: List[str] = dataclasses.field(default_factory=list)
    num_experts: int = 0  # inferred from expert_clip_names when 0
    gating_path: str = ""
    top_k_experts: int = 1
    generalist_idx: int = -1
    fusion_method: str = "weighted_average"
    cross_attn_heads: int = 8
    gating_class_names: List[str] = dataclasses.field(default_factory=list)
    gating_resnet_depth: int = 50

    def __post_init__(self):
        if self.num_experts == 0:
            self.num_experts = max(len(self.expert_clip_names), 1)


class MOEImageProcessor(ImageProcessor):
    """num_embeddings depends on the fusion method
    (reference ``MOEImageProcessor.process``, ``image_modality_moe.py:70-85``)."""

    @property
    def num_embeddings(self) -> int:
        base = self._grid ** 2
        if self.config.fusion_method == "sequence_append":
            return base * self.config.num_experts
        if self.config.fusion_method in ("weighted_average", "cross_attn"):
            return base
        raise ValueError(f"Unknown fusion_method: {self.config.fusion_method}")

    @property
    def value_dtype(self):
        # The gating ResNet + expert towers consume the host-normalized
        # floats; the uint8 wire path is only wired through the
        # single-tower modalities.
        import numpy as np

        if getattr(self.config, "wire_dtype", "float32") != "float32":
            raise ValueError("MoE image modalities require wire_dtype='float32'")
        return np.float32


class _MOEBase(BaseModality):
    config_class = MOEImageConfig
    processor_class = MOEImageProcessor
    per_expert_projectors = False

    def __init__(self, config: MOEImageConfig):
        super().__init__(config)
        self.vit_cfg = config.vit_config()
        self.num_experts = config.num_experts
        assert self.num_experts > 0, "MoE modality needs at least one expert"
        self.expert_names = list(config.expert_clip_names) or [
            f"expert_{i}" for i in range(self.num_experts)
        ]
        self.gating = GatingNetwork(
            GatingNetworkConfig(
                num_classes=self.num_experts,
                top_k=config.top_k_experts,
                class_names=config.gating_class_names,
                resnet_depth=config.gating_resnet_depth,
            )
        )
        # gating-class -> expert permutation (reference :126-138)
        names = config.gating_class_names
        if names:
            name_to_idx = {n: i for i, n in enumerate(self.expert_names)}
            try:
                self.gating_perm = jnp.asarray(
                    [name_to_idx[n] for n in names], jnp.int32
                )
            except KeyError as e:
                raise ValueError(
                    f"Gating class name {e} not found in expert_clip_names: "
                    f"{self.expert_names}"
                )
        else:
            self.gating_perm = jnp.arange(self.num_experts, dtype=jnp.int32)

    # -------------------------------------------------------------
    def init_params(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, self.num_experts + 3)
        # Expert towers are STACKED on a leading E axis (one pytree whose
        # leaves carry the expert dim) so the dense fan-out is a single
        # vmapped graph instead of E separately-compiled towers — one
        # compile, one fused schedule, and the existing path-suffix
        # sharding rules left-pad to the extra rank (the E axis stays
        # unsharded; inner dims keep their fsdp/tp specs).
        expert_list = [
            init_vit_params(keys[i], self.vit_cfg)
            for i in range(self.num_experts)
        ]
        embedder: Params = {
            "experts": jax.tree.map(lambda *xs: jnp.stack(xs), *expert_list),
            "gating": self.gating.init(keys[-3]),
        }
        params: Params = {"embedder": embedder}
        native_dim = self.vit_cfg.hidden_size
        llm_dim = self.config.hidden_size
        if self.per_expert_projectors:
            pkeys = jax.random.split(keys[-2], self.num_experts)
            proj_list = [
                init_mlp_projector(pk, native_dim, llm_dim, dtype=self.vit_cfg.dtype)
                for pk in pkeys
            ]
            params["projector"] = {
                "projectors": jax.tree.map(lambda *xs: jnp.stack(xs), *proj_list)
            }
        else:
            params["projector"] = init_mlp_projector(
                keys[-2], native_dim, llm_dim, dtype=self.vit_cfg.dtype
            )
        if self.config.fusion_method == "cross_attn":
            # PEP fuses in projected (LLM-dim) space, shared in native space.
            # Either way cross_attn is a projector-side trainable (the
            # reference leaves it trainable in ALIGNMENT mode).
            if self.per_expert_projectors:
                params["projector"]["cross_attn"] = init_cross_attention(
                    keys[-1], llm_dim, qkv_bias=True, dtype=self.vit_cfg.dtype
                )
            else:
                params["cross_attn"] = init_cross_attention(
                    keys[-1], native_dim, qkv_bias=True, dtype=self.vit_cfg.dtype
                )
        return params

    def load_pretrained_params(self, dtype=None) -> Optional[Params]:
        import os

        params = self.init_params(jax.random.PRNGKey(0))
        loaded_any = False
        for i, name in enumerate(self.expert_names):
            if os.path.isdir(name) and os.path.exists(os.path.join(name, "config.json")):
                from multimeditron_tpu.models.hf_import import load_clip_vision

                vit_cfg, tower = load_clip_vision(name, dtype=dtype or self.vit_cfg.dtype)
                self.vit_cfg = vit_cfg
                params["embedder"]["experts"] = jax.tree.map(
                    lambda s, t, i=i: s.at[i].set(t.astype(s.dtype)),
                    params["embedder"]["experts"], tower,
                )
                loaded_any = True
        if self.config.gating_path and os.path.isdir(self.config.gating_path):
            self.gating, gparams = GatingNetwork.from_pretrained(self.config.gating_path)
            params["embedder"]["gating"] = gparams
            loaded_any = True
        return params if loaded_any else None

    # -------------------------------------------------------------
    def _expert_features(self, params: Params, values: jax.Array) -> jax.Array:
        """(N, H, W, 3) -> (N, E, P, D_native): dense expert fan-out as ONE
        vmapped tower over the stacked expert axis (round-1 ran a Python
        loop over per-expert pytrees: E separate graphs, E compiles)."""
        feats = jax.vmap(
            lambda ep: vit_forward(ep, self.vit_cfg, values, drop_cls=True)
        )(params["embedder"]["experts"])  # (E, N, P, C)
        return feats.transpose(1, 0, 2, 3)

    def _gating_weights(self, params: Params, values: jax.Array) -> jax.Array:
        _, _, weights, _ = self.gating.forward(
            params["embedder"]["gating"], values, train=False
        )
        return jnp.take(weights, self.gating_perm, axis=-1)  # align to experts

    def _fuse(
        self,
        stacked: jax.Array,        # (N, E, P, C)
        weights: jax.Array,        # (N, E) permuted to expert order
        cross_attn_params: Optional[Params],
    ) -> jax.Array:
        method = self.config.fusion_method
        N, E, P, C = stacked.shape
        if method == "sequence_append":
            return stacked.reshape(N, E * P, C)
        if method == "weighted_average":
            return jnp.sum(stacked * weights[:, :, None, None].astype(stacked.dtype), axis=1)
        if method == "cross_attn":
            g = self.config.generalist_idx % E
            q = stacked[:, g]
            specialist_idx = [i for i in range(E) if i != g]
            w_spec = jax.nn.softmax(
                weights[:, jnp.asarray(specialist_idx)].astype(jnp.float32), axis=-1
            )
            contexts = [
                stacked[:, e] * w_spec[:, j, None, None].astype(stacked.dtype)
                for j, e in enumerate(specialist_idx)
            ]
            return cross_attention_forward(
                cross_attn_params, q, contexts, num_heads=self.config.cross_attn_heads
            )
        raise ValueError(f"Unsupported fusion_method: {method}")

    def trainable_mask(
        self, params: Params, train_embedder: bool, train_projector: bool
    ) -> Params:
        mask = {
            "embedder": jax.tree.map(lambda _: train_embedder, params["embedder"]),
            "projector": jax.tree.map(lambda _: train_projector, params["projector"]),
        }
        if "cross_attn" in params:
            mask["cross_attn"] = jax.tree.map(
                lambda _: train_projector, params["cross_attn"]
            )
        return mask


@AutoModality.register("moe_meditron_clip")
class MOEImageModality(_MOEBase):
    """Shared projector: fuse in native space, then project
    (reference ``image_modality_moe.py:152-210``)."""

    per_expert_projectors = False

    def encode(self, params: Params, values: jax.Array) -> jax.Array:
        stacked = self._expert_features(params, values)
        weights = self._gating_weights(params, values)
        fused = self._fuse(stacked, weights, params.get("cross_attn"))
        return mlp_projector_forward(params["projector"], fused)


@AutoModality.register("moe_meditron_clip_pep")
class MOEImageModalityPEP(_MOEBase):
    """Per-expert projectors: project each expert, fuse in LLM-dim space
    (reference ``image_modality_moe_pep.py:190-249``)."""

    per_expert_projectors = True

    def encode(self, params: Params, values: jax.Array) -> jax.Array:
        stacked = self._expert_features(params, values)  # (N, E, P, D_native)
        projected = jax.vmap(mlp_projector_forward)(
            params["projector"]["projectors"],
            stacked.transpose(1, 0, 2, 3),
        ).transpose(1, 0, 2, 3)  # (N, E, P, H_llm)
        weights = self._gating_weights(params, values)
        return self._fuse(projected, weights, params["projector"].get("cross_attn"))
