"""Multimodal batch collation into STATIC-SHAPE device arrays.

Capability parity with the reference's ``DataCollatorForMultimodal``
(``model/data_loader.py:13-199``): load modality values, process to
tensors, tokenize/expand/pad, build scatter indices and position ids.

TPU-first differences:
- sequence lengths are bucketed (padded to a multiple, or to a fixed
  length) and modality item counts are padded to a per-type budget, so the
  jitted train step never recompiles on batch composition;
- scatter indices are flattened (batch_idx, token_pos) int32 arrays with
  out-of-range batch indices marking padded slots — the device scatter
  drops them (``MultimodalModel.embed``);
- the reference's post-hoc truncation of embeds beyond max_sequence_length
  (``model/model.py:505-514``) maps to truncating token arrays here and
  dropping scatter positions past the limit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np

from multimeditron_tpu.constants import (
    MODALITIES_KEY,
    MODALITY_TYPE_KEY,
    MODALITY_VALUE_KEY,
    NUM_EMBEDDINGS_KEY,
    POSITION_IDS_KEY,
    TOKEN_RANGE_KEY,
)
from multimeditron_tpu.data.chat_template import ChatTemplate
from multimeditron_tpu.data.loaders import BaseModalityLoader
from multimeditron_tpu.data.prompt_tokenizer import PromptTokenizer
from multimeditron_tpu.data.tokenizer import TokenizerLike


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclasses.dataclass
class DataCollatorForMultimodal:
    tokenizer: TokenizerLike
    modality_processors: Dict[str, Any]
    modality_loaders: Dict[str, BaseModalityLoader]
    attachment_token: str
    chat_template: ChatTemplate
    add_generation_prompt: bool = False
    use_2d_position_ids: bool = False
    padding_side: str = "right"
    # Static-shape controls:
    pad_to_multiple: int = 128
    fixed_seq_len: Optional[int] = None
    truncation: bool = False
    max_sequence_length: Optional[int] = None
    # modality_type -> max items per batch (padded); None = exact count.
    modality_budgets: Optional[Dict[str, int]] = None

    def __post_init__(self):
        self._prompt_tokenizer = PromptTokenizer(
            tokenizer=self.tokenizer,
            chat_template=self.chat_template,
            attachment_token=self.attachment_token,
            padding_side=self.padding_side,
        )

    # ------------------------------------------------------------------
    def __call__(self, raw_features: List[Dict[str, Any]]) -> Dict[str, Any]:
        # 1. Load raw modality values (paths/bytes -> PIL etc).
        samples = [
            BaseModalityLoader.load_modalities(f, self.modality_loaders)
            for f in raw_features
        ]
        # 2. Host modality processing (PIL -> pixel arrays + num_embeddings).
        samples = [self._process_modalities(s) for s in samples]

        # 3. Tokenize, expand attachments, mask labels.
        tokenized = self._prompt_tokenizer.tokenize_samples(
            samples, add_generation_prompt=self.add_generation_prompt
        )

        # 4. Pad/bucket the sequence dimension (and truncate if configured).
        cur_len = len(tokenized[0]["input_ids"])
        target = self.fixed_seq_len or _round_up(cur_len, self.pad_to_multiple)
        if self.truncation and self.max_sequence_length is not None:
            target = min(target, self.max_sequence_length)

        batch = {}
        B = len(tokenized)
        for key in ("input_ids", "attention_mask", "labels"):
            arrs = np.stack([t[key] for t in tokenized])
            if arrs.shape[1] > target:
                arrs = arrs[:, :target]
            elif arrs.shape[1] < target:
                pad_width = target - arrs.shape[1]
                pad_value = {
                    "input_ids": self._prompt_tokenizer.pad_token_idx,
                    "attention_mask": 0,
                    "labels": self._prompt_tokenizer.ignore_index,
                }[key]
                pad_spec = (
                    ((0, 0), (pad_width, 0))
                    if self.padding_side == "left"
                    else ((0, 0), (0, pad_width))
                )
                arrs = np.pad(arrs, pad_spec, constant_values=pad_value)
            batch[key] = arrs.astype(np.int32)

        # 5. Modality stacks + flattened scatter indices.
        batch["mm_inputs"] = self._build_mm_inputs(tokenized, B, target)

        # 6. Position ids.
        batch["position_ids"] = self._build_position_ids(batch, tokenized, target)
        return batch

    # ------------------------------------------------------------------
    def _process_modalities(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        out = sample.copy()
        out[MODALITIES_KEY] = []
        for modality in sample.get(MODALITIES_KEY, []):
            processor = self.modality_processors[modality[MODALITY_TYPE_KEY]]
            out[MODALITIES_KEY].append(processor.process(modality))
        return out

    def _build_mm_inputs(
        self, tokenized: List[Dict[str, Any]], B: int, seq_len: int
    ) -> Dict[str, Dict[str, np.ndarray]]:
        per_type: Dict[str, List[tuple]] = {}
        for b, sample in enumerate(tokenized):
            for pm in sample.get(MODALITIES_KEY, []):
                per_type.setdefault(pm[MODALITY_TYPE_KEY], []).append((b, pm))

        mm_inputs: Dict[str, Dict[str, np.ndarray]] = {}
        for mtype, items in per_type.items():
            processor = self.modality_processors[mtype]
            n_emb = processor.num_embeddings
            budget = (self.modality_budgets or {}).get(mtype, len(items))
            if len(items) > budget:
                raise ValueError(
                    f"Batch contains {len(items)} {mtype!r} items, over the "
                    f"budget of {budget}"
                )
            value_shape = processor.value_shape
            values = np.zeros(
                (budget, *value_shape),
                dtype=getattr(processor, "value_dtype", np.float32),
            )
            batch_idx = np.full((budget * n_emb,), B, dtype=np.int32)  # B = drop
            token_pos = np.zeros((budget * n_emb,), dtype=np.int32)
            for i, (b, pm) in enumerate(items):
                values[i] = pm[MODALITY_VALUE_KEY]
                start, end = pm[TOKEN_RANGE_KEY]
                assert end - start == n_emb, (
                    f"{mtype}: token range {end - start} != num_embeddings {n_emb}"
                )
                positions = np.arange(start, end, dtype=np.int32)
                keep = positions < seq_len  # truncation drops the tail
                sl = slice(i * n_emb, (i + 1) * n_emb)
                batch_idx[sl] = np.where(keep, b, B)
                token_pos[sl] = np.where(keep, positions, 0)
            mm_inputs[mtype] = {
                "values": values,
                "batch_idx": batch_idx,
                "token_pos": token_pos,
            }
        return mm_inputs

    def _build_position_ids(
        self,
        batch: Dict[str, np.ndarray],
        tokenized: List[Dict[str, Any]],
        seq_len: int,
    ) -> np.ndarray:
        attention_mask = batch["attention_mask"]
        position_ids = np.cumsum(attention_mask, axis=-1) - 1
        position_ids = np.where(attention_mask == 0, 0, position_ids).astype(np.int64)

        if not self.use_2d_position_ids:
            has_custom = any(
                POSITION_IDS_KEY in pm
                for s in tokenized
                for pm in s.get(MODALITIES_KEY, [])
            )
            if has_custom:
                import warnings

                warnings.warn(
                    "Modality processors produced position_ids but "
                    "use_2d_position_ids is off; they are ignored "
                    "(reference collator behaves the same, data_loader.py:190-195)."
                )
            return position_ids.astype(np.int32)

        # 2-D position ids with downstream shift correction (reference
        # ``data_loader.py:159-188``): image patches consume a 2-D grid of
        # positions, and later tokens shift back by the difference between
        # the 1-D span length and the 2-D extent.
        pos2d = np.repeat(position_ids[..., None], 2, axis=-1)
        for b, sample in enumerate(tokenized):
            for pm in sample.get(MODALITIES_KEY, []):
                if POSITION_IDS_KEY not in pm:
                    continue
                start, end = pm[TOKEN_RANGE_KEY]
                if end > seq_len:
                    continue  # truncated away
                mod_pos = np.asarray(pm[POSITION_IDS_KEY])
                if mod_pos.shape != (end - start, 2):
                    raise ValueError(
                        f"Modality processor for {pm[MODALITY_TYPE_KEY]!r} "
                        f"returned position_ids with shape {mod_pos.shape}, "
                        f"expected ({end - start}, 2)"
                    )
                old_last = (
                    pos2d[b, end - 1].copy() if start > 0 else np.zeros(2, np.int64)
                )
                shifted = mod_pos + pos2d[b, start][None, :]
                new_last = np.full((2,), shifted[-1].max(), np.int64)
                pos2d[b, start:end] = shifted
                pos2d[b, end:] += (new_last - old_last)[None, :]
        # Keep pad rows at 0 (the reference lets the shift drag pads
        # negative, data_loader.py:188 — harmless there, but clean zeros are
        # safer for rope on TPU).
        pos2d = np.where(attention_mask[..., None] == 0, 0, pos2d)
        return pos2d.astype(np.int32)
