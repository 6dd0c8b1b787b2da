"""Multimodal prompt tokenization: attachment expansion, label masking,
token-range computation and padding.

Capability parity with the reference's ``PromptTokenizer``
(``model/prompt_tokenizers.py``), re-implemented host-side in pure numpy:

- each attachment placeholder token expands to ``num_embeddings`` copies,
  optionally wrapped in ``image_start``/``image_end`` for image modalities
  (reference ``expand_attachment_input_tokens:309-372``,
  ``_build_attachment_tokens:288-306``);
- labels outside assistant spans are masked to ``IGNORE_TOKEN_INDEX`` by
  matching role-delimiter token tags (reference
  ``replace_between_tags_v2:419-428``);
- per-modality ``(start, end)`` token ranges are derived from attachment
  positions + cumulative modality lengths (reference
  ``compute_token_range:255-286``);
- batch padding is left- or right-sided (reference ``pad_tokenized:122-152``)
  and optionally to a fixed target length, which the TPU path uses for
  bucketed static shapes.

Everything here is numpy on host; the device graph only consumes the
resulting fixed-shape int32 arrays.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from multimeditron_tpu.constants import (
    CONVERSATIONS_KEY,
    IGNORE_TOKEN_INDEX,
    MODALITIES_KEY,
    MODALITY_TYPE_KEY,
    NUM_EMBEDDINGS_KEY,
    TEXT_KEY,
)
from multimeditron_tpu.data.chat_template import ChatTemplate
from multimeditron_tpu.data.tokenizer import TokenizerLike


def find_tag_positions(sequence: np.ndarray, tag: Sequence[int]) -> np.ndarray:
    """Return the start index of every occurrence of ``tag`` in ``sequence``."""
    tag = np.asarray(tag, dtype=sequence.dtype)
    n, m = len(sequence), len(tag)
    if m == 0 or n < m:
        return np.empty((0,), dtype=np.int64)
    windows = np.lib.stride_tricks.sliding_window_view(sequence, m)
    return np.nonzero((windows == tag).all(axis=1))[0]


def mask_between_tags(
    labels: np.ndarray,
    left_tag: Sequence[int],
    right_tag: Sequence[int],
    mask_value: int = IGNORE_TOKEN_INDEX,
) -> np.ndarray:
    """Mask label spans from each left tag through its matching right tag
    (both inclusive). Each left tag is paired with the first right tag whose
    start is >= the left tag's start, matching the reference's
    searchsorted-based pairing (``prompt_tokenizers.py:419-428``).
    """
    labels = labels.copy()
    starts = find_tag_positions(labels, left_tag)
    ends = find_tag_positions(labels, right_tag)
    if len(starts) == 0 or len(ends) == 0:
        return labels
    pair_idx = np.searchsorted(ends, starts)
    for start, idx in zip(starts, pair_idx):
        if idx >= len(ends):
            continue
        end = ends[idx]
        labels[start : end + len(right_tag)] = mask_value
    return labels


class PromptTokenizer:
    def __init__(
        self,
        tokenizer: TokenizerLike,
        chat_template: ChatTemplate,
        attachment_token: str,
        modalities_num_embeddings: Optional[Dict[str, Optional[int]]] = None,
        ignore_index: int = IGNORE_TOKEN_INDEX,
        padding_side: str = "right",
    ):
        self.tokenizer = tokenizer
        self.chat_template = chat_template
        self.modalities_num_embeddings = modalities_num_embeddings or {}
        self.ignore_index = ignore_index
        self.padding_side = padding_side

        self.attachment_token = attachment_token
        self.attachment_token_idx = tokenizer.token_to_id(attachment_token)
        self.pad_token_idx = tokenizer.pad_id

        self.special_token_ids = {
            name: tokenizer.token_to_id(tok)
            for name, tok in chat_template.special_tokens.items()
            if tok is not None
        }

        # Pre-tokenize role delimiters once; they are reused for label
        # masking on every sample.
        self._delimiter_tags = {
            role: (
                tokenizer.encode(delims["start"]),
                tokenizer.encode(delims["end"]),
            )
            for role, delims in chat_template.delimiters.items()
        }

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------
    @property
    def vocab_size(self) -> int:
        return self.tokenizer.vocab_size

    def tokenize_samples(
        self,
        samples: List[Dict[str, Any]] | Dict[str, Any],
        add_eos_token: bool = True,
        add_generation_prompt: bool = False,
        pad_to: Optional[int] = None,
    ) -> List[Dict[str, Any]]:
        """Tokenize a batch of samples (conversation- or text-style), expand
        attachments, mask labels, pad to a common (or fixed) length and
        annotate each modality with its ``token_range``.
        """
        if isinstance(samples, dict):
            samples = [samples]

        tokenized: List[Dict[str, np.ndarray]] = []
        for sample in samples:
            modalities = sample.get(MODALITIES_KEY, [])
            if CONVERSATIONS_KEY in sample:
                tokenized.append(
                    self._tokenize_conversation(
                        sample[CONVERSATIONS_KEY],
                        modalities,
                        add_eos_token=add_eos_token,
                        add_generation_prompt=add_generation_prompt,
                    )
                )
            elif TEXT_KEY in sample:
                tokenized.append(self._tokenize_text(sample[TEXT_KEY], modalities))
            else:
                raise ValueError(
                    "Each sample must contain either 'text' or 'conversations'"
                )

        padded = self.pad_tokenized(tokenized, pad_to=pad_to)

        out: List[Dict[str, Any]] = []
        for i, sample in enumerate(samples):
            modalities = [m.copy() for m in sample.get(MODALITIES_KEY, [])]
            ranges = self.compute_token_range(padded["input_ids"][i], modalities)
            for modality, token_range in zip(modalities, ranges):
                modality["token_range"] = token_range
            out.append(
                {
                    "input_ids": padded["input_ids"][i],
                    "attention_mask": padded["attention_mask"][i],
                    "labels": padded["labels"][i],
                    MODALITIES_KEY: modalities,
                }
            )
        return out

    # ------------------------------------------------------------------
    # Padding
    # ------------------------------------------------------------------
    def pad_tokenized(
        self,
        tokenized: List[Dict[str, np.ndarray]],
        pad_to: Optional[int] = None,
    ) -> Dict[str, np.ndarray]:
        max_len = max(len(t["input_ids"]) for t in tokenized)
        target = pad_to if pad_to is not None else max_len
        if max_len > target:
            raise ValueError(
                f"Sequence length {max_len} exceeds requested pad length {target}"
            )

        pad_values = {
            "input_ids": self.pad_token_idx,
            "attention_mask": 0,
            "labels": self.ignore_index,
        }
        batch = {
            key: np.full((len(tokenized), target), value, dtype=np.int32)
            for key, value in pad_values.items()
        }
        for i, sample in enumerate(tokenized):
            n = len(sample["input_ids"])
            for key in batch:
                if self.padding_side == "left":
                    batch[key][i, target - n :] = sample[key]
                else:
                    batch[key][i, :n] = sample[key]
        return batch

    # ------------------------------------------------------------------
    # Attachment expansion
    # ------------------------------------------------------------------
    def get_num_embeddings(self, modality: Dict[str, Any]) -> int:
        if NUM_EMBEDDINGS_KEY in modality:
            return int(modality[NUM_EMBEDDINGS_KEY])
        mtype = modality[MODALITY_TYPE_KEY]
        configured = self.modalities_num_embeddings.get(mtype)
        if configured is not None:
            return int(configured)
        raise ValueError(
            f"Modality must contain a {NUM_EMBEDDINGS_KEY!r} key or a configured "
            f"num_embeddings for type {mtype!r}"
        )

    def _build_attachment_tokens(
        self, num_embeddings: int, modality: Dict[str, Any]
    ) -> np.ndarray:
        """One attachment placeholder becomes ``num_embeddings`` attachment
        tokens, wrapped in image_start/image_end for image modalities
        (reference ``_build_attachment_tokens:288-306``)."""
        ids = [self.attachment_token_idx] * num_embeddings
        if modality.get(MODALITY_TYPE_KEY) == "image":
            start = self.special_token_ids.get("image_start")
            end = self.special_token_ids.get("image_end")
            if start is not None and end is not None:
                ids = [start] + ids + [end]
        return np.asarray(ids, dtype=np.int32)

    def expand_attachment_tokens(
        self,
        token_ids: np.ndarray,
        modalities: List[Dict[str, Any]],
    ) -> np.ndarray:
        """Expand each attachment placeholder in ``token_ids`` to the full
        per-modality attachment span, in order of appearance."""
        token_ids = np.asarray(token_ids, dtype=np.int32)
        if len(modalities) == 0:
            return token_ids

        placeholder_positions = np.nonzero(token_ids == self.attachment_token_idx)[0]
        if len(placeholder_positions) != len(modalities):
            raise ValueError(
                f"Sample declares {len(modalities)} modalities but the prompt "
                f"contains {len(placeholder_positions)} attachment tokens"
            )

        pieces: List[np.ndarray] = []
        prev = 0
        for pos, modality in zip(placeholder_positions, modalities):
            pieces.append(token_ids[prev:pos])
            pieces.append(
                self._build_attachment_tokens(
                    self.get_num_embeddings(modality), modality
                )
            )
            prev = pos + 1
        pieces.append(token_ids[prev:])
        return np.concatenate(pieces)

    def compute_token_range(
        self,
        input_ids: np.ndarray,
        modalities: List[Dict[str, Any]],
    ) -> List[Tuple[int, int]]:
        """Per-modality (start, end) positions of its attachment tokens in
        the (padded) sequence (reference ``compute_token_range:255-286``)."""
        if len(modalities) == 0:
            return []
        input_ids = np.asarray(input_ids)
        positions = np.nonzero(input_ids == self.attachment_token_idx)[0]
        lengths = [self.get_num_embeddings(m) for m in modalities]
        if len(positions) != sum(lengths):
            raise ValueError(
                f"Found {len(positions)} attachment tokens but modalities "
                f"declare {sum(lengths)} embeddings"
            )
        starts = positions[np.cumsum([0] + lengths[:-1])]
        return [(int(s), int(s) + l) for s, l in zip(starts, lengths)]

    # ------------------------------------------------------------------
    # Conversation / text tokenization
    # ------------------------------------------------------------------
    def _encode_with_bos(self, text: str) -> List[int]:
        ids = self.tokenizer.encode(text)
        if self.chat_template.add_bos and self.tokenizer.bos_id is not None:
            ids = [self.tokenizer.bos_id] + ids
        return ids

    def _tokenize_conversation(
        self,
        conversation: List[Dict[str, str]],
        modalities: List[Dict[str, Any]],
        add_eos_token: bool = True,
        add_generation_prompt: bool = False,
    ) -> Dict[str, np.ndarray]:
        rendered = self.chat_template.render(
            conversation, add_generation_prompt=add_generation_prompt
        )
        ids = self._encode_with_bos(rendered)
        if add_eos_token and not add_generation_prompt:
            if len(ids) == 0 or ids[-1] != self.tokenizer.eos_id:
                ids = ids + [self.tokenizer.eos_id]

        input_ids = self.expand_attachment_tokens(
            np.asarray(ids, dtype=np.int32), modalities
        )
        attention_mask = np.ones_like(input_ids)

        labels = input_ids.copy()
        # Mask every non-assistant role span (delimiters inclusive), the
        # attachment spans inside them come along for free; attachment
        # tokens elsewhere are masked explicitly below.
        for role, (left_tag, right_tag) in self._delimiter_tags.items():
            if role == "assistant":
                continue
            labels = mask_between_tags(labels, left_tag, right_tag, self.ignore_index)
        labels = np.where(
            input_ids == self.attachment_token_idx, self.ignore_index, labels
        )
        return {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "labels": labels.astype(np.int32),
        }

    def _tokenize_text(
        self, text: str, modalities: List[Dict[str, Any]]
    ) -> Dict[str, np.ndarray]:
        ids = self._encode_with_bos(text)
        input_ids = self.expand_attachment_tokens(
            np.asarray(ids, dtype=np.int32), modalities
        )
        attention_mask = np.ones_like(input_ids)
        labels = np.where(
            input_ids == self.attachment_token_idx, self.ignore_index, input_ids
        )
        return {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "labels": labels.astype(np.int32),
        }
