"""Host-side tokenizer facade.

The TPU compute path only ever sees fixed-shape int32 arrays; everything
string-shaped lives behind this small protocol so the framework does not
hard-depend on HF ``transformers`` (it adapts to it when present).
"""

from __future__ import annotations

from typing import List, Optional, Protocol, runtime_checkable


@runtime_checkable
class TokenizerLike(Protocol):
    """Minimal tokenizer interface used by the data pipeline."""

    def encode(self, text: str) -> List[int]:
        """Tokenize ``text`` to ids, WITHOUT adding special tokens."""
        ...

    def decode(self, ids: List[int]) -> str:
        ...

    def token_to_id(self, token: str) -> int:
        ...

    @property
    def pad_id(self) -> int:
        ...

    @property
    def eos_id(self) -> int:
        ...

    @property
    def bos_id(self) -> Optional[int]:
        ...

    @property
    def vocab_size(self) -> int:
        ...


class HFTokenizer:
    """Adapter from a HuggingFace tokenizer to :class:`TokenizerLike`.

    Mirrors how the reference consumes ``PreTrainedTokenizerBase``
    (``model/prompt_tokenizers.py:35-48``), including falling back to EOS as
    the pad token when none is configured.
    """

    def __init__(self, hf_tokenizer):
        self._tok = hf_tokenizer

    @property
    def hf(self):
        return self._tok

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text, add_special_tokens=False)

    def decode(self, ids: List[int]) -> str:
        return self._tok.decode(list(ids))

    def token_to_id(self, token: str) -> int:
        idx = self._tok.convert_tokens_to_ids(token)
        if idx is None:
            raise KeyError(f"Token {token!r} not in tokenizer vocabulary")
        return idx

    @property
    def pad_id(self) -> int:
        if self._tok.pad_token_id is not None:
            return self._tok.pad_token_id
        return self._tok.eos_token_id

    @property
    def eos_id(self) -> int:
        return self._tok.eos_token_id

    @property
    def bos_id(self) -> Optional[int]:
        return self._tok.bos_token_id

    @property
    def vocab_size(self) -> int:
        return len(self._tok)
