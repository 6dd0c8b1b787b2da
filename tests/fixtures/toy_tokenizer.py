"""A deterministic word-level tokenizer for unit tests.

Implements multimeditron_tpu.data.tokenizer.TokenizerLike. Special tokens
(anything matching <|...|>) are single tokens; other text is split on
whitespace. The vocabulary grows deterministically in encounter order from
a fixed base, so tests are reproducible.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

_SPECIAL_RE = re.compile(r"(<\|[^|<>]+\|>)")

BASE_SPECIALS = [
    "<pad>",
    "<bos>",
    "<eos>",
    "<|attachment|>",
    "<|image_start|>",
    "<|image_end|>",
    "<|start_header_id|>system<|end_header_id|>",
    "<|eot_id|>",
    "<|im_start|>system",
    "<|im_end|>",
    "<|system_start|>",
    "<|system_end|>",
    "<|user_start|>",
    "<|user_end|>",
    "<|assistant_start|>",
    "<|assistant_end|>",
]


class ToyTokenizer:
    def __init__(self):
        self._vocab: Dict[str, int] = {}
        self._inv: List[str] = []
        for tok in BASE_SPECIALS:
            self._add(tok)
        # Llama-style headers are multi-part specials; register them whole.
        for role in ("system", "user", "assistant"):
            self._add(f"<|start_header_id|>{role}<|end_header_id|>")

    def _add(self, token: str) -> int:
        if token not in self._vocab:
            self._vocab[token] = len(self._inv)
            self._inv.append(token)
        return self._vocab[token]

    def _split(self, text: str) -> List[str]:
        # First carve out llama-style composite headers, then specials, then words.
        header_re = re.compile(r"(<\|start_header_id\|>\w+<\|end_header_id\|>)")
        tokens: List[str] = []
        for part in header_re.split(text):
            if header_re.fullmatch(part):
                tokens.append(part)
                continue
            for sub in _SPECIAL_RE.split(part):
                if _SPECIAL_RE.fullmatch(sub):
                    tokens.append(sub)
                elif sub.startswith("<|im_start|>"):
                    tokens.append(sub.split("\n")[0])
                    rest = sub[len(tokens[-1]) :]
                    tokens.extend(rest.split())
                else:
                    tokens.extend(sub.split())
        return tokens

    def encode(self, text: str) -> List[int]:
        return [self._add(t) for t in self._split(text)]

    def decode(self, ids: List[int]) -> str:
        return " ".join(
            self._inv[i] if 0 <= i < len(self._inv) else f"<{i}>" for i in ids
        )

    def token_to_id(self, token: str) -> int:
        return self._add(token)

    @property
    def pad_id(self) -> int:
        return self._vocab["<pad>"]

    @property
    def eos_id(self) -> int:
        return self._vocab["<eos>"]

    @property
    def bos_id(self) -> Optional[int]:
        return self._vocab["<bos>"]

    @property
    def vocab_size(self) -> int:
        return 4096  # headroom for dynamically added words
