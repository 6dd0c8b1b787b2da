"""Chat templates for the supported LLM families.

Capability parity with the reference's ``ChatTemplate``
(``model/model.py:17-99``): per-role start/end delimiters plus the
``image_start``/``image_end`` special tokens used to wrap expanded
attachment spans.

Unlike the reference — which keeps delimiters only for label masking and
delegates actual prompt rendering to the HF tokenizer's Jinja template —
this class *renders deterministically itself*. That removes the Jinja
dependency from the hot tokenization path, makes rendering unit-testable,
and guarantees the delimiters used for label masking are exactly the ones
present in the rendered string.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List


@dataclass
class ChatTemplate:
    name: str = "custom"
    # role -> {"start": ..., "end": ...}
    delimiters: Dict[str, Dict[str, str]] = field(default_factory=dict)
    special_tokens: Dict[str, str] = field(default_factory=dict)
    # Literal text inserted between a start delimiter and the message body,
    # and after the end delimiter (family-specific whitespace conventions).
    after_start: str = ""
    after_end: str = ""
    add_bos: bool = True
    # Llama-3's HF Jinja template renders ``message['content'] | trim`` —
    # matching it keeps render() byte-identical to the tokenizer path the
    # reference trains with (tests/test_chat_template_golden.py).
    trim_content: bool = False

    # ------------------------------------------------------------------
    # Built-ins
    # ------------------------------------------------------------------
    @staticmethod
    def from_name(name: str) -> "ChatTemplate":
        templates = {
            "llama": ChatTemplate.llama,
            "apertus": ChatTemplate.apertus,
            "qwen3": ChatTemplate.qwen3,
        }
        if name not in templates:
            raise ValueError(
                f"Unknown chat template name: {name!r} (known: {sorted(templates)})"
            )
        return templates[name]()

    @staticmethod
    def llama() -> "ChatTemplate":
        """Llama-3 header style (reference ``model/model.py:47-60``)."""
        return ChatTemplate(
            name="llama",
            delimiters={
                "system": {
                    "start": "<|start_header_id|>system<|end_header_id|>",
                    "end": "<|eot_id|>",
                },
                "user": {
                    "start": "<|start_header_id|>user<|end_header_id|>",
                    "end": "<|eot_id|>",
                },
                "assistant": {
                    "start": "<|start_header_id|>assistant<|end_header_id|>",
                    "end": "<|eot_id|>",
                },
            },
            special_tokens={
                "image_start": "<|image_start|>",
                "image_end": "<|image_end|>",
            },
            after_start="\n\n",
            after_end="",
            add_bos=True,
            trim_content=True,
        )

    @staticmethod
    def apertus() -> "ChatTemplate":
        """Apertus style (reference ``model/model.py:65-79``)."""
        return ChatTemplate(
            name="apertus",
            delimiters={
                "system": {"start": "<|system_start|>", "end": "<|system_end|>"},
                "developer": {
                    "start": "<|developer_start|>",
                    "end": "<|developer_end|>",
                },
                "user": {"start": "<|user_start|>", "end": "<|user_end|>"},
                "assistant": {
                    "start": "<|assistant_start|>",
                    "end": "<|assistant_end|>",
                },
            },
            special_tokens={
                "image_start": "<|image_start|>",
                "image_end": "<|image_end|>",
            },
            after_start="",
            after_end="",
            add_bos=True,
        )

    @staticmethod
    def qwen3() -> "ChatTemplate":
        """Qwen-3 / ChatML style (reference ``model/model.py:84-99``)."""
        return ChatTemplate(
            name="qwen3",
            delimiters={
                "system": {"start": "<|im_start|>system", "end": "<|im_end|>"},
                "user": {"start": "<|im_start|>user", "end": "<|im_end|>"},
                "assistant": {"start": "<|im_start|>assistant", "end": "<|im_end|>"},
            },
            special_tokens={
                "image_start": "<|image_start|>",
                "image_end": "<|image_end|>",
            },
            after_start="\n",
            after_end="\n",
            add_bos=False,
        )

    # ------------------------------------------------------------------
    # Rendering
    # ------------------------------------------------------------------
    def render(
        self,
        conversation: List[Dict[str, Any]],
        add_generation_prompt: bool = False,
    ) -> str:
        """Serialize a conversation (list of {role, content}) to a string.

        The attachment placeholder tokens inside message contents are passed
        through verbatim; expansion happens later in the tokenizer.
        """
        parts: List[str] = []
        for message in conversation:
            role = message["role"]
            if role not in self.delimiters:
                raise ValueError(
                    f"Role {role!r} has no delimiters in template {self.name!r}"
                )
            content = message.get("content", message.get("value", ""))
            if self.trim_content:
                content = content.strip()
            delim = self.delimiters[role]
            parts.append(
                f"{delim['start']}{self.after_start}{content}{delim['end']}{self.after_end}"
            )
        rendered = "".join(parts)
        if add_generation_prompt:
            delim = self.delimiters["assistant"]
            rendered += f"{delim['start']}{self.after_start}"
        return rendered
