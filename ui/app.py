"""Gradio chat UI over the continuous-batching engine.

Parity with the reference's ``ui/app.py``: MULTIPLE per-turn image
attachments (a multimodal textbox whose message is ``{"text", "files"}``;
one attachment token prepended per file, one image modality per file —
``/root/reference/ui/app.py:156-176``), temperature / top-p / max-token
sliders, new-chat reset. Falls back with a pointer to ``mmt serve`` (the
terminal chat) when gradio is not installed.

Run:  python ui/app.py --config config.yaml
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Any, Dict, List, Tuple, Union

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_turn(
    message: Union[str, Dict[str, Any]],
    history: List[Dict[str, str]],
    attachment_token: str,
) -> Tuple[Dict[str, Any], str]:
    """Normalize a (possibly multimodal) gradio message into a collator
    sample: ``message`` is either plain text or ``{"text", "files"}``
    with a LIST of file paths / images; each file contributes one
    attachment token (prepended, reference parity) and one image
    modality. Returns (sample, user_text_for_display)."""
    if isinstance(message, dict):
        user_text = (message.get("text") or "").strip()
        files = message.get("files") or []
        values = [getattr(f, "name", f) for f in files]
    else:
        user_text = str(message).strip()
        values = []

    prefix = (" ".join([attachment_token] * len(values)) + " "
              if values else "")
    content = f"{prefix}{user_text}" if values else user_text
    # keep only text turns: gradio "messages" history may carry file
    # entries (dict content) used for display, not for the model
    conversations = [
        {"role": m["role"], "content": m["content"]}
        for m in (history or [])
        if isinstance(m.get("content"), str)
    ]
    conversations.append({"role": "user", "content": content})
    modalities = [{"type": "image", "value": v} for v in values]
    return {"conversations": conversations, "modalities": modalities}, user_text


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args()

    try:
        import gradio as gr
    except ImportError:
        raise SystemExit(
            "gradio is not installed in this environment; use the terminal "
            "chat instead:  mmt serve -c " + args.config
        )

    from multimeditron_tpu.cli.common import engine_config_from_cfg, load_config
    from multimeditron_tpu.cli.generate import _load_model_and_collator
    from multimeditron_tpu.serve.engine import ServingEngine

    cfg = load_config(args.config)
    model, params, tokenizer, collator = _load_model_and_collator(cfg)
    # top_p < 1.0 compiles the nucleus filter in so the slider's
    # per-request values work without recompiles
    cfg.setdefault("serve", {}).setdefault("top_p", 0.95)
    engine = ServingEngine(model, params, engine_config_from_cfg(cfg))
    attachment_token = cfg["attachment_token"]

    def chat_fn(message, history, temperature, top_p, max_tokens):
        sample, _ = build_turn(message, history, attachment_token)
        req = engine.submit(
            collator([sample]), max_new_tokens=int(max_tokens),
            temperature=float(temperature), top_p=float(top_p),
        )
        engine.run()
        return tokenizer.decode(
            [t for t in req.tokens if t != model.config.eos_token_idx]
        )

    with gr.Blocks(title="multimeditron-tpu") as demo:
        chatbot = gr.Chatbot(type="messages")
        msg = gr.MultimodalTextbox(
            file_types=["image"], file_count="multiple",
            label="Message (attach any number of images)",
            placeholder="Type a message and attach images...",
        )
        with gr.Row():
            temperature = gr.Slider(0.0, 2.0, value=0.7, label="Temperature")
            top_p = gr.Slider(0.05, 1.0, value=0.95, step=0.05, label="Top-p")
            max_tokens = gr.Slider(16, 1024, value=256, step=16,
                                   label="Max new tokens")
        clear = gr.Button("New chat")

        def respond(message, history, temperature, top_p, max_tokens):
            history = history or []
            reply = chat_fn(message, history, temperature, top_p, max_tokens)
            text = (message.get("text") if isinstance(message, dict)
                    else message) or ""
            shown = list(history)
            if isinstance(message, dict):
                for f in message.get("files") or []:
                    shown.append({"role": "user",
                                  "content": {"path": getattr(f, "name", f)}})
            shown.append({"role": "user", "content": text})
            shown.append({"role": "assistant", "content": reply})
            return {"text": "", "files": []}, shown

        msg.submit(respond, [msg, chatbot, temperature, top_p, max_tokens],
                   [msg, chatbot])
        clear.click(lambda: [], None, chatbot)

    demo.launch(server_port=args.port)


if __name__ == "__main__":
    main()
