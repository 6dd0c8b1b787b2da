"""Gradio chat UI over the continuous-batching engine.

Parity with the reference's ``ui/app.py``: per-turn image attachments (one
attachment token per image prepended), temperature / top-p / max-token
sliders, new-chat reset. Falls back with a pointer to ``mmt serve`` (the
terminal chat) when gradio is not installed.

Run:  python ui/app.py --config config.yaml
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    def chat_fn(message, history, image, temperature, top_p, max_tokens):
        conversations = []
        for user, assistant in history:
            conversations.append({"role": "user", "content": user})
            if assistant is not None:
                conversations.append({"role": "assistant", "content": assistant})
        modalities = []
        content = message
        if image is not None:
            content = f"{attachment_token} {message}"
            modalities.append({"type": "image", "value": image})
        conversations.append({"role": "user", "content": content})
        sample = {"conversations": conversations, "modalities": modalities}
        req = engine.submit(
            collator([sample]), max_new_tokens=int(max_tokens),
            temperature=float(temperature), top_p=float(top_p),
        )
        engine.run()
        return tokenizer.decode(
            [t for t in req.tokens if t != model.config.eos_token_idx]
        )

    with gr.Blocks(title="multimeditron-tpu") as demo:
        chatbot = gr.Chatbot()
        with gr.Row():
            msg = gr.Textbox(label="Message", scale=4)
            image = gr.Image(type="pil", label="Attachment", scale=1)
        with gr.Row():
            temperature = gr.Slider(0.0, 2.0, value=0.7, label="Temperature")
            top_p = gr.Slider(0.05, 1.0, value=0.95, step=0.05, label="Top-p")
            max_tokens = gr.Slider(16, 1024, value=256, step=16, label="Max new tokens")
        clear = gr.Button("New chat")

        def respond(message, history, image, temperature, top_p, max_tokens):
            reply = chat_fn(message, history, image, temperature, top_p,
                            max_tokens)
            history = history + [(message, reply)]
            return "", history, None

        msg.submit(respond, [msg, chatbot, image, temperature, top_p, max_tokens],
                   [msg, chatbot, image])
        clear.click(lambda: [], None, chatbot)

    demo.launch(server_port=args.port)


if __name__ == "__main__":
    main()
