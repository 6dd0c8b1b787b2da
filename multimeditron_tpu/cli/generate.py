"""``mmt generate`` (batch inference, reference ``inference.py`` parity)
and ``mmt serve`` (continuous-batching engine + interactive chat,
reference ``ui/app.py`` capability in terminal form)."""

from __future__ import annotations

import json
import logging

import click

from multimeditron_tpu.cli import EPILOG, main_cli

logger = logging.getLogger(__name__)


def _load_model_and_collator(cfg, add_generation_prompt=True):
    import jax

    from multimeditron_tpu.cli.common import (
        build_collator,
        build_model,
        build_tokenizer,
    )

    tokenizer, chat_template = build_tokenizer(cfg)
    model = build_model(cfg, vocab_size=tokenizer.vocab_size,
                        eos_token_idx=tokenizer.eos_id)
    if cfg.get("base_model"):
        from multimeditron_tpu.models.hf_export import import_multimodal

        model, params = import_multimodal(cfg["base_model"])
        model.config.eos_token_idx = tokenizer.eos_id
    else:
        params = model.bootstrap_params(jax.random.PRNGKey(0))
    collator = build_collator(
        cfg, model, tokenizer, chat_template,
        add_generation_prompt=add_generation_prompt,
    )
    return model, params, tokenizer, collator


@main_cli.command(epilog=EPILOG)
@click.option("--config", "-c", type=click.Path(exists=True), required=True)
@click.option("--input", "-i", "input_path", type=click.Path(exists=True),
              required=True, help="JSONL of samples (conversations/modalities)")
@click.option("--output", "-o", type=click.Path(), default=None)
@click.option("--max-new-tokens", default=256)
@click.option("--temperature", default=0.1)
@click.option("--greedy", is_flag=True)
def generate(config, input_path, output, max_new_tokens, temperature, greedy):
    """Batch inference over a JSONL of samples."""
    from multimeditron_tpu.cli.common import engine_config_from_cfg, load_config
    from multimeditron_tpu.serve.engine import ServingEngine
    from multimeditron_tpu.utils.jsonl import JSONLGenerator

    cfg = load_config(config)
    model, params, tokenizer, collator = _load_model_and_collator(cfg)
    engine = ServingEngine(
        model, params,
        engine_config_from_cfg(
            cfg,
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            do_sample=not greedy,
        ),
    )
    samples = list(JSONLGenerator(input_path))
    batches = [collator([s]) for s in samples]
    outputs = engine.generate(batches, max_new_tokens=max_new_tokens)

    results = []
    for sample, tokens in zip(samples, outputs):
        text = tokenizer.decode(
            [t for t in tokens if t != model.config.eos_token_idx]
        )
        results.append({"sample": sample, "generated": text, "tokens": tokens})
        click.echo(text)
    if output:
        with open(output, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


@main_cli.command(epilog=EPILOG)
@click.option("--config", "-c", type=click.Path(exists=True), required=True)
@click.option("--max-new-tokens", default=256)
@click.option("--temperature", default=0.7)
def serve(config, max_new_tokens, temperature):
    """Interactive chat through the continuous-batching engine
    (reference Gradio UI capability, ``ui/app.py``: per-turn image
    attachments via ``/image <path>``, sampling controls, ``/new`` reset)."""
    from multimeditron_tpu.cli.common import engine_config_from_cfg, load_config
    from multimeditron_tpu.serve.engine import ServingEngine

    cfg = load_config(config)
    model, params, tokenizer, collator = _load_model_and_collator(cfg)
    engine = ServingEngine(
        model, params,
        engine_config_from_cfg(
            cfg,
            max_new_tokens=max_new_tokens,
            temperature=temperature,
        ),
    )
    attachment_token = cfg["attachment_token"]
    history = []
    pending_images = []
    click.echo("Chat ready. /image <path> attaches an image, /new resets, /quit exits.")
    while True:
        try:
            user = input("you> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not user:
            continue
        if user == "/quit":
            break
        if user == "/new":
            history, pending_images = [], []
            click.echo("(new chat)")
            continue
        if user.startswith("/image "):
            pending_images.append(user[len("/image "):].strip())
            click.echo(f"(attached {pending_images[-1]})")
            continue

        content = ("".join(attachment_token + " " for _ in pending_images)) + user
        history.append({"role": "user", "content": content})
        modalities = [{"type": "image", "value": p} for p in pending_images]
        pending_images = []
        sample = {"conversations": list(history), "modalities": modalities}
        req = engine.submit(collator([sample]), max_new_tokens=max_new_tokens,
                            temperature=temperature)
        engine.run()
        reply = tokenizer.decode(
            [t for t in req.tokens if t != model.config.eos_token_idx]
        )
        history.append({"role": "assistant", "content": reply})
        click.echo(f"model> {reply}  (ttft {req.ttft:.2f}s)")
