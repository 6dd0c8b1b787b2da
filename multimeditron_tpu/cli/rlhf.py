"""``mmt rlhf``: GRPO RLHF training.

Parity with the reference's ``mm verl`` command (``cli/verl.py:13-105`` +
``verl/__init__.py`` TaskRunner): same capability — config-driven GRPO
with reward-manager selection and a ``--dryrun`` that builds the whole
trainer graph without training — without the Ray control plane (policy and
rollout are colocated on the mesh, SURVEY.md §7.1).
"""

from __future__ import annotations

import logging

import click

from multimeditron_tpu.cli import EPILOG, main_cli

logger = logging.getLogger(__name__)


@main_cli.command(epilog=EPILOG, context_settings=dict(
    ignore_unknown_options=True, allow_extra_args=True))
@click.option("--config", "-c", type=click.Path(exists=True), required=True)
@click.option("--dryrun", is_flag=True,
              help="Build the trainer (model, engine, rewards) without training")
@click.option("--steps", default=None, type=int, help="Override number of GRPO steps")
@click.pass_context
def rlhf(ctx, config, dryrun, steps):
    import jax

    from multimeditron_tpu.cli.common import (
        build_collator,
        build_model,
        build_tokenizer,
        load_config,
    )
    from multimeditron_tpu.models.multimodal import TrainingMode
    from multimeditron_tpu.rlhf.grpo import GRPOConfig, GRPOTrainer
    from multimeditron_tpu.rlhf.ppo import PPOConfig, PPOTrainer
    from multimeditron_tpu.utils.jsonl import JSONLGenerator

    cfg = load_config(config, ctx.args)
    tokenizer, chat_template = build_tokenizer(cfg)
    model = build_model(cfg, vocab_size=tokenizer.vocab_size,
                        eos_token_idx=tokenizer.eos_id)
    if cfg.get("base_model"):
        from multimeditron_tpu.models.hf_export import import_multimodal

        model, params = import_multimodal(cfg["base_model"])
        model.config.eos_token_idx = tokenizer.eos_id
    else:
        params = model.bootstrap_params(jax.random.PRNGKey(cfg.get("seed", 0)))

    collator = build_collator(cfg, model, tokenizer, chat_template,
                              add_generation_prompt=True)
    rl = cfg.get("rlhf", {})
    # algorithm switch (reference verl role map: ActorRollout-only = GRPO,
    # ActorRollout + Critic = PPO with GAE, verl/__init__.py:29-50; DAPO
    # recipe = clip-higher + dynamic sampling + token-level aggregation,
    # verl/__init__.py:87-98)
    algorithm = rl.get("algorithm", "grpo").lower()
    if algorithm not in ("grpo", "ppo", "dapo"):
        raise click.ClickException(f"unknown rlhf.algorithm: {algorithm}")
    from multimeditron_tpu.rlhf.dapo import DAPOConfig, DAPOTrainer

    cfg_cls, trainer_cls = {
        "ppo": (PPOConfig, PPOTrainer),
        "dapo": (DAPOConfig, DAPOTrainer),
        "grpo": (GRPOConfig, GRPOTrainer),
    }[algorithm]
    extra = {}
    if algorithm == "ppo":
        extra = dict(
            gamma=rl.get("gamma", 1.0),
            gae_lambda=rl.get("gae_lambda", 0.95),
            value_clip=rl.get("value_clip", 0.2),
            critic_learning_rate=rl.get("critic_learning_rate", 1e-5),
            whiten_advantages=rl.get("whiten_advantages", True),
        )
    elif algorithm == "dapo":
        extra = dict(
            clip_eps_low=rl.get("clip_eps_low", 0.2),
            clip_eps_high=rl.get("clip_eps_high", 0.28),
            dynamic_sampling=rl.get("dynamic_sampling", True),
            max_resample_rounds=rl.get("max_resample_rounds", 3),
            loss_agg=rl.get("loss_agg", "token-mean"),
        )
    if algorithm == "dapo":
        rl.setdefault("kl_coef", 0.0)  # DAPO default: no KL penalty
        rl.setdefault("reward_manager", "dapo")
    grpo_cfg = cfg_cls(
        dp=rl.get("dp"),
        fsdp=rl.get("fsdp"),
        tp=rl.get("tp", 1),
        **extra,
        group_size=rl.get("group_size", 4),
        prompts_per_step=rl.get("prompts_per_step", 4),
        max_new_tokens=rl.get("max_new_tokens", 128),
        temperature=rl.get("temperature", 1.0),
        clip_eps=rl.get("clip_eps", 0.2),
        kl_coef=rl.get("kl_coef", 0.02),
        ppo_epochs=rl.get("ppo_epochs", 1),
        learning_rate=rl.get("learning_rate", 1e-6),
        training_mode=TrainingMode(cfg.get("training_mode", "LM_ONLY")),
        reward_manager=rl.get("reward_manager", "naive"),
        seq_bucket=rl.get("seq_bucket", 512),
        max_slots=rl.get("max_slots", 8),
        seed=cfg.get("seed", 0),
    )
    trainer = trainer_cls(model, params, collator, grpo_cfg)

    if dryrun:
        click.echo(
            f"dryrun OK: algorithm={algorithm}, "
            f"model={model.config.llm.num_layers}L "
            f"x{model.config.llm.hidden_size}, engine slots="
            f"{grpo_cfg.max_slots}, reward_manager={grpo_cfg.reward_manager}"
        )
        return

    prompt_path = rl["prompt_dataset"]
    prompts = []
    for row in JSONLGenerator(prompt_path):
        prompts.append(
            {
                "sample": {
                    "conversations": row["conversations"],
                    "modalities": row.get("modalities", []),
                },
                "data_source": row.get("data_source", "exact_match"),
                "ground_truth": row.get("ground_truth", ""),
                "extra_info": row.get("extra_info"),
            }
        )
    history = trainer.fit(prompts, num_steps=steps or rl.get("num_steps", 100))
    click.echo(f"final metrics: {history[-1] if history else {}}")
