"""Critic-based PPO: the reference's verl Actor/Critic role map
(``/root/reference/src/multimeditron/verl/__init__.py:29-50``,
``verl_trainer.yaml`` maps ActorRollout AND Critic onto FSDP workers),
rebuilt TPU-native on top of the colocated GRPO machinery.

Differences from GRPO (``rlhf/grpo.py``):
- a CRITIC — its own trunk, initialized from the policy (verl's critic
  is likewise a separate model on its own workers) plus a scalar value
  head — predicts per-token values;
- advantages come from GAE over response tokens (terminal reward at the
  last response token) instead of group-relative normalization;
- the critic trains on a clipped value loss against GAE returns, with
  its own optimizer, sharded over the same (fsdp, tp) mesh.

The actor update reuses the GRPO clipped-ratio objective (per-token
advantages) including the k3 KL penalty against the frozen initial
policy.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimeditron_tpu.models.llama import llama_forward
from multimeditron_tpu.parallel.sharding import (
    init_opt_state,
    param_sharding_rules,
    shard_params,
)
from multimeditron_tpu.rlhf.grpo import GRPOConfig, GRPOTrainer

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class PPOConfig(GRPOConfig):
    gamma: float = 1.0
    gae_lambda: float = 0.95
    value_clip: float = 0.2
    critic_learning_rate: float = 1e-5
    # Whiten GAE advantages over the batch's response tokens (verl's
    # default adv normalization).
    whiten_advantages: bool = True


def gae_advantages(
    values: np.ndarray,        # (B, S-1) V(s_t) — value BEFORE emitting token t
    rewards: np.ndarray,       # (B,) terminal reward per sequence
    resp_mask: np.ndarray,     # (B, S-1) 1 on response target tokens
    gamma: float,
    lam: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Masked GAE with the sequence reward at the last response token.

    Returns (advantages, returns), both (B, S-1), zero outside the mask.
    """
    B, T = values.shape
    resp = resp_mask.astype(bool)
    # per-row index of the last response token (rows w/o response: -1)
    has_resp = resp.any(axis=1)
    last = np.where(has_resp, T - 1 - resp[:, ::-1].argmax(axis=1), -1)
    r = np.zeros((B, T), np.float32)
    r[has_resp, last[has_resp]] = rewards[has_resp]

    adv = np.zeros((B, T), np.float32)
    gae = np.zeros((B,), np.float32)
    next_value = np.zeros((B,), np.float32)
    for t in range(T - 1, -1, -1):
        m = resp[:, t].astype(np.float32)
        delta = r[:, t] + gamma * next_value - values[:, t]
        gae = (delta + gamma * lam * gae) * m
        adv[:, t] = gae
        # masked positions keep the previous next_value so gaps (none in
        # practice: response tokens are contiguous) don't leak zeros
        next_value = np.where(resp[:, t], values[:, t], next_value)
    returns = adv + values * resp.astype(np.float32)
    return adv * resp.astype(np.float32), returns


class PPOTrainer(GRPOTrainer):
    """GRPO machinery + a sharded critic and GAE advantages."""

    def __init__(self, model, params, collator, cfg: PPOConfig, **kw):
        super().__init__(model, params, collator, cfg, **kw)
        rng = jax.random.PRNGKey(cfg.seed + 1)
        D = model.config.llm.hidden_size
        head = {
            "w": (jax.random.normal(rng, (D,), jnp.float32) * (D ** -0.5)),
            "b": jnp.zeros((), jnp.float32),
        }
        # Critic: own trunk initialized FROM the policy (already sharded;
        # jnp.copy under jit preserves NamedShardings) + value head.
        with self._mesh_ctx():
            trunk = jax.jit(lambda t: jax.tree.map(jnp.copy, t))(self.params)
        critic_params = dict(trunk)
        critic_params["value_head"] = shard_params(head, self.mesh)
        self.critic_params = critic_params
        self.critic_shardings = param_sharding_rules(critic_params, self.mesh)

        # The critic trains its trunk AND head (verl's critic is fully
        # trainable), still honoring the staged-freeze mode for the trunk.
        cmask = dict(model.trainable_mask(trunk, cfg.training_mode))
        cmask["value_head"] = jax.tree.map(lambda _: True, head)
        self.critic_tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.masked(optax.adamw(cfg.critic_learning_rate), cmask),
        )
        self._critic_mask = cmask
        with self._mesh_ctx():
            self.critic_opt_state = init_opt_state(
                self.critic_tx, critic_params, self.mesh
            )
        self._value_fn = jax.jit(self._token_values)
        self._critic_step = jax.jit(
            self._make_critic_step(), donate_argnums=(0, 1)
        )

    # ------------------------------------------------------------------
    def _token_values(self, critic_params, input_ids, attention_mask,
                      mm_inputs=None):
        """V(s_t) for t = 1..S-1: the value head reads the trunk's hidden
        state at position t-1 (the state BEFORE emitting token t), aligned
        with ``_token_logprobs``. (B, S-1)."""
        trunk = {k: v for k, v in critic_params.items() if k != "value_head"}
        embeds = self.model.embed(trunk, input_ids, mm_inputs)
        _, _, hidden = llama_forward(
            trunk["llm"], self.model.config.llm,
            inputs_embeds=embeds,
            attention_mask=attention_mask,
            return_hidden=True,
        )
        head = critic_params["value_head"]
        v = hidden.astype(jnp.float32) @ head["w"] + head["b"]  # (B, S)
        return v[:, :-1]

    def _make_critic_step(self):
        cfg, mask = self.cfg, self._critic_mask

        def loss_fn(critic_params, batch):
            p = jax.tree.map(
                lambda x, m: x if m else jax.lax.stop_gradient(x),
                critic_params, mask,
            )
            v = self._token_values(
                p, batch["input_ids"], batch["attention_mask"],
                batch.get("mm_inputs"),
            )
            resp = batch["response_mask"][:, 1:].astype(jnp.float32)
            returns, v_old = batch["returns"], batch["old_values"]
            v_clipped = v_old + jnp.clip(
                v - v_old, -cfg.value_clip, cfg.value_clip
            )
            vf = jnp.maximum((v - returns) ** 2, (v_clipped - returns) ** 2)
            denom = jnp.maximum(resp.sum(), 1.0)
            return 0.5 * (vf * resp).sum() / denom

        def critic_step(critic_params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(critic_params, batch)
            updates, opt_state = self.critic_tx.update(
                grads, opt_state, critic_params
            )
            critic_params = optax.apply_updates(critic_params, updates)
            return critic_params, opt_state, {"vf_loss": loss}

        return critic_step

    # ------------------------------------------------------------------
    def train_on_prompts(self, prompts: List[Dict[str, Any]]) -> Dict[str, float]:
        """One PPO iteration: rollout -> critic values -> GAE ->
        ppo_epochs x (actor update, critic update)."""
        cfg: PPOConfig = self.cfg
        batch = self._rollout(prompts)
        device_batch = self._put_batch(
            {k: v for k, v in batch.items() if k not in ("rewards", "advantages")}
        )
        mm_inputs = device_batch.get("mm_inputs")
        with self._mesh_ctx():
            old_logprobs = self._logprob_fn(
                self.params, device_batch["input_ids"],
                device_batch["attention_mask"], mm_inputs,
            )
            ref_logprobs = self._logprob_fn(
                self.ref_params, device_batch["input_ids"],
                device_batch["attention_mask"], mm_inputs,
            )
            old_values = self._value_fn(
                self.critic_params, device_batch["input_ids"],
                device_batch["attention_mask"], mm_inputs,
            )

        resp_mask_np = batch["response_mask"][:, 1:]
        adv_np, ret_np = gae_advantages(
            np.asarray(old_values), np.asarray(batch["rewards"], np.float32),
            resp_mask_np, cfg.gamma, cfg.gae_lambda,
        )
        if cfg.whiten_advantages:
            m = resp_mask_np.astype(bool)
            if m.any():
                mu, sd = adv_np[m].mean(), adv_np[m].std()
                adv_np = np.where(m, (adv_np - mu) / (sd + 1e-6), 0.0)

        extra = self._put_batch({
            "advantages": adv_np.astype(np.float32),
            "returns": ret_np.astype(np.float32),
        })
        train_batch = {
            "input_ids": device_batch["input_ids"],
            "attention_mask": device_batch["attention_mask"],
            "response_mask": device_batch["response_mask"],
            "advantages": extra["advantages"],
            "old_logprobs": old_logprobs,
            "ref_logprobs": ref_logprobs,
            "mm_inputs": mm_inputs,
        }
        critic_batch = {
            "input_ids": device_batch["input_ids"],
            "attention_mask": device_batch["attention_mask"],
            "response_mask": device_batch["response_mask"],
            "returns": extra["returns"],
            "old_values": old_values,
            "mm_inputs": mm_inputs,
        }
        metrics, cmetrics = {}, {}
        with self._mesh_ctx():
            for _ in range(cfg.ppo_epochs):
                self.params, self.opt_state, metrics = self._train_step(
                    self.params, self.opt_state, train_batch
                )
                (self.critic_params, self.critic_opt_state,
                 cmetrics) = self._critic_step(
                    self.critic_params, self.critic_opt_state, critic_batch
                )
        self.step += 1
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics.update({k: float(v) for k, v in cmetrics.items()})
        metrics["reward_mean"] = float(batch["rewards"].mean())
        metrics["reward_std"] = float(batch["rewards"].std())
        return metrics
