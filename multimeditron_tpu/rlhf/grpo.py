"""GRPO trainer: TPU-native replacement for the reference's verl/Ray/sglang
RLHF stack (``verl/__init__.py``, ``cli/verl.py``).

Where the reference spawns Ray actors (FSDP workers + an sglang rollout
engine) and syncs weights between them, this trainer COLOCATES policy and
rollout on the same mesh: rollouts go through the continuous-batching
``ServingEngine`` holding a reference to the live policy params, so weight
"sync" after each update is a pointer swap (SURVEY.md §7.3 hard part #6).

Algorithm (GRPO):
- sample G completions per prompt;
- group-normalized advantages A = (r - mean_g) / (std_g + eps);
- PPO-style clipped ratio objective over response tokens, with a k3 KL
  penalty against the frozen initial policy;
- masked AdamW update honoring the staged-freeze mode.

At-scale parity with the reference's FSDP RLHF workers
(``verl/__init__.py:29-50``): policy, frozen reference policy, optimizer
moments and the update itself shard over an (fsdp, tp) mesh
(``GRPOConfig.dp/fsdp/tp``); the colocated rollout engine runs on the same
sharded params, so weight sync remains a pointer swap even when no chip
holds a full copy of the policy.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimeditron_tpu.models.llama import llama_forward
from multimeditron_tpu.models.multimodal import MultimodalModel, TrainingMode
from multimeditron_tpu.parallel.mesh import make_mesh
from multimeditron_tpu.parallel.sharding import (
    batch_sharding,
    init_opt_state,
    param_sharding_rules,
    shard_params,
)
from multimeditron_tpu.rlhf.rewards import AutoRewardManager, compute_score
from multimeditron_tpu.serve.engine import EngineConfig, ServingEngine

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class GRPOConfig:
    group_size: int = 4              # rollouts per prompt
    prompts_per_step: int = 4
    max_new_tokens: int = 64
    temperature: float = 1.0
    clip_eps: float = 0.2
    # Asymmetric ("clip-higher", DAPO) ratio clipping: when set, these
    # override clip_eps for the lower/upper bound respectively. A larger
    # upper bound lets low-probability tokens grow faster, countering
    # entropy collapse (reference exposes verl's DAPO recipe,
    # /root/reference/src/multimeditron/verl/__init__.py:87-98).
    clip_eps_low: Optional[float] = None
    clip_eps_high: Optional[float] = None
    # Loss aggregation over response tokens: "token-mean" (every token
    # weighs equally across the batch — DAPO's token-level loss; also the
    # historical default here) or "seq-mean-token-mean" (per-sequence mean
    # first, then mean over sequences — verl's GRPO default).
    loss_agg: str = "token-mean"
    kl_coef: float = 0.02
    ppo_epochs: int = 1
    learning_rate: float = 1e-6
    max_grad_norm: float = 1.0
    # END2END (llm + projectors) is the safe default: multimodal RLHF
    # trains the projector path too; for text-only policies it equals
    # LM_ONLY (there are no projectors to train).
    training_mode: TrainingMode = TrainingMode.END2END
    reward_manager: str = "naive"
    seq_bucket: int = 512
    max_slots: int = 8
    seed: int = 0
    # Mesh axes (reference parity: verl trains RLHF policies on FSDP
    # workers, /root/reference/src/multimeditron/verl/__init__.py:29-50).
    # Params / optimizer state / ref policy shard over (fsdp, tp); the
    # colocated rollout engine runs on the SAME sharded params — weight
    # sync stays a pointer swap. None/1 = single device (no mesh).
    dp: Optional[int] = None
    fsdp: Optional[int] = None
    tp: int = 1
    # N-gram speculative decoding for the rollout engine (round 5):
    # position-keyed sampling keeps every rollout token an exact sample
    # from the policy's conditional, so GRPO's logprob/advantage math is
    # untouched — rollouts just finish faster on repetitive generations.
    speculative_k: int = 0


class GRPOTrainer:
    def __init__(
        self,
        model: MultimodalModel,
        params: Dict[str, Any],
        collator,
        cfg: GRPOConfig,
        score_fn: Callable = compute_score,
        mesh=None,
    ):
        self.model = model
        self.collator = collator
        self.cfg = cfg
        self.reward_manager = AutoRewardManager.create(cfg.reward_manager, score_fn)

        # FSDP/TP sharding of policy + ref + optimizer state (the 8B RLHF
        # story): ZeRO-3-style rules from parallel/sharding.py, same as the
        # SFT trainer. Single-device meshes skip placement (see
        # shard_params on the axon-relay slow path).
        self.mesh = mesh or make_mesh(dp=cfg.dp, fsdp=cfg.fsdp, tp=cfg.tp)
        self._use_mesh = self.mesh.devices.size > 1
        self.param_shardings = param_sharding_rules(params, self.mesh)
        self.params = shard_params(params, self.mesh)
        # Frozen snapshot: materialized COPIES (train_step donates the live
        # params buffers; aliasing them would invalidate the reference).
        # jnp.copy under jit preserves each leaf's NamedSharding.
        with self._mesh_ctx():
            self.ref_params = jax.jit(
                lambda t: jax.tree.map(jnp.copy, t)
            )(self.params)

        # Colocated rollout on the SAME mesh as the policy (reference
        # parity: verl passes --tp to its sglang rollout engine,
        # config/verl_trainer.yaml:62): KV pool/ring and scheduling state
        # are committed to the trainer's (dp, fsdp, tp) mesh, so compiled
        # prefill/decode calls see params and cache already placed — zero
        # GSPMD resharding at the rollout boundary.
        self.engine = ServingEngine(
            model, self.params,
            EngineConfig(
                max_slots=cfg.max_slots,
                max_seq_len=cfg.seq_bucket + cfg.max_new_tokens,
                max_new_tokens=cfg.max_new_tokens,
                prefill_buckets=(64, 128, 256, cfg.seq_bucket),
                temperature=cfg.temperature,
                seed=cfg.seed,
                speculative_k=cfg.speculative_k,
            ),
            mesh=self.mesh if self._use_mesh else None,
        )

        mask = model.trainable_mask(params, cfg.training_mode)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.masked(optax.adamw(cfg.learning_rate), mask),
        )
        with self._mesh_ctx():
            self.opt_state = init_opt_state(self.tx, self.params, self.mesh)
        self._mask = mask
        self._logprob_fn = jax.jit(self._token_logprobs)
        self._train_step = jax.jit(self._make_train_step(), donate_argnums=(0, 1))
        self.step = 0

    def _mesh_ctx(self):
        import contextlib

        return self.mesh if self._use_mesh else contextlib.nullcontext()

    def _put_batch(self, batch):
        """Device arrays with leading dims sharded over the (dp, fsdp) data
        axes (replicated when not divisible — GSPMD re-shards as needed)."""
        if not self._use_mesh:
            return jax.tree.map(
                lambda x: jnp.asarray(x) if x is not None else None, batch
            )
        from jax.sharding import NamedSharding, PartitionSpec

        data_sh = batch_sharding(self.mesh)
        repl = NamedSharding(self.mesh, PartitionSpec())
        n_data = self.mesh.shape["dp"] * self.mesh.shape["fsdp"]

        def put(x):
            if x is None:
                return None
            x = np.asarray(x)
            target = data_sh if (x.ndim > 0 and x.shape[0] % n_data == 0) else repl
            return jax.device_put(x, target)

        return jax.tree.map(put, batch)

    # ------------------------------------------------------------------
    def _token_logprobs(self, params, input_ids, attention_mask, mm_inputs=None):
        """Log p(token_t | <t) for every position t >= 1. (B, S-1)."""
        embeds = self.model.embed(params, input_ids, mm_inputs)
        logits, _ = llama_forward(
            params["llm"], self.model.config.llm,
            inputs_embeds=embeds,
            attention_mask=attention_mask,
        )
        logprobs = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        targets = input_ids[:, 1:]
        return jnp.take_along_axis(
            logprobs, targets[..., None].astype(jnp.int32), axis=-1
        )[..., 0]

    def _make_train_step(self):
        cfg, model, mask = self.cfg, self.model, self._mask

        def loss_fn(params, batch):
            p = jax.tree.map(
                lambda x, m: x if m else jax.lax.stop_gradient(x), params, mask
            )
            logprobs = self._token_logprobs(
                p, batch["input_ids"], batch["attention_mask"],
                batch.get("mm_inputs"),
            )
            resp_mask = batch["response_mask"][:, 1:].astype(jnp.float32)
            adv = batch["advantages"]
            # GRPO passes one group-relative advantage per sequence (B,);
            # PPO (rlhf/ppo.py) passes per-token GAE advantages (B, S-1).
            if adv.ndim == 1:
                adv = adv[:, None]
            ratio = jnp.exp(logprobs - batch["old_logprobs"])
            eps_lo = cfg.clip_eps_low if cfg.clip_eps_low is not None else cfg.clip_eps
            eps_hi = cfg.clip_eps_high if cfg.clip_eps_high is not None else cfg.clip_eps
            clipped = jnp.clip(ratio, 1.0 - eps_lo, 1.0 + eps_hi)
            pg = -jnp.minimum(ratio * adv, clipped * adv)
            # k3 KL estimator vs the frozen reference policy
            delta = batch["ref_logprobs"] - logprobs
            kl = jnp.exp(delta) - delta - 1.0
            per_token = pg + cfg.kl_coef * kl
            denom = jnp.maximum(resp_mask.sum(), 1.0)
            if cfg.loss_agg == "seq-mean-token-mean":
                seq_tok = jnp.maximum(resp_mask.sum(axis=1), 1.0)
                has_resp = (resp_mask.sum(axis=1) > 0).astype(jnp.float32)
                n_seq = jnp.maximum(has_resp.sum(), 1.0)
                loss = ((per_token * resp_mask).sum(axis=1) / seq_tok).sum() / n_seq
            else:  # "token-mean" (DAPO token-level aggregation)
                loss = (per_token * resp_mask).sum() / denom
            mean_kl = (kl * resp_mask).sum() / denom
            return loss, {"pg_loss": (pg * resp_mask).sum() / denom, "kl": mean_kl}

        def train_step(params, opt_state, batch):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **aux}
            return params, opt_state, metrics

        return train_step

    # ------------------------------------------------------------------
    def _rollout(self, prompts: List[Dict[str, Any]]) -> Dict[str, Any]:
        """Sample G completions per prompt; return padded training arrays."""
        cfg = self.cfg
        self.engine.params = self.params  # weight sync (pointer swap)

        batches, meta = [], []
        for prompt in prompts:
            collated = self.collator([prompt["sample"]])
            for _ in range(cfg.group_size):
                batches.append(collated)
                meta.append(prompt)
        # One prefill per PROMPT, not per rollout: the engine forks the
        # G-1 sibling slots off the primary's prompt KV pages (refcounted
        # prefix sharing — the sglang RadixAttention capability the
        # reference's rollout engine provides, verl_trainer.yaml:62).
        outputs = self.engine.generate(
            batches, max_new_tokens=cfg.max_new_tokens,
            temperature=cfg.temperature, group_size=cfg.group_size,
        )

        eos = self.model.config.eos_token_idx
        S = cfg.seq_bucket
        n = len(batches)
        input_ids = np.zeros((n, S), np.int32)
        attention_mask = np.zeros((n, S), np.int32)
        response_mask = np.zeros((n, S), np.int32)
        rollouts = []
        for i, (collated, tokens) in enumerate(zip(batches, outputs)):
            prompt_ids = np.asarray(collated["input_ids"][0])
            plen = int(np.asarray(collated["attention_mask"][0]).sum())
            resp = [t for t in tokens]
            # truncate at (and including) EOS
            if eos in resp:
                resp = resp[: resp.index(eos) + 1]
            seq = np.concatenate([prompt_ids[:plen], np.asarray(resp, np.int32)])
            seq = seq[:S]
            input_ids[i, : len(seq)] = seq
            attention_mask[i, : len(seq)] = 1
            response_mask[i, plen : len(seq)] = 1
            rollouts.append(
                {
                    "response": self._decode(resp, eos),
                    "response_len": len(resp),
                    "data_source": meta[i].get("data_source", "exact_match"),
                    "ground_truth": meta[i].get("ground_truth", ""),
                    "extra_info": meta[i].get("extra_info"),
                }
            )

        rewards = self.reward_manager(rollouts)
        G = cfg.group_size
        groups = rewards.reshape(-1, G)
        adv = (groups - groups.mean(axis=1, keepdims=True)) / (
            groups.std(axis=1, keepdims=True) + 1e-6
        )
        return {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "response_mask": response_mask,
            "advantages": adv.reshape(-1).astype(np.float32),
            "rewards": rewards,
            "mm_inputs": self._merge_mm_inputs(batches, n),
        }

    @staticmethod
    def _merge_mm_inputs(batches, n: int):
        """Merge the per-rollout single-sample ``mm_inputs`` packs into one
        n-row pack so the policy-update forwards see the SAME spliced image
        embeddings the rollout saw (round-1 computed old/new logprobs on
        raw attachment-token embeddings — the PPO ratio was taken against
        the wrong old-policy distribution for image prompts).

        Row remap: each collated batch has one sample (row 0 -> rollout
        row i); padded scatter slots (batch_idx >= 1) are remapped to n so
        the scatter's drop mode keeps ignoring them."""
        merged: Dict[str, Dict[str, list]] = {}
        for i, collated in enumerate(batches):
            mm = collated.get("mm_inputs") or {}
            b_orig = np.asarray(collated["input_ids"]).shape[0]
            for mtype, pack in mm.items():
                dst = merged.setdefault(
                    mtype, {"values": [], "batch_idx": [], "token_pos": []}
                )
                bi = np.asarray(pack["batch_idx"])
                dst["values"].append(np.asarray(pack["values"]))
                dst["batch_idx"].append(
                    np.where(bi < b_orig, i, n).astype(np.int32)
                )
                dst["token_pos"].append(np.asarray(pack["token_pos"], np.int32))
        if not merged:
            return None
        return {
            mtype: {
                "values": np.concatenate(d["values"], axis=0),
                "batch_idx": np.concatenate(d["batch_idx"]),
                "token_pos": np.concatenate(d["token_pos"]),
            }
            for mtype, d in merged.items()
        }

    def _decode(self, tokens, eos) -> str:
        tok = getattr(self.collator, "tokenizer", None)
        ids = [t for t in tokens if t != eos]
        if tok is None:
            return " ".join(map(str, ids))
        try:
            return tok.decode(ids)
        except Exception:
            return " ".join(map(str, ids))

    # ------------------------------------------------------------------
    def train_on_prompts(self, prompts: List[Dict[str, Any]]) -> Dict[str, float]:
        """One GRPO iteration: rollout -> advantages -> ppo_epochs updates."""
        batch = self._rollout(prompts)
        device_batch = self._put_batch(
            {k: v for k, v in batch.items() if k != "rewards"}
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
        train_batch = {
            "input_ids": device_batch["input_ids"],
            "attention_mask": device_batch["attention_mask"],
            "response_mask": device_batch["response_mask"],
            "advantages": device_batch["advantages"],
            "old_logprobs": old_logprobs,
            "ref_logprobs": ref_logprobs,
            "mm_inputs": mm_inputs,
        }
        metrics = {}
        with self._mesh_ctx():
            for _ in range(self.cfg.ppo_epochs):
                self.params, self.opt_state, metrics = self._train_step(
                    self.params, self.opt_state, train_batch
                )
        self.step += 1
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["reward_mean"] = float(batch["rewards"].mean())
        metrics["reward_std"] = float(batch["rewards"].std())
        return metrics

    def fit(self, prompt_dataset: List[Dict[str, Any]], num_steps: int) -> List[Dict[str, float]]:
        rng = np.random.default_rng(self.cfg.seed)
        history = []
        for step in range(num_steps):
            idx = rng.choice(
                len(prompt_dataset),
                size=min(self.cfg.prompts_per_step, len(prompt_dataset)),
                replace=False,
            )
            prompts = [prompt_dataset[int(i)] for i in idx]
            metrics = self.train_on_prompts(prompts)
            logger.info("GRPO step %d: %s", step, metrics)
            history.append(metrics)
        return history
