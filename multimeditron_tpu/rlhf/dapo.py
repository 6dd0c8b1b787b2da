"""DAPO: Decoupled clip + dynamic-sampling policy optimization, the
reference's fourth RLHF recipe (it exposes verl's DAPO algorithm and
reward manager, ``/root/reference/src/multimeditron/verl/__init__.py:87-98``),
rebuilt on the colocated GRPO machinery.

DAPO = GRPO with three changes (Yu et al., 2025):

1. **Clip-higher** — asymmetric ratio clipping ``[1-eps_low, 1+eps_high]``
   with ``eps_high > eps_low``: low-probability (exploration) tokens may
   grow faster before clipping, countering entropy collapse. Implemented
   in the shared GRPO loss via ``clip_eps_low``/``clip_eps_high``.
2. **Dynamic sampling** — prompt groups whose rewards have zero variance
   (all-correct or all-wrong) contribute exactly zero GRPO gradient but
   still dilute token-level batch statistics; they are dropped, and when a
   prompt pool is available the trainer keeps sampling replacement prompts
   until the batch holds ``prompts_per_step`` non-degenerate groups (or
   ``max_resample_rounds`` is exhausted).
3. **Token-level loss aggregation** — every response token weighs equally
   across the batch (``loss_agg="token-mean"``), so long responses are not
   down-weighted per-sequence. DAPO also drops the KL penalty
   (``kl_coef=0``): the policy is expected to drift from the frozen
   reference during long-horizon reasoning training.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, List, Optional

import numpy as np

from multimeditron_tpu.rlhf.grpo import GRPOConfig, GRPOTrainer

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class DAPOConfig(GRPOConfig):
    # DAPO paper defaults: eps_low 0.2, eps_high 0.28, no KL penalty,
    # token-level aggregation.
    clip_eps_low: Optional[float] = 0.2
    clip_eps_high: Optional[float] = 0.28
    kl_coef: float = 0.0
    loss_agg: str = "token-mean"
    # Dynamic sampling: drop zero-reward-variance groups; resample
    # replacements from the prompt pool up to this many extra rollout
    # rounds per step (0 = filter only).
    dynamic_sampling: bool = True
    max_resample_rounds: int = 3
    # std threshold under which a group counts as degenerate
    degenerate_std: float = 1e-6


class DAPOTrainer(GRPOTrainer):
    """GRPO machinery + clip-higher (via config), dynamic sampling and
    token-level aggregation. ``fit`` threads the prompt pool through so
    dropped groups can be replaced by fresh prompts the same step."""

    # ------------------------------------------------------------------
    @staticmethod
    def _group_keep_mask(rewards: np.ndarray, G: int, eps: float) -> np.ndarray:
        """(n_groups,) bool: groups with non-degenerate reward variance."""
        return rewards.reshape(-1, G).std(axis=1) > eps

    def _filter_groups(self, batch: Dict[str, Any], keep: np.ndarray) -> Dict[str, Any]:
        """Drop rollout rows belonging to dropped groups. ``keep`` is per
        GROUP; rows g*G..(g+1)*G-1 belong to group g. mm_inputs row
        indices are remapped to the filtered batch (padded scatter slots
        pointed at n remain >= n_new, keeping drop-mode semantics)."""
        G = self.cfg.group_size
        n = batch["input_ids"].shape[0]
        row_keep = np.repeat(keep, G)
        new_row = np.cumsum(row_keep) - 1  # old row -> new row (valid where kept)
        n_new = int(row_keep.sum())

        out = {}
        for k in ("input_ids", "attention_mask", "response_mask",
                  "advantages", "rewards"):
            out[k] = batch[k][row_keep]
        mm = batch.get("mm_inputs")
        if mm is not None:
            new_mm = {}
            for mtype, pack in mm.items():
                bi = np.asarray(pack["batch_idx"])
                in_range = (bi >= 0) & (bi < n)
                val_keep = np.where(in_range, row_keep[np.clip(bi, 0, n - 1)], False)
                remapped = np.where(
                    val_keep, new_row[np.clip(bi, 0, n - 1)], n_new
                ).astype(np.int32)
                # keep every value row (static shapes for jit) but point
                # dropped rows at the out-of-range slot n_new
                new_mm[mtype] = {
                    "values": np.asarray(pack["values"]),
                    "batch_idx": remapped,
                    "token_pos": np.asarray(pack["token_pos"], np.int32),
                }
            out["mm_inputs"] = new_mm
        else:
            out["mm_inputs"] = None
        return out

    @staticmethod
    def _concat_batches(a: Dict[str, Any], b: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        for k in ("input_ids", "attention_mask", "response_mask",
                  "advantages", "rewards"):
            out[k] = np.concatenate([a[k], b[k]], axis=0)
        n_a = a["input_ids"].shape[0]
        n_total = out["input_ids"].shape[0]
        mms = [(a.get("mm_inputs"), 0, n_a), (b.get("mm_inputs"), n_a, n_total)]
        merged: Dict[str, Dict[str, list]] = {}
        for mm, offset, n_local_total in mms:
            if mm is None:
                continue
            n_local = n_local_total - offset
            for mtype, pack in mm.items():
                dst = merged.setdefault(
                    mtype, {"values": [], "batch_idx": [], "token_pos": []}
                )
                bi = np.asarray(pack["batch_idx"])
                dst["values"].append(np.asarray(pack["values"]))
                dst["batch_idx"].append(
                    np.where(bi < n_local, bi + offset, n_total).astype(np.int32)
                )
                dst["token_pos"].append(np.asarray(pack["token_pos"], np.int32))
        out["mm_inputs"] = {
            mtype: {k: np.concatenate(v, axis=0) for k, v in d.items()}
            for mtype, d in merged.items()
        } or None
        return out

    # ------------------------------------------------------------------
    def train_on_prompts(
        self,
        prompts: List[Dict[str, Any]],
        prompt_pool: Optional[List[Dict[str, Any]]] = None,
    ) -> Dict[str, float]:
        cfg: DAPOConfig = self.cfg
        G = cfg.group_size
        rng = np.random.default_rng(cfg.seed + self.step)

        batch = self._rollout(prompts)
        n_sampled = len(prompts)
        n_dropped = 0
        if cfg.dynamic_sampling:
            keep = self._group_keep_mask(batch["rewards"], G, cfg.degenerate_std)
            n_dropped += int((~keep).sum())
            batch = self._filter_groups(batch, keep)
            rounds = 0
            target = cfg.prompts_per_step
            while (batch["input_ids"].shape[0] // G < target
                   and prompt_pool
                   and rounds < cfg.max_resample_rounds):
                rounds += 1
                need = target - batch["input_ids"].shape[0] // G
                idx = rng.choice(len(prompt_pool),
                                 size=min(need, len(prompt_pool)),
                                 replace=False)
                extra_prompts = [prompt_pool[int(i)] for i in idx]
                n_sampled += len(extra_prompts)
                extra = self._rollout(extra_prompts)
                ekeep = self._group_keep_mask(
                    extra["rewards"], G, cfg.degenerate_std)
                n_dropped += int((~ekeep).sum())
                extra = self._filter_groups(extra, ekeep)
                if extra["input_ids"].shape[0]:
                    batch = self._concat_batches(batch, extra)

        if batch["input_ids"].shape[0] == 0:
            # every group degenerate and no replacements: skip the update
            self.step += 1
            return {
                "loss": 0.0, "skipped": 1.0,
                "groups_kept": 0.0, "groups_dropped": float(n_dropped),
                "reward_mean": 0.0, "reward_std": 0.0,
            }

        metrics = self._update_on_batch(batch)
        metrics["skipped"] = 0.0
        metrics["groups_kept"] = float(batch["input_ids"].shape[0] // G)
        metrics["groups_dropped"] = float(n_dropped)
        metrics["prompts_sampled"] = float(n_sampled)
        return metrics

    def _update_on_batch(self, batch: Dict[str, Any]) -> Dict[str, float]:
        """The update half of GRPO's train_on_prompts, factored so dynamic
        sampling can assemble the batch first."""
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
            metrics = self.train_on_prompts(prompts, prompt_pool=prompt_dataset)
            logger.info("DAPO step %d: %s", step, metrics)
            history.append(metrics)
        return history
