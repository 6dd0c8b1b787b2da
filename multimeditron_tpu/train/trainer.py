"""SFT trainer: one jitted GSPMD train step instead of HF Trainer +
Accelerate + DeepSpeed (reference ``train/trainer.py``, SURVEY.md §3.1).

- staged freezing (``TRAINING_MAPPING``, reference ``trainer.py:16-26``,
  ``135-144``) = ``optax.masked`` AdamW + stop_gradient on frozen subtrees;
- ZeRO-3 = params/grads/opt-state sharded over the fsdp mesh axis
  (``parallel/sharding.py``); bf16 params, f32 optimizer moments;
- gradient accumulation = ``lax.scan`` over microbatches inside the step;
- cosine-with-min-lr schedule, global-norm clipping, warmup — mapping the
  reference's ``config_alignment.yaml:40-59`` training_args;
- metrics: loss / grad-norm / lr / tokens-sec / MFU, JSONL + optional
  wandb (reference logs to wandb, ``cli/train.py:159-186``);
- profiler window via ``jax.profiler`` (reference's PyTorch-profiler and
  NVTX hooks, ``trainer.py:147-198`` / ``profiling.py``).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import logging
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

logger = logging.getLogger(__name__)

from multimeditron_tpu.models.multimodal import MultimodalModel, TrainingMode
from multimeditron_tpu.parallel.mesh import make_mesh
from multimeditron_tpu.parallel.sharding import (
    batch_sharding,
    init_opt_state,
    param_sharding_rules,
    shard_params,
)

Params = Dict[str, Any]


@dataclasses.dataclass
class TrainerConfig:
    learning_rate: float = 1e-4
    min_lr: float = 3e-5
    warmup_steps: int = 0
    total_steps: int = 1000
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.999
    max_grad_norm: float = 1.0
    grad_accum: int = 1
    # "bfloat16" halves first-moment memory (ZeRO-offload-free fit for 8B
    # on 16GB v5e chips); None keeps fp32 moments.
    adam_moment_dtype: Optional[str] = None
    training_mode: TrainingMode = TrainingMode.ALIGNMENT
    # mesh
    dp: Optional[int] = None
    fsdp: Optional[int] = None
    tp: int = 1
    # sequence parallel (Ulysses): also sets LlamaConfig.sequence_parallel
    sp: int = 1
    # Ring attention over the sp axis (requires sp > 1): k/v shards
    # ppermute around the sp ring instead of the Ulysses all-to-all, so
    # attention memory stays O(S/sp) per device — the long-context mode.
    # Sets LlamaConfig.ring_attention (models/llama.py). The per-device
    # sequence (padded batch length / sp) must be a multiple of the ring
    # block size (ops/ring_attention.py).
    ring_attention: bool = False
    # expert parallel: shards MoE vision-expert stacks (parallel/sharding.py)
    ep: int = 1
    # pipeline parallel: GPipe stages over the decoder layer stack
    # (parallel/pipeline.py); also sets LlamaConfig.pipeline_parallel
    pp: int = 1
    # microbatches per pipeline schedule (must divide the batch);
    # default = pp
    pp_microbatches: Optional[int] = None
    # compute
    remat: bool = True
    attn_impl: Optional[str] = None
    # Route FROZEN modality towers through the fused W8A8 Pallas path
    # during training (a frozen tower is pure forward — no grads flow
    # through it — so the serving kernels are legal; cosine >= 0.999 vs
    # bf16). Calibrated lazily from the first batch. Invalid with
    # training_mode=FULL (the embedder trains there).
    quantize_frozen_towers: bool = False
    # logging / ckpt
    log_every: int = 1
    save_every: Optional[int] = None
    output_dir: str = "checkpoints"
    run_name: str = "multimeditron-tpu"
    wandb: bool = False
    # Reattach to an existing wandb run on resume (reference
    # cli/train.py:163-186: wandb_run_id + resume="allow").
    wandb_run_id: Optional[str] = None
    # profiling window (reference profiler parity: env-gated)
    profile_start_step: int = 10
    profile_num_steps: int = 5
    seed: int = 0


class MetricsLogger:
    """stdout + JSONL (+ optional wandb) metrics sink."""

    def __init__(self, cfg: TrainerConfig):
        self.cfg = cfg
        # Multi-host: only process 0 writes (every host computes identical
        # global metrics under GSPMD; N copies of the JSONL/wandb stream
        # would race on shared filesystems).
        self._primary = jax.process_index() == 0
        self._file = None
        self._wandb = None
        if not self._primary:
            return
        os.makedirs(cfg.output_dir, exist_ok=True)
        self._file = open(
            os.path.join(cfg.output_dir, "metrics.jsonl"), "a", buffering=1
        )
        if cfg.wandb:
            try:
                import wandb

                self._wandb = wandb.init(**self.wandb_init_kwargs(cfg))
            except Exception as e:
                self._wandb = None
                logger.warning(
                    "wandb was requested but init failed (%s: %s); "
                    "continuing with stdout/JSONL logging only.",
                    type(e).__name__, e,
                )

    @staticmethod
    def wandb_init_kwargs(cfg: "TrainerConfig") -> Dict[str, Any]:
        """Resume-aware wandb.init kwargs: a configured run id reattaches
        to the existing run instead of starting a fresh one."""
        kwargs: Dict[str, Any] = dict(
            project="MultiMeditron",
            name=cfg.run_name,
            config=dataclasses.asdict(cfg),
        )
        if cfg.wandb_run_id:
            kwargs.update(id=str(cfg.wandb_run_id), resume="allow")
        return kwargs

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        if not self._primary:
            return
        record = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        self._file.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if step % self.cfg.log_every == 0:
            printable = " ".join(f"{k}={v:.4g}" for k, v in record.items() if k != "step")
            print(f"[step {step}] {printable}", flush=True)

    def close(self):
        if self._file is not None:
            self._file.close()


class MultimodalTrainer:
    def __init__(
        self,
        model: MultimodalModel,
        params: Params,
        config: TrainerConfig,
        mesh=None,
    ):
        self.model = model
        self.cfg = config
        self.mesh = mesh or make_mesh(dp=config.dp, fsdp=config.fsdp,
                                      tp=config.tp, sp=config.sp,
                                      ep=config.ep, pp=config.pp)
        import dataclasses as _dc

        if config.ring_attention and config.sp <= 1:
            raise ValueError("ring_attention requires sp > 1 (the ring "
                             "runs over the sp mesh axis)")
        if config.sp > 1 and not model.config.llm.sequence_parallel:
            # LlamaConfig is frozen; swap in an sp-enabled copy so the
            # forward emits the Ulysses sharding constraints
            model.config.llm = _dc.replace(
                model.config.llm, sequence_parallel=True)
        if config.ring_attention and not model.config.llm.ring_attention:
            model.config.llm = _dc.replace(
                model.config.llm, ring_attention=True)
        pp = max(config.pp, self.mesh.shape.get("pp", 1))
        if pp > 1 and model.config.llm.pipeline_parallel != pp:
            model.config.llm = _dc.replace(
                model.config.llm, pipeline_parallel=pp,
                pipeline_microbatches=config.pp_microbatches)
        self._pp = model.config.llm.pipeline_parallel > 1
        self.param_shardings = param_sharding_rules(params, self.mesh,
                                                    pp=self._pp)
        self.params = shard_params(params, self.mesh, pp=self._pp)
        self.trainable_mask = model.trainable_mask(params, config.training_mode)

        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if config.warmup_steps > 0 else config.learning_rate,
            peak_value=config.learning_rate,
            warmup_steps=config.warmup_steps,
            decay_steps=max(config.total_steps, 1),
            end_value=config.min_lr,
        )
        self._schedule = schedule
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.masked(
                optax.adamw(
                    schedule,
                    b1=config.b1,
                    b2=config.b2,
                    weight_decay=config.weight_decay,
                    mu_dtype=config.adam_moment_dtype,
                ),
                self.trainable_mask,
            ),
        )
        if config.grad_accum > 1:
            # Each microbatch is an independently collated batch; the
            # optimizer applies every grad_accum calls (reference:
            # gradient_accumulation_steps, config_alignment.yaml:42).
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=config.grad_accum)
        # Single-device meshes skip the mesh context entirely: jit-under-mesh
        # commits result buffers to NamedShardings, which take a ~5x slower
        # execute path through the axon TPU relay (see parallel/sharding.py).
        self._use_mesh = self.mesh.devices.size > 1
        with self._mesh_ctx():
            self.opt_state = init_opt_state(
                self.tx, self.params, self.mesh, pp=self._pp
            )
        self.step = 0
        self._qmods = None  # quantize_frozen_towers: built from 1st batch
        self._train_step = self._build_train_step()

    def _mesh_ctx(self):
        import contextlib

        return self.mesh if self._use_mesh else contextlib.nullcontext()

    # ------------------------------------------------------------------
    def _build_train_step(self) -> Callable:
        model, cfg, mask = self.model, self.cfg, self.trainable_mask
        fwd_mesh = self.mesh if self._pp else None

        def loss_fn(params, batch, qmods):
            # Frozen subtrees contribute no gradient (and their backward is
            # DCE'd), mirroring requires_grad=False.
            p = jax.tree.map(
                lambda x, m: x if m else jax.lax.stop_gradient(x), params, mask
            )
            if qmods:
                # quantize_frozen_towers: splice the fused-int8 tower over
                # the (frozen, now-unused) bf16 embedder; the trainable
                # projector stays the live leaf from ``params``.
                mods = dict(p["modalities"])
                for mtype, qm in qmods.items():
                    mods[mtype] = {**mods[mtype], **qm}
                p = {**p, "modalities": mods}
            _, loss = model.forward(
                p, batch, attn_impl=cfg.attn_impl, remat=cfg.remat,
                mesh=fwd_mesh,
            )
            return loss

        def train_step(params, opt_state, batch, qmods):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, qmods)
            grad_norm = optax.global_norm(grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": loss, "grad_norm": grad_norm}

        return jax.jit(train_step, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def shard_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Host numpy batch -> device arrays sharded over the data axes.
        Arrays whose leading dim doesn't divide the data extent (e.g.
        modality item stacks) are replicated; GSPMD re-shards as needed.
        On a multi-host mesh the batch is this host's SHARD (from the
        process-sliced DataLoader) and the global arrays are assembled
        from per-process local data."""
        from jax.sharding import NamedSharding, PartitionSpec

        if jax.process_count() > 1:
            return self._shard_batch_multihost(batch)

        sharding = batch_sharding(self.mesh)
        n_data = (
            self.mesh.shape["dp"] * self.mesh.shape["fsdp"]
            if self._use_mesh else 1
        )
        replicated = (
            NamedSharding(self.mesh, PartitionSpec()) if self._use_mesh else None
        )

        def put(x):
            x = np.asarray(x)
            target = sharding if (x.ndim > 0 and x.shape[0] % n_data == 0) else replicated
            return jax.device_put(x, target)

        out = {}
        for k, v in batch.items():
            if k == "mm_inputs":
                out[k] = {
                    m: {kk: put(vv) for kk, vv in pack.items()}
                    for m, pack in v.items()
                }
            else:
                out[k] = put(v)
        return out

    def _shard_batch_multihost(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Assemble GLOBAL device arrays from this host's local batch via
        ``jax.make_array_from_process_local_data`` (round-1 gap: the
        input pipeline materialized the full global batch on one host;
        the reference gets per-rank loading for free from torchrun).

        Every host must contribute uniform shapes, so modality item
        stacks are padded to the next multiple of the per-host device
        count (padded entries scatter out of range and are dropped)."""
        from multimeditron_tpu.train.data import globalize_mm_pack

        pi, pc = jax.process_index(), jax.process_count()
        sharding = batch_sharding(self.mesh)
        local_dev = max(1, len(jax.local_devices()))

        def put_global(x):
            x = np.asarray(x)
            global_shape = (x.shape[0] * pc,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, x, global_shape)

        rows = np.asarray(batch["input_ids"]).shape[0]
        out = {}
        for k, v in batch.items():
            if k == "mm_inputs":
                packs = {}
                for m, pack in v.items():
                    n = np.asarray(pack["values"]).shape[0]
                    pad_to = -(-max(n, 1) // local_dev) * local_dev
                    packs[m] = {
                        kk: put_global(vv)
                        for kk, vv in globalize_mm_pack(
                            pack, rows, pi, pc, pad_items_to=pad_to
                        ).items()
                    }
                out[k] = packs
            else:
                out[k] = put_global(v)
        return out

    # ------------------------------------------------------------------
    def train_step(self, batch: Dict[str, Any]) -> Dict[str, float]:
        """One microbatch step. With grad_accum > 1 the optimizer applies
        once every grad_accum calls (optax.MultiSteps)."""
        self._maybe_quantize_frozen_towers(batch)
        if self._use_mesh:
            batch = self.shard_batch(batch)
        else:
            batch = jax.tree.map(jnp.asarray, batch)
        with self._mesh_ctx():
            self.params, self.opt_state, metrics = self._train_step(
                self.params, self.opt_state, batch, self._qmods
            )
        self.step += 1
        return metrics

    def _maybe_quantize_frozen_towers(self, batch: Dict[str, Any]) -> None:
        """Build the fused-int8 twin of each FROZEN modality tower, once,
        calibrated on the first batch's modality items (static activation
        scales; cfg.quantize_frozen_towers)."""
        if not self.cfg.quantize_frozen_towers or self._qmods is not None:
            return
        if TrainingMode(self.cfg.training_mode) == TrainingMode.FULL:
            raise ValueError(
                "quantize_frozen_towers needs frozen embedders "
                "(training_mode != FULL)"
            )
        qmods: Dict[str, Any] = {}
        for mtype, pack in (batch.get("mm_inputs") or {}).items():
            mod = self.model.modalities.get(mtype)
            if mod is None or not hasattr(mod, "quantize_params"):
                continue
            try:
                with self._mesh_ctx():
                    q = mod.quantize_params(
                        self.params["modalities"][mtype],
                        calibration_values=np.asarray(pack["values"])[:16],
                        fused=True,
                    )
            except TypeError:  # modality without a fused path
                continue
            # pack carries non-layer leaves (patch_proj, pos embed, ...)
            # through by reference; copy so no qmods buffer aliases the
            # DONATED params argument of the train step.
            qmods[mtype] = jax.tree.map(
                lambda x: x.copy() if hasattr(x, "copy") else x,
                {"embedder": q["embedder"], "act_scales": q["act_scales"]},
            )
        self._qmods = qmods or None

    def train(
        self,
        data_iter: Iterable[Dict[str, Any]],
        num_steps: Optional[int] = None,
        logger: Optional[MetricsLogger] = None,
        checkpointer=None,
    ) -> Dict[str, float]:
        from multimeditron_tpu.profiling import ThroughputMeter, profiler_enabled

        logger = logger or MetricsLogger(self.cfg)
        num_steps = num_steps or self.cfg.total_steps
        profile_on = profiler_enabled()
        n_total = sum(x.size for x in jax.tree.leaves(self.params))
        n_trainable = sum(
            x.size for x, m in zip(
                jax.tree.leaves(self.params), jax.tree.leaves(self.trainable_mask)
            ) if m
        )
        meter = ThroughputMeter(num_params=n_total,
                                num_params_trainable=n_trainable)
        last = {}
        t_prev = time.time()
        try:
            last = self._train_loop(
                data_iter, num_steps, logger, checkpointer, meter, profile_on, t_prev
            )
        except KeyboardInterrupt:
            # Crash/interrupt checkpoint (failure-recovery beyond the
            # reference, which relies on periodic saves only).
            if checkpointer is not None:
                print(f"Interrupted at step {self.step}; saving checkpoint")
                checkpointer.save(self.step, self.params, self.opt_state)
            raise
        return last

    def _train_loop(self, data_iter, num_steps, logger, checkpointer, meter,
                    profile_on, t_prev):
        last = {}
        for batch in data_iter:
            if self.step >= num_steps:
                break
            if profile_on and self.step == self.cfg.profile_start_step:
                jax.profiler.start_trace(
                    os.path.join(self.cfg.output_dir, "profile")
                )
            tokens = int(np.prod(np.asarray(batch["input_ids"]).shape))
            metrics = self.train_step(batch)
            metrics = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t_prev
            t_prev = time.time()
            metrics["lr"] = float(self._schedule(self.step))
            metrics.update(meter.update(tokens))
            metrics["step_time_s"] = dt
            logger.log(self.step, metrics)
            last = metrics
            if profile_on and self.step == (
                self.cfg.profile_start_step + self.cfg.profile_num_steps
            ):
                jax.profiler.stop_trace()
            if (
                checkpointer is not None
                and self.cfg.save_every
                and self.step % self.cfg.save_every == 0
            ):
                checkpointer.save(self.step, self.params, self.opt_state)
        return last
