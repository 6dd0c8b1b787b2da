"""Continuous-batching serving engine.

TPU-native replacement for the reference's sglang rollout/serving
dependency (SURVEY.md §2.3: vendored CUDA engine) and its naive eager
decode loop (``model/model.py:528-640``):

- a fixed pool of KV-cache SLOTS (static shapes, one compiled decode step
  for the whole pool);
- per-request PREFILL into a free slot (bucketed prompt lengths, so a
  handful of compilations serve all requests), vision encode included in
  the prefill graph;
- the host scheduler admits queued requests into free slots between
  decode steps — requests join and leave the running batch without ever
  recompiling or stalling other requests (continuous batching);
- per-slot temperature/top-k sampling in-graph; EOS/max-token finish.

The engine exposes both an async submit/step API (serving) and a
synchronous ``generate`` convenience (batch inference, RLHF rollouts).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimeditron_tpu.models.llama import (
    init_kv_cache,
    init_paged_kv_cache,
    llama_forward,
    lm_head_logits,
)
from multimeditron_tpu.models.multimodal import MultimodalModel


@dataclasses.dataclass
class EngineConfig:
    max_slots: int = 8
    max_seq_len: int = 2048
    max_new_tokens: int = 512
    prefill_buckets: Tuple[int, ...] = (128, 256, 512, 1024)
    temperature: float = 0.7
    top_k: int = 0  # 0 = disabled
    # Nucleus sampling default. 1.0 disables it AND compiles the samplers
    # without the sort/cumsum filter (the common fast path); any value
    # < 1.0 compiles the filter in, and requests may then override
    # per-request via ``submit(top_p=...)`` (a per-slot device array, so
    # no recompile per value — backs the UI slider).
    top_p: float = 1.0
    do_sample: bool = True
    seed: int = 0
    attn_impl: Optional[str] = None
    # Decode steps per compiled call (one host round-trip per chunk).
    # Raise on high-dispatch-latency links; admission happens between
    # chunks, so it also bounds added queueing latency.
    decode_chunk: int = 8
    # KV cache layout. "paged": global page pool + per-slot page tables
    # (sglang parity, SURVEY §2.3) — memory scales with TOKENS IN FLIGHT
    # (prompt + budget per request) instead of slots*max_seq_len, decode
    # attention reads only the pages a slot uses (Pallas kernel on TPU),
    # and requests queue when the pool is exhausted instead of OOMing.
    # "slab": contiguous per-slot buffers of max_seq_len.
    kv_mode: str = "paged"
    page_size: int = 128
    # Weight-only int8 LLM (W8A16): projections + lm_head stored int8
    # with per-channel scales, dequantized inside a streaming Pallas
    # matmul on the decode path (decode is weight-read bound — halving
    # weight bytes ≈ halves the per-step floor). Near-lossless; the
    # image tower has its own opt-in (modality ``quantize_params``).
    quantize_llm: bool = False
    # Pool pages (incl. the reserved trash page 0). Default sizes the pool
    # to the slab capacity; set lower to cap KV memory.
    num_pages: Optional[int] = None
    # N-gram SPECULATIVE decoding (paged AND slab kv modes). Greedy
    # (do_sample=False): outputs are EXACTLY the plain greedy decode.
    # Sampling (do_sample=True): verify positions draw with
    # POSITION-KEYED PRNG (key = fold(seed, slot, absolute position)),
    # so every committed token is an exact sample from its true
    # conditional and the generation is deterministic in (prompt, seed),
    # independent of k. Acceptance = sampled token equals the draft.
    # k > 0 replaces the token-at-a-time decode with verify steps: each
    # step drafts k continuation tokens IN-GRAPH from a device-resident
    # token history (most recent earlier occurrence of the current
    # bigram — "prompt lookup" decoding, no draft model), then one
    # forward over the (k+1)-token block commits the longest matching
    # prefix plus one bonus token. Decode is weight-read bound, so a
    # (k+1)-token verify costs barely more than a 1-token step; output
    # is EXACTLY the plain greedy decode (drafts only affect speed).
    # The whole draft->verify->accept loop chains inside one compiled
    # chunk — zero extra host round-trips.
    speculative_k: int = 0
    # W8A8 prefill (requires quantize_llm): prefill calls run activations
    # quantized per-row to int8 through int8 x int8 MXU dots — measured
    # 2.5-2.7x the W8A16 dequant (bf16 MXU) rate at 8B prefill shapes
    # (benchmarks/w8a8_probe.py). Decode keeps the W8A16 weight-read
    # path (tiny M is bandwidth-bound; the row gate in
    # LlamaConfig.w8a8_min_rows never fires there). Off by default:
    # activation quantization is a fidelity trade (per-token dynamic
    # scales; see tests/test_w8a8.py for the parity contract).
    w8a8_prefill: bool = False
    # Staggered prefill admission. None (default) batches every
    # same-signature queued request into ONE prefill call — maximal
    # throughput, but every request's first token then waits for the
    # whole fleet's prefill (p50 == p95 == full-batch prefill time; the
    # round-4 8B bench measured 1,919 ms for 16 requests). Setting a cap
    # admits at most ``cap`` requests per prefill call and at most one
    # group per engine step, with a 1-step decode chunk between groups:
    # earlier groups' first tokens arrive after ~their own group's
    # prefill, so TTFT p50 drops to ~half the fleet prefill (the
    # single-chip staggering bound) while later groups keep streaming.
    prefill_group_cap: Optional[int] = None
    # Tensor-parallel serving (sglang serves with --tp N; SURVEY §2.3).
    # tp > 1 builds a GSPMD mesh over the first ``tp`` devices: params
    # shard per parallel/sharding.py (heads/FFN over "tp", vocab-sharded
    # lm_head), the KV pool/ring/slab shard their kv-head axis, the
    # scheduling state replicates, and XLA inserts the collectives in
    # every compiled prefill/decode/fork call. Decode is weight-read
    # bound, so tp divides the per-chip weight bytes (the step-time
    # floor). The single-device Pallas paged kernel is bypassed: tp > 1
    # defaults ``attn_impl`` to the XLA path, which GSPMD partitions
    # over the sharded head axis.
    tp: int = 1


@dataclasses.dataclass
class Request:
    request_id: int
    batch: Dict[str, Any]            # single-sample collated batch (B=1)
    max_new_tokens: int
    temperature: float
    top_p: float = 1.0
    submit_time: float = 0.0
    first_token_time: Optional[float] = None
    finish_time: Optional[float] = None
    tokens: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    # Honest finish signaling (round-1 weak #6: requests were silently
    # force-finished on chunk headroom): "eos" | "budget" | "capacity".
    finish_reason: Optional[str] = None
    # Group forks (paged mode): sibling requests sharing this request's
    # prompt KV pages — prefilled ONCE, forked by refcount (sglang
    # RadixAttention-style prefix sharing; backs GRPO's G-per-prompt
    # rollouts). Populated by ``submit_group`` on the primary only.
    forks: List["Request"] = dataclasses.field(default_factory=list)

    @property
    def ttft(self) -> Optional[float]:
        if self.first_token_time is None:
            return None
        return self.first_token_time - self.submit_time


class ServingEngine:
    def __init__(self, model: MultimodalModel, params: Dict[str, Any],
                 cfg: EngineConfig, mesh=None):
        """``mesh``: an EXISTING multi-axis mesh to colocate on (the GRPO
        trainer's (dp, fsdp, tp) mesh — reference parity: verl passes
        ``--tp`` through to its sglang rollout engine,
        ``config/verl_trainer.yaml:62``). The engine then shards its KV
        pool/ring/slab kv-head axis over that mesh's "tp" axis and
        replicates scheduling state, so compiled prefill/decode calls see
        params AND cache already placed — zero GSPMD resharding at the
        rollout boundary. Mutually exclusive with ``cfg.tp > 1`` (which
        builds a private tp-only mesh)."""
        self.model = model
        llm = model.config.llm
        self.mesh = None
        self._tp = max(1, cfg.tp)
        if mesh is not None and mesh.devices.size > 1:
            if cfg.tp > 1:
                raise ValueError(
                    "pass EITHER an external mesh OR cfg.tp > 1, not both")
            tp = int(mesh.shape.get("tp", 1))
            if tp > 1 and (llm.num_heads % tp or llm.num_kv_heads % tp):
                raise ValueError(
                    f"mesh tp={tp} must divide num_heads={llm.num_heads} "
                    f"and num_kv_heads={llm.num_kv_heads}"
                )
            if cfg.attn_impl is None:
                cfg = dataclasses.replace(cfg, attn_impl="xla")
            self.mesh = mesh
            self._tp = tp
        elif cfg.tp > 1:
            if cfg.attn_impl is None:
                cfg = dataclasses.replace(cfg, attn_impl="xla")
            if llm.num_heads % cfg.tp or llm.num_kv_heads % cfg.tp:
                raise ValueError(
                    f"tp={cfg.tp} must divide num_heads={llm.num_heads} "
                    f"and num_kv_heads={llm.num_kv_heads}"
                )
            devices = jax.devices()
            if len(devices) < cfg.tp:
                raise ValueError(
                    f"tp={cfg.tp} needs {cfg.tp} devices, have {len(devices)}"
                )
            from multimeditron_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(dp=1, fsdp=1, tp=cfg.tp,
                                  devices=devices[: cfg.tp])
        self.cfg = cfg
        self.eos_id = model.config.eos_token_idx
        if cfg.quantize_llm:
            from multimeditron_tpu.models.llama_quant import (
                is_quantized,
                quantize_llama_params,
            )

            if not is_quantized(params["llm"]):
                # fused qkv/gateup weights stream better at decode (one
                # large read per layer) but are incompatible with the tp
                # sharding rules, which split q/k/v on their own axes
                params = {**params,
                          "llm": quantize_llama_params(
                              params["llm"], llm,
                              fuse=self.mesh is None)}
        if self.mesh is not None:
            from multimeditron_tpu.parallel.sharding import shard_params

            params = shard_params(params, self.mesh)
        self.params = params

        if cfg.kv_mode not in ("paged", "slab"):
            raise ValueError(f"kv_mode must be paged|slab, got {cfg.kv_mode!r}")
        self.paged = cfg.kv_mode == "paged"
        self.decode_chunk = max(1, cfg.decode_chunk)
        self.spec_k = max(0, cfg.speculative_k)
        if self.paged:
            P = cfg.page_size
            for b in cfg.prefill_buckets:
                if b >= P and b % P != 0:
                    raise ValueError(
                        f"prefill bucket {b} must divide into pages of {P}"
                    )
            self.page_size = P
            self.pages_max = -(-cfg.max_seq_len // P)
            n_pages = cfg.num_pages or (1 + cfg.max_slots * self.pages_max)
            # Speculative verify: the ring holds ONE (k+1)-token block
            # (folded into the pages after every verify step — see
            # _build_spec_decode_fn); plain decode keeps a chunk's rows.
            ring_size = (max(self.decode_chunk, self.spec_k + 2)
                         if self.spec_k else self.decode_chunk)
            if ring_size > P:
                raise ValueError(
                    f"ring ({ring_size} rows) must fit one page ({P})")
            cache = init_paged_kv_cache(
                llm, n_pages, P, self.pages_max, cfg.max_slots,
                ring_size=ring_size,
            )
            self.num_pages = n_pages
            # host-side allocator state; page 0 = trash (never allocated).
            # Pages are REFCOUNTED: prompt pages may be shared by several
            # slots (group forks — sglang RadixAttention-style prefix
            # sharing) and are returned to the free list only when the
            # last holder releases them.
            self.page_table = np.zeros((cfg.max_slots, self.pages_max), np.int32)
            self.free_pages: List[int] = list(range(n_pages - 1, 0, -1))
            self.page_ref = np.zeros((n_pages,), np.int32)
            self.slot_num_pages = np.zeros((cfg.max_slots,), np.int32)
            # tokens per slot covered by PAGES (vs the in-chunk ring)
            self.pages_length = np.zeros((cfg.max_slots,), np.int32)
        else:
            cache = init_kv_cache(llm, cfg.max_slots, cfg.max_seq_len)
        # Host MIRRORS of the scheduling state. The authoritative copy
        # lives ON DEVICE in ``self.state`` (below): the steady-state
        # decode loop is one device call per chunk with ZERO uploads and
        # one download (the token matrix) — every per-chunk
        # ``jnp.asarray(host_array)`` upload was a separate ~10 ms
        # round-trip on relay-attached chips (measured: the compiled
        # chunk runs 7.4 ms/step but the engine achieved only 18 ms/step
        # before this change). The mirrors are advanced host-side from
        # the downloaded tokens alone and exist for scheduling decisions
        # (admission, page allocation, finish bookkeeping).
        self.lengths = np.zeros((cfg.max_slots,), np.int32)
        self.slot_request: List[Optional[Request]] = [None] * cfg.max_slots
        self.slot_budget = np.zeros((cfg.max_slots,), np.int32)
        self.slot_generated = np.zeros((cfg.max_slots,), np.int32)
        self.slot_temperature = np.full((cfg.max_slots,), cfg.temperature, np.float32)
        self.last_tokens = np.zeros((cfg.max_slots,), np.int32)
        self.active = np.zeros((cfg.max_slots,), bool)

        # Device-resident scheduling state, donated through every
        # prefill/decode call. "length"/"page_table"/"pages_length" move
        # INTO this dict (they are per-chunk-varying cache metadata);
        # "remaining" implements the token budget in-graph so slots
        # deactivate at budget/EOS/capacity without host intervention.
        self.state = {
            **{k_: v_ for k_, v_ in cache.items()
               if k_ not in ("length", "page_table", "pages_length")},
            "length": jnp.zeros((cfg.max_slots,), jnp.int32),
            "tokens": jnp.zeros((cfg.max_slots,), jnp.int32),
            "active": jnp.zeros((cfg.max_slots,), bool),
            "remaining": jnp.zeros((cfg.max_slots,), jnp.int32),
            "temps": jnp.full((cfg.max_slots,), cfg.temperature, jnp.float32),
            "top_ps": jnp.full((cfg.max_slots,), cfg.top_p, jnp.float32),
            "seed": jnp.int32(cfg.seed),
        }
        if self.paged:
            self.state["page_table"] = jnp.zeros(
                (cfg.max_slots, self.pages_max), jnp.int32)
            self.state["pages_length"] = jnp.zeros((cfg.max_slots,), jnp.int32)
        if self.spec_k:
            # committed-token history (prompt + generated) backing the
            # in-graph n-gram draft; + k+2 margin so masked scatter
            # writes can go out of bounds (dropped) instead of wrapping
            self.state["history"] = jnp.zeros(
                (cfg.max_slots, cfg.max_seq_len + self.spec_k + 2),
                jnp.int32)
        if self.mesh is not None:
            self.state = self._shard_state(self.state)

        self.queue: List[Request] = []
        self._next_id = 0
        # Host-side seed counter: every jitted call derives its PRNG key
        # IN-GRAPH from an int32 seed argument. jax.random.split on the
        # host is an eager device dispatch (~30-100 ms through remote
        # relays) and was the dominant TTFT cost at high concurrency.
        self._seed_ctr = 0

        self._prefill_fns: Dict[int, Callable] = {}
        self._chunk_prefill_fns: Dict[tuple, Callable] = {}
        self._fork_fns: Dict[tuple, Callable] = {}
        # Power-of-two decode chunk variants: the final steps of a request
        # near its cache capacity run a SHORTER compiled chunk instead of
        # being force-finished with budgeted tokens unwritten.
        self._decode_fns: Dict[int, Callable] = {}
        if not self.spec_k:
            # speculative engines never run the plain chunk — skip its
            # (minutes-long at 8B) compile
            self._decode_fn = self._get_decode_fn(self.decode_chunk)

    def _shard_state(
        self, state: Dict[str, jax.Array],
        kv_axis: Optional[Dict[str, int]] = None,
    ) -> Dict[str, jax.Array]:
        """Commit the device-resident state to the tp mesh: KV arrays
        shard their kv-head axis over "tp" (paged pool (L,Hkv,pages,P,Dh)
        axis 1; ring/slab (L,B,Hkv,...) axis 2), scheduling scalars and
        tables replicate. Donation then keeps these shardings stable
        across every prefill/decode/fork call."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if kv_axis is None:
            kv_axis = {"k": 1 if self.paged else 2,
                       "v": 1 if self.paged else 2,
                       "ring_k": 2, "ring_v": 2}
        out = {}
        for name, arr in state.items():
            spec = [None] * getattr(arr, "ndim", 0)
            ax = kv_axis.get(name)
            if ax is not None and self._tp > 1 and arr.shape[ax] % self._tp == 0:
                spec[ax] = "tp"
            out[name] = jax.device_put(arr, NamedSharding(self.mesh, P(*spec)))
        return out

    # ------------------------------------------------------------------
    # Page allocator (paged kv_mode)
    # ------------------------------------------------------------------
    def _required_pages(self, req: Request) -> int:
        """Pages to reserve: prompt + full decode budget (so the decode
        loop never needs host-side allocation; writes past the
        reservation land on the trash page and are discarded)."""
        plen = int(np.asarray(req.batch["attention_mask"]).sum())
        total = min(plen + req.max_new_tokens, self.cfg.max_seq_len)
        return -(-total // self.page_size)

    def _alloc_pages(self, n: int) -> List[int]:
        ids = [self.free_pages.pop() for _ in range(n)]
        for p in ids:
            self.page_ref[p] = 1
        return ids

    def _reserve_pages(self, req: Request, slot: int) -> None:
        need = self._required_pages(req)
        ids = self._alloc_pages(need)
        self.page_table[slot, :] = 0
        self.page_table[slot, :need] = ids
        self.slot_num_pages[slot] = need

    def _reserve_fork_pages(self, req: Request, slot: int, parent_slot: int,
                            plen: int) -> int:
        """Fork ``slot`` off ``parent_slot``'s prompt KV: SHARE the parent's
        full prompt pages (refcount++), allocate own pages for the rest of
        [plen, plen+budget). Returns the parent's partial-page id to copy
        (0 = prompt is page-aligned, nothing to copy)."""
        P = self.page_size
        total = min(plen + req.max_new_tokens, self.cfg.max_seq_len)
        need = -(-total // P)
        n_full = min(plen // P, need)
        shared = [int(p) for p in self.page_table[parent_slot, :n_full]]
        for p in shared:
            self.page_ref[p] += 1
        own = self._alloc_pages(need - n_full)
        self.page_table[slot, :] = 0
        self.page_table[slot, :need] = shared + own
        self.slot_num_pages[slot] = need
        if plen % P != 0 and need > n_full:
            return int(self.page_table[parent_slot, n_full])
        return 0

    def _release_pages(self, slot: int) -> None:
        used = int(self.slot_num_pages[slot])
        for p in self.page_table[slot, :used]:
            p = int(p)
            self.page_ref[p] -= 1
            if self.page_ref[p] == 0:
                self.free_pages.append(p)
        self.page_table[slot, :] = 0
        self.slot_num_pages[slot] = 0

    def _bucket_page_ids(self, slots: List[int], bucket: int) -> np.ndarray:
        """Pool page ids receiving each request's bucket-shaped prefill KV.
        Bucket pages beyond a slot's reservation map to the trash page."""
        bp = max(1, bucket // self.page_size)
        ids = np.zeros((len(slots) * bp,), np.int32)
        for j, slot in enumerate(slots):
            used = int(self.slot_num_pages[slot])
            ids[j * bp : j * bp + min(bp, used)] = self.page_table[slot, :min(bp, used)]
        return ids

    # ------------------------------------------------------------------
    # Compiled functions
    # ------------------------------------------------------------------
    def _logits_filter(self):
        """Engine-wide top-k / top-p logit filter (same semantics as
        ``models.generation.sample_tokens``; reference UI exposes both,
        `ui/app.py` sliders)."""
        cfg = self.cfg

        def filt(scaled, top_ps):
            if cfg.top_k and cfg.top_k > 0:
                kth = jax.lax.top_k(scaled, cfg.top_k)[0][..., -1:]
                scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
            if cfg.top_p < 1.0:  # static gate; top_ps varies per slot
                V = scaled.shape[-1]
                sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
                probs = jax.nn.softmax(sorted_logits, axis=-1)
                cum = jnp.cumsum(probs, axis=-1)
                # keep tokens until cumulative prob exceeds top_p (inclusive)
                cutoff_idx = jnp.sum(cum < top_ps[:, None], axis=-1, keepdims=True)
                cutoff = jnp.take_along_axis(
                    sorted_logits, jnp.minimum(cutoff_idx, V - 1), axis=-1)
                scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
            return scaled

        return filt

    def _make_sampler(self):
        """(n, V) f32 logits + (n,) temps + seed -> (n,) int32 tokens,
        entirely in-graph (one device dispatch for a whole prefill group)."""
        cfg = self.cfg
        filt = self._logits_filter()

        def sample(logits, temps, top_ps, seed):
            logits = logits.astype(jnp.float32)
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if not cfg.do_sample:
                return greedy
            scaled = filt(logits / jnp.maximum(temps, 1e-6)[:, None], top_ps)
            key = jax.random.PRNGKey(seed)
            sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
            return jnp.where(temps > 1e-6, sampled, greedy)

        return sample

    def _prefill_llm(self):
        """LLM config for prefill-path graphs: enables the W8A8 row gate
        when configured (decode fns keep the pristine config)."""
        llm = self.model.config.llm
        if self.cfg.w8a8_prefill:
            if not self.cfg.quantize_llm:
                raise ValueError("w8a8_prefill requires quantize_llm")
            llm = dataclasses.replace(llm, w8a8_min_rows=256)
        return llm

    def _build_prefill_fn(self, bucket: int, n: int = 1) -> Callable:
        model, cfg = self.model, self.cfg
        llm = self._prefill_llm()
        paged = self.paged
        P = self.page_size if paged else 0
        eos = self.eos_id

        sampler = self._make_sampler()

        def prefill(params, state, input_ids, attention_mask, mm_inputs, dest,
                    slot_ids, page_rows, temps, top_ps, budgets, seed):
            # Encode + splice + causal prefill of n requests into a fresh
            # local cache, then copy each written region into its slot
            # (slab: contiguous copy at ``dest``=slot ids; paged: one
            # scatter of bucket-shaped pages at ``dest``=pool page ids).
            # The admitted slots' scheduling rows (tokens/active/budget/
            # temps/lengths/page-table) are set IN-GRAPH so the decode
            # loop needs no per-chunk uploads.
            embeds = model.embed(params, input_ids, mm_inputs)
            local = init_kv_cache(llm, n, bucket, dtype=state["k"].dtype)
            # return_hidden + last-position-only head: the full-logits
            # output is unused, so XLA DCEs the (n*bucket, vocab) lm_head
            # matmul — at 8B scale (8192 tokens x 128k vocab) that was
            # ~60 ms of throwaway work per 16-request prefill group.
            _, local, hidden = llama_forward(
                params["llm"], llm,
                inputs_embeds=embeds,
                attention_mask=attention_mask,
                kv_cache=local,
                prefill=True,
                attn_impl=cfg.attn_impl,
                return_hidden=True,
            )
            lengths = attention_mask.sum(axis=-1).astype(jnp.int32)
            k, v = state["k"], state["v"]
            if paged:
                L_, _, Hkv, _, Dh = local["k"].shape
                if bucket >= P:
                    bp = bucket // P

                    def to_pages(a):
                        a = a.reshape(L_, n, Hkv, bp, P, Dh)
                        return a.transpose(0, 2, 1, 3, 4, 5).reshape(
                            L_, Hkv, n * bp, P, Dh
                        )

                    k = k.at[:, :, dest].set(to_pages(local["k"]))
                    v = v.at[:, :, dest].set(to_pages(local["v"]))
                else:
                    # bucket smaller than a page: write the first ``bucket``
                    # rows of each request's first page
                    k = k.at[:, :, dest, :bucket, :].set(
                        local["k"].transpose(0, 2, 1, 3, 4)
                    )
                    v = v.at[:, :, dest, :bucket, :].set(
                        local["v"].transpose(0, 2, 1, 3, 4)
                    )
            else:
                # A bucket can be wider than the slot cache (short-capacity
                # engines); only the slot-width prefix is copied — the prompt
                # itself is guaranteed < max_seq_len at submit time.
                width = min(bucket, k.shape[3])
                for j in range(n):  # static unroll
                    k = jax.lax.dynamic_update_slice(
                        k, local["k"][:, j : j + 1, :, :width], (0, dest[j], 0, 0, 0)
                    )
                    v = jax.lax.dynamic_update_slice(
                        v, local["v"][:, j : j + 1, :, :width], (0, dest[j], 0, 0, 0)
                    )
            last_h = jnp.take_along_axis(
                hidden, (lengths - 1)[:, None, None], axis=1
            )
            last_logits = lm_head_logits(params["llm"], llm, last_h)[:, 0]
            first_tokens = sampler(last_logits, temps, top_ps, seed)
            # a slot starts active unless the first token already ends it
            active_new = jnp.logical_and(first_tokens != eos, budgets > 1)
            state = {
                **state,
                "k": k,
                "v": v,
                "length": state["length"].at[slot_ids].set(lengths),
                "tokens": state["tokens"].at[slot_ids].set(first_tokens),
                "active": state["active"].at[slot_ids].set(active_new),
                "remaining": state["remaining"].at[slot_ids].set(budgets - 1),
                "temps": state["temps"].at[slot_ids].set(temps),
                "top_ps": state["top_ps"].at[slot_ids].set(top_ps),
            }
            if "history" in state:
                # committed tokens = prompt[:length] + the first sampled
                # token at position ``length`` (speculative drafting
                # reads this buffer in-graph; right-pad rows beyond the
                # length are never matched)
                hist = state["history"]
                hist = hist.at[slot_ids, :bucket].set(input_ids)
                hist = hist.at[slot_ids, lengths].set(first_tokens)
                state["history"] = hist
            if paged:
                state["pages_length"] = (
                    state["pages_length"].at[slot_ids].set(lengths))
                state["page_table"] = (
                    state["page_table"].at[slot_ids].set(page_rows))
            # last_logits stay on device: group forks sample their first
            # tokens from them without re-running the prompt
            return state, lengths, first_tokens, last_logits

        return jax.jit(prefill, donate_argnums=(1,))

    def _get_decode_fn(self, chunk: int) -> Callable:
        if chunk not in self._decode_fns:
            self._decode_fns[chunk] = self._build_decode_fn(chunk)
        return self._decode_fns[chunk]

    def _build_decode_fn(self, chunk: Optional[int] = None) -> Callable:
        """Compiled CHUNKED decode: ``chunk`` steps per host round-trip
        (lax.scan), taking the whole device-resident scheduling state and
        returning it updated. EOS, token-budget ("remaining") and
        cache-capacity deactivation all happen in-graph, so steady-state
        decode is ONE device call per chunk with ZERO uploads and ONE
        download (the (chunk, slots) token matrix) — critical when each
        host<->device transfer carries fixed dispatch latency
        (remote-relay TPU setups measured ~10-30 ms per transfer)."""
        model, cfg = self.model, self.cfg
        llm = model.config.llm
        eos = self.eos_id
        chunk = chunk or self.decode_chunk
        max_seq_len = cfg.max_seq_len

        page_size = self.page_size if self.paged else None
        paged = self.paged
        cache_keys = (
            ("k", "v", "ring_k", "ring_v", "length", "page_table",
             "pages_length") if paged else ("k", "v", "length")
        )

        filt = self._logits_filter()

        def one_step(params, cache, tokens, active, temps, top_ps, key):
            embeds = jnp.take(params["llm"]["embed_tokens"], tokens, axis=0)[:, None, :]
            logits, new_cache = llama_forward(
                params["llm"], llm,
                inputs_embeds=embeds,
                kv_cache=cache,
                attn_impl=cfg.attn_impl,
                page_size=page_size,
            )
            logits = logits[:, 0].astype(jnp.float32)
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if cfg.do_sample:
                scaled = filt(logits / jnp.maximum(temps, 1e-6)[:, None], top_ps)
                sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
                next_tokens = jnp.where(temps > 1e-6, sampled, greedy)
            else:
                next_tokens = greedy
            next_tokens = jnp.where(active, next_tokens, eos)
            # only active slots advance their cache length
            new_cache = {
                **new_cache,
                "length": jnp.where(active, new_cache["length"], cache["length"]),
            }
            return new_cache, next_tokens

        def decode(params, state):
            key = jax.random.PRNGKey(state["seed"])
            cache = {k_: state[k_] for k_ in cache_keys}

            def body(carry, _):
                cache, tokens, active, remaining, key = carry
                key, sub = jax.random.split(key)

                def live(_):
                    new_cache, next_tokens = one_step(
                        params, cache, tokens, active, state["temps"],
                        state["top_ps"], sub
                    )
                    # the token just produced consumed one unit of
                    # budget; deactivate on EOS, exhausted budget, or a
                    # full cache
                    rem = remaining - active.astype(jnp.int32)
                    act = (
                        active
                        & (next_tokens != eos)
                        & (rem > 0)
                        & (new_cache["length"] < max_seq_len)
                    )
                    return new_cache, next_tokens, act, rem

                def dead(_):
                    return cache, tokens, active, remaining

                # skip the whole forward once every slot in the chunk is
                # done (mid-chunk tail steps used to run full dead steps)
                cache, next_tokens, active, remaining = jax.lax.cond(
                    jnp.any(active), live, dead, None)
                return (cache, next_tokens, active, remaining, key), next_tokens

            (cache, tokens, active, remaining, key), toks = jax.lax.scan(
                body,
                (cache, state["tokens"], state["active"], state["remaining"],
                 key),
                None, length=chunk,
            )
            if paged:
                # absorb the chunk's ring rows into the page pool (one
                # scatter per chunk instead of one per step); rows past a
                # slot's final length (mid-chunk deactivation, stale rows
                # of released slots) go to the trash page
                from multimeditron_tpu.ops.paged_attention import (
                    fold_ring_into_pages,
                )

                k, v = fold_ring_into_pages(
                    cache["k"], cache["v"],
                    cache["ring_k"], cache["ring_v"],
                    cache["page_table"], cache["pages_length"], chunk,
                    lengths=cache["length"],
                )
                cache = {**cache, "k": k, "v": v,
                         "pages_length": cache["length"]}
            state = {
                **state,
                **{k_: cache[k_] for k_ in cache_keys},
                "tokens": tokens,
                "active": active,
                "remaining": remaining,
                "seed": state["seed"] + 1,
            }
            return state, toks  # toks: (chunk, slots)

        return jax.jit(decode, donate_argnums=(1,))

    # ------------------------------------------------------------------
    # Greedy n-gram speculative decoding (slab mode)
    # ------------------------------------------------------------------
    def _get_spec_decode_fn(self, n_steps: int) -> Callable:
        if not hasattr(self, "_spec_decode_fns"):
            self._spec_decode_fns: Dict[int, Callable] = {}
        if n_steps not in self._spec_decode_fns:
            self._spec_decode_fns[n_steps] = self._build_spec_decode_fn(
                n_steps)
        return self._spec_decode_fns[n_steps]

    def _build_spec_decode_fn(self, n_steps: int) -> Callable:
        """Compiled speculative chunk: ``n_steps`` draft->verify->accept
        iterations chained in-graph (lax.scan). Each iteration drafts k
        tokens from the device-resident history (most recent earlier
        occurrence of the current bigram), runs ONE (k+1)-token forward
        through the slab cache (the decode path's S>1 branch: per-slot
        write offsets, causal-within-block), and commits the longest
        draft prefix the greedy argmax agrees with, plus one bonus
        token. Output is exactly the plain greedy decode; decode is
        weight-read bound, so each accepted draft token is nearly free.
        Returns (state, (g, emit)): (n_steps, slots, k+1) token matrix
        and emission mask for the host mirrors."""
        model, cfg = self.model, self.cfg
        llm = model.config.llm
        eos = self.eos_id
        k = self.spec_k
        max_seq_len = cfg.max_seq_len
        Lh = max_seq_len + k + 2
        paged = self.paged
        page_size = self.page_size if paged else None
        cache_keys = (
            ("k", "v", "ring_k", "ring_v", "length", "page_table",
             "pages_length") if paged else ("k", "v", "length")
        )
        filt = self._logits_filter()

        def draft_one(history, length, last_tok):
            # committed tokens live at history[0..length] (length+1
            # entries; history[length] == last_tok). Find the most
            # recent EARLIER occurrence of the current n-gram — a
            # TRIGRAM match outranks any bigram match (longer context
            # predicts the continuation better), most-recent wins
            # within a rank — and propose the k tokens that followed
            # it. Any draft is CORRECT under greedy verify — a miss
            # only costs speed.
            pos = jnp.arange(Lh)
            prev = history[jnp.maximum(length - 1, 0)]
            prev2 = history[jnp.maximum(length - 2, 0)]
            m2 = (jnp.roll(history, 1) == prev) & (history == last_tok)
            m3 = m2 & (jnp.roll(history, 2) == prev2) & (length >= 2)
            valid = (pos >= 1) & (pos <= length - 1) & (length >= 1)
            score = jnp.where(m3 & valid, pos + Lh,
                              jnp.where(m2 & valid, pos, -1))
            j_s = jnp.max(score)
            found = j_s >= 1
            j = jnp.where(j_s >= Lh, j_s - Lh, j_s)
            start = jnp.clip(j + 1, 0, Lh - k)
            cand = jax.lax.dynamic_slice(history, (start,), (k,))
            return jnp.where(found, cand, jnp.full((k,), last_tok))

        def one_step(params, cache, history, tokens, active, remaining,
                     temps, top_ps):
            B = tokens.shape[0]
            drafts = jax.vmap(draft_one)(history, cache["length"], tokens)
            block = jnp.concatenate([tokens[:, None], drafts], axis=1)
            embeds = jnp.take(params["llm"]["embed_tokens"], block, axis=0)
            logits, new_cache = llama_forward(
                params["llm"], llm,
                inputs_embeds=embeds,
                kv_cache=cache,
                prefill=True,  # causal within the block at per-slot offsets
                attn_impl=cfg.attn_impl,
                page_size=page_size,
            )
            logits = logits.astype(jnp.float32)          # (B, k+1, V)
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if cfg.do_sample:
                # POSITION-KEYED sampling: token at absolute position p
                # of slot b draws with key fold(seed, b*Lh + p). Every
                # committed emission is then an exact sample from its
                # true conditional (rejected positions re-sample next
                # step with the same key but the CORRECTED context), and
                # the whole generation is a deterministic function of
                # (prompt, seed) independent of k — asserted in tests.
                V = logits.shape[-1]
                pos = cache["length"][:, None] + jnp.arange(k + 1)[None, :]
                # k-INDEPENDENT key id stride: a first cut used Lh
                # (= max_seq_len + k + 2) and slots >= 1 sampled with
                # different keys per k, breaking the k-independence
                # contract (caught by test_spec_sampling_independent_of_k)
                ids = (jnp.arange(B)[:, None] * (1 << 20) + pos).reshape(-1)
                keys = jax.vmap(
                    lambda d: jax.random.fold_in(
                        jax.random.PRNGKey(cfg.seed), d))(ids)
                scaled = logits / jnp.maximum(
                    temps, 1e-6)[:, None, None]
                scaled = filt(
                    scaled.reshape(-1, V),
                    jnp.repeat(top_ps, k + 1))
                sampled = jax.vmap(
                    lambda key, row: jax.random.categorical(key, row)
                )(keys, scaled).reshape(B, k + 1).astype(jnp.int32)
                g = jnp.where(temps[:, None] > 1e-6, sampled, greedy)
            else:
                g = greedy
            match = (block[:, 1:] == g[:, :-1]).astype(jnp.int32)
            a = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # (B,)
            idx = jnp.arange(k + 1)[None, :]
            emit = idx <= a[:, None]
            # stop at the first EOS (inclusive), budget, cache capacity
            eos_hit = (g == eos) & emit
            after = jnp.cumsum(eos_hit.astype(jnp.int32), axis=1) - eos_hit
            emit = emit & (after == 0)
            emit = emit & (idx < remaining[:, None])
            emit = emit & (cache["length"][:, None] + idx <= max_seq_len - 1)
            emit = emit & active[:, None]
            n_emit = jnp.sum(emit.astype(jnp.int32), axis=1)

            last_idx = jnp.maximum(n_emit - 1, 0)
            last = jnp.take_along_axis(g, last_idx[:, None], axis=1)[:, 0]
            tokens = jnp.where(n_emit > 0, last, tokens)
            finished_eos = jnp.any(eos_hit & emit, axis=1)
            length = cache["length"] + n_emit
            remaining = remaining - n_emit
            active = (active & ~finished_eos & (remaining > 0)
                      & (length < max_seq_len))
            # history: committed tokens g_i land at length_old + 1 + i;
            # non-emitted positions scatter out of bounds (dropped)
            p = jnp.where(emit, cache["length"][:, None] + 1 + idx, Lh)
            history = history.at[jnp.arange(B)[:, None], p].set(g)
            cache = {**{k_: new_cache[k_] for k_ in cache_keys
                        if k_ in new_cache},
                     "length": length}
            if paged:
                cache["page_table"] = new_cache["page_table"]
                # fold EVERY verify step: accepted rows land in their
                # pages, rejected rows (past each slot's new length) go
                # to the trash page, and the next step's block writes at
                # ring row 0 again with one dynamic_update_slice (the
                # uniform-offset contract of the _layer verify branch).
                # The Pallas page-RMW fold costs ~0.4 ms at 8B dims.
                from multimeditron_tpu.ops.paged_attention import (
                    fold_ring_into_pages,
                )

                kp, vp = fold_ring_into_pages(
                    cache["k"], cache["v"],
                    cache["ring_k"], cache["ring_v"],
                    cache["page_table"], new_cache["pages_length"],
                    cache["ring_k"].shape[3],
                    lengths=length,
                )
                cache["k"], cache["v"] = kp, vp
                cache["pages_length"] = length
            return cache, history, tokens, active, remaining, g, emit

        def decode(params, state):
            cache = {k_: state[k_] for k_ in cache_keys}

            def body(carry, _):
                cache, history, tokens, active, remaining = carry

                def live(_):
                    return one_step(params, cache, history, tokens,
                                    active, remaining, state["temps"],
                                    state["top_ps"])

                def dead(_):
                    B = tokens.shape[0]
                    return (cache, history, tokens, active, remaining,
                            jnp.zeros((B, k + 1), jnp.int32),
                            jnp.zeros((B, k + 1), bool))

                # skip the verify forward entirely once every slot is
                # done (tail steps of a chunk after the last finish)
                cache, history, tokens, active, remaining, g, emit = (
                    jax.lax.cond(jnp.any(active), live, dead, None))
                return (cache, history, tokens, active, remaining), (g, emit)

            (cache, history, tokens, active, remaining), (gs, emits) = (
                jax.lax.scan(
                    body,
                    (cache, state["history"], state["tokens"],
                     state["active"], state["remaining"]),
                    None, length=n_steps))
            # paged: already folded per verify step inside one_step
            state = {
                **state,
                **{k_: cache[k_] for k_ in cache_keys},
                "history": history, "tokens": tokens, "active": active,
                "remaining": remaining,
            }
            return state, (gs, emits)

        return jax.jit(decode, donate_argnums=(1,))

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------
    def submit(
        self,
        batch: Dict[str, Any],
        max_new_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
    ) -> Request:
        """Queue a single-sample collated batch (B=1, right-padded)."""
        assert batch["input_ids"].shape[0] == 1, "submit() takes B=1 batches"
        if top_p is not None and top_p < 1.0 and self.cfg.top_p >= 1.0:
            raise ValueError(
                "per-request top_p needs the engine built with "
                "EngineConfig(top_p < 1.0) so the nucleus filter is "
                "compiled into the samplers"
            )
        req = Request(
            request_id=self._next_id,
            batch=batch,
            max_new_tokens=max_new_tokens or self.cfg.max_new_tokens,
            temperature=self.cfg.temperature if temperature is None else temperature,
            top_p=self.cfg.top_p if top_p is None else top_p,
            submit_time=time.time(),
        )
        if self.paged and self._required_pages(req) > self.num_pages - 1:
            raise ValueError(
                f"request needs {self._required_pages(req)} KV pages but the "
                f"pool only has {self.num_pages - 1}; raise num_pages or "
                f"lower max_new_tokens"
            )
        self._next_id += 1
        self.queue.append(req)
        return req

    def submit_group(
        self,
        batch: Dict[str, Any],
        n: int,
        max_new_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
    ) -> List[Request]:
        """Queue ``n`` requests over ONE prompt, sharing its KV.

        Paged mode prefills the prompt once and forks n-1 siblings that
        share the prompt's full KV pages by refcount (each fork owns only
        its decode pages + a copy of the partial tail page) — sglang
        RadixAttention-style prefix sharing. The GRPO trainer uses this
        for its G-completions-per-prompt rollouts. Slab mode falls back
        to n independent submissions."""
        if n < 1:
            raise ValueError("submit_group needs n >= 1")
        if not self.paged or n == 1:
            return [
                self.submit(batch, max_new_tokens=max_new_tokens,
                            temperature=temperature, top_p=top_p)
                for _ in range(n)
            ]
        if n > self.cfg.max_slots:
            raise ValueError(
                f"group of {n} exceeds max_slots={self.cfg.max_slots}; "
                "a forked group is admitted atomically"
            )
        primary = self.submit(batch, max_new_tokens=max_new_tokens,
                              temperature=temperature, top_p=top_p)
        plen = int(np.asarray(batch["attention_mask"]).sum())
        p_need = self._required_pages(primary)
        own = max(p_need - min(plen // self.page_size, p_need), 0)
        if p_need + (n - 1) * own > self.num_pages - 1:
            self.queue.remove(primary)
            raise ValueError(
                f"group needs {p_need + (n - 1) * own} KV pages but the "
                f"pool only has {self.num_pages - 1}; raise num_pages or "
                "lower max_new_tokens/group size"
            )
        for _ in range(n - 1):
            fork = Request(
                request_id=self._next_id,
                batch=batch,
                max_new_tokens=primary.max_new_tokens,
                temperature=primary.temperature,
                top_p=primary.top_p,
                submit_time=primary.submit_time,
            )
            self._next_id += 1
            primary.forks.append(fork)
        return [primary] + primary.forks

    def _bucket_for(self, seq_len: int) -> Optional[int]:
        """Smallest bucket holding ``seq_len``; None -> chunked prefill."""
        for b in self.cfg.prefill_buckets:
            if seq_len <= b:
                return b
        if seq_len >= self.cfg.max_seq_len:
            raise ValueError(
                f"Prompt length {seq_len} exceeds max_seq_len "
                f"{self.cfg.max_seq_len} (no room to decode)"
            )
        return None

    @staticmethod
    def _pad_to(x, target, value=0):
        x = np.asarray(x)
        if x.shape[1] == target:
            return x
        pad = [(0, 0), (0, target - x.shape[1])] + [(0, 0)] * (x.ndim - 2)
        return np.pad(x, pad, constant_values=value)

    def _request_signature(self, req: Request) -> tuple:
        bucket = self._bucket_for(req.batch["input_ids"].shape[1])
        mm = req.batch.get("mm_inputs") or {}
        mm_sig = tuple(
            sorted(
                (mtype, tuple(np.asarray(p["values"]).shape),
                 tuple(np.asarray(p["batch_idx"]).shape))
                for mtype, p in mm.items()
            )
        )
        return (bucket, mm_sig)

    def _admit(self) -> None:
        """Move queued requests into free slots: requests with identical
        shape signatures (prompt bucket + modality shapes) prefill in ONE
        batched compiled call, collapsing N sequential prefills' dispatch
        latency into one (continuous batching on the prefill side too)."""
        free = [
            s for s in range(self.cfg.max_slots)
            if not self.active[s] and self.slot_request[s] is None
        ]
        while self.queue and free:
            # Prompts longer than the largest bucket prefill in bucket-sized
            # chunks into their slot (no grouping; rare long prompts).
            head = self.queue[0]
            if head.forks:
                # forked group: one prefill + KV-page sharing; admitted
                # atomically or waits at the head (FIFO)
                if not self._try_admit_group(head, free):
                    break
                continue
            if self.paged and self._required_pages(head) > len(self.free_pages):
                # pool exhausted: requests WAIT for pages (sglang-style
                # admission control) instead of evicting or OOMing. FIFO:
                # don't let later, smaller requests starve the head.
                break
            if self._bucket_for(head.batch["input_ids"].shape[1]) is None:
                self.queue.remove(head)
                self._prefill_chunked(head, free.pop(0))
                continue
            take = [
                r for r in self.queue[: len(free)]
                if not r.forks
                and self._bucket_for(r.batch["input_ids"].shape[1]) is not None
            ]
            if not take:
                continue
            sig = self._request_signature(take[0])
            group = [r for r in take if self._request_signature(r) == sig]
            if self.cfg.prefill_group_cap:
                # explicit cap: group sizes are bounded by the cap itself
                # (cap + smaller remainders), so no pow2 rounding needed —
                # and non-pow2 caps let the operator place the median
                # request inside the FIRST group (cap = n/2 + 1 gives
                # TTFT p50 ~= half the fleet-prefill wall)
                group = group[: self.cfg.prefill_group_cap]
            else:
                # Cap group size to a power of two so the set of compiled
                # batched-prefill variants stays logarithmic.
                cap = 1 << (len(group).bit_length() - 1)
                group = group[:cap]
            if self.paged:
                # shrink the group to what the free pool can host
                budget = len(self.free_pages)
                fits = 0
                for r in group:
                    need = self._required_pages(r)
                    if need > budget:
                        break
                    budget -= need
                    fits += 1
                if fits == 0:
                    break
                group = group[:fits]
            # FIFO within the admissible window; mixed signatures prefill
            # in consecutive groups.
            for r in group:
                self.queue.remove(r)
            slots = free[: len(group)]
            free = free[len(group):]
            self._prefill_group(group, slots, sig)
            if self.cfg.prefill_group_cap:
                # staggered admission: one group per engine step — the
                # step's decode chunk runs before the next group prefills
                break

    def _prefill_group(self, group: List[Request], slots: List[int], sig,
                       reserve: bool = True) -> None:
        bucket, _ = sig
        n = len(group)
        input_ids = np.concatenate(
            [self._pad_to(r.batch["input_ids"], bucket) for r in group]
        )
        mask = np.concatenate(
            [self._pad_to(r.batch["attention_mask"], bucket) for r in group]
        )
        mm = None
        if group[0].batch.get("mm_inputs"):
            mm = {}
            for mtype in group[0].batch["mm_inputs"]:
                packs = [r.batch["mm_inputs"][mtype] for r in group]
                n_items = np.asarray(packs[0]["values"]).shape[0]
                values = np.concatenate([np.asarray(p["values"]) for p in packs])
                batch_idx = np.concatenate(
                    [
                        # local batch row j stays j; padded slots (>= 1 in a
                        # B=1 request batch) map to n (dropped)
                        np.where(np.asarray(p["batch_idx"]) < 1, j, n).astype(np.int32)
                        for j, p in enumerate(packs)
                    ]
                )
                token_pos = np.concatenate(
                    [np.asarray(p["token_pos"]) for p in packs]
                ).astype(np.int32)
                mm[mtype] = {
                    "values": jnp.asarray(values),
                    "batch_idx": jnp.asarray(batch_idx),
                    "token_pos": jnp.asarray(token_pos),
                }

        key = (bucket, n, sig[1])
        if key not in self._prefill_fns:
            self._prefill_fns[key] = self._build_prefill_fn(bucket, n)
        temps = np.asarray([r.temperature for r in group], np.float32)
        top_ps = np.asarray([r.top_p for r in group], np.float32)
        budgets = np.asarray([r.max_new_tokens for r in group], np.int32)
        if self.paged:
            if reserve:
                for req, slot in zip(group, slots):
                    self._reserve_pages(req, slot)
            dest = self._bucket_page_ids(slots, bucket)
            page_rows = self.page_table[np.asarray(slots)].astype(np.int32)
        else:
            dest = np.asarray(slots, np.int32)
            page_rows = np.zeros((n, 1), np.int32)  # unused placeholder
        self.state, lengths, first_tokens, last_logits = self._prefill_fns[key](
            self.params,
            self.state,
            jnp.asarray(input_ids), jnp.asarray(mask), mm,
            jnp.asarray(dest),
            jnp.asarray(np.asarray(slots, np.int32)),
            jnp.asarray(page_rows),
            jnp.asarray(temps), jnp.asarray(top_ps), jnp.asarray(budgets),
            self._next_seed(),
        )
        # device-resident: consumed by _admit_forks for grouped requests
        self._last_prefill_logits = last_logits
        lengths = np.asarray(lengths)
        first_tokens = np.asarray(first_tokens)

        now = time.time()
        for j, (req, slot) in enumerate(zip(group, slots)):
            first = int(first_tokens[j])
            req.first_token_time = now
            req.tokens.append(int(first))
            self.slot_request[slot] = req
            self.lengths[slot] = int(lengths[j])
            if self.paged:
                self.pages_length[slot] = int(lengths[j])
            self.slot_budget[slot] = req.max_new_tokens
            self.slot_generated[slot] = 1
            self.slot_temperature[slot] = req.temperature
            self.last_tokens[slot] = int(first)
            if int(first) == self.eos_id:
                self._finish(slot, reason="eos")
            elif req.max_new_tokens <= 1:
                self._finish(slot, reason="budget")
            else:
                self.active[slot] = True

    def _build_chunk_prefill_slab_fn(self, bucket: int) -> Callable:
        """Paged-mode chunked prefill into a PERSISTENT contiguous slab.

        Round-2 version gathered the slot's whole page allotment into a
        slab and scattered every page back on EVERY chunk —
        O(max_seq_len) HBM traffic per chunk. The slab now lives across
        chunks (donated through each call), so chunks pay zero
        gather/scatter; the finished prompt's KV is folded into the page
        pool ONCE by ``_get_slab_scatter_fn`` after the last chunk."""
        model, cfg = self.model, self.cfg
        llm = self._prefill_llm()
        sampler = self._make_sampler()

        def chunk_prefill(params, slab, input_ids, attention_mask,
                          mm_inputs, start_len, temps, top_ps, seed):
            embeds = model.embed(params, input_ids, mm_inputs)
            slot_cache = {"k": slab["k"], "v": slab["v"],
                          "length": start_len[None]}
            _, slot_cache, hidden = llama_forward(
                params["llm"], llm,
                inputs_embeds=embeds,
                attention_mask=attention_mask,
                kv_cache=slot_cache,
                prefill=True,
                attn_impl=cfg.attn_impl,
                return_hidden=True,
            )
            chunk_len = attention_mask.sum(axis=-1).astype(jnp.int32)
            # last-position-only head (full logits DCE'd; see
            # _build_prefill_fn)
            last_h = jnp.take_along_axis(
                hidden, (chunk_len - 1)[:, None, None], axis=1)
            last = lm_head_logits(params["llm"], llm, last_h)[:, 0]
            slab = {"k": slot_cache["k"], "v": slot_cache["v"]}
            return slab, sampler(last, temps, top_ps, seed), last

        return jax.jit(chunk_prefill, donate_argnums=(1,))

    def _get_slab_scatter_fn(self) -> Callable:
        """One-time fold of the chunked-prefill slab into the page pool."""
        if getattr(self, "_slab_scatter_fn", None) is None:
            P, pm = self.page_size, self.pages_max

            def scatter(state, slab, dest):
                L_, _, Hkv, cap, Dh = slab["k"].shape
                back_k = slab["k"][:, 0].reshape(L_, Hkv, pm, P, Dh)
                back_v = slab["v"][:, 0].reshape(L_, Hkv, pm, P, Dh)
                k = state["k"].at[:, :, dest].set(back_k)
                v = state["v"].at[:, :, dest].set(back_v)
                return {**state, "k": k, "v": v}

            self._slab_scatter_fn = jax.jit(scatter, donate_argnums=(0,))
        return self._slab_scatter_fn

    def _get_chunk_slab(self):
        """Persistent (L, 1, Hkv, pages_max*P, Dh) scratch slab, reused by
        every chunked prefill (stale tail KV is never attended: chunk i
        only attends positions < start_len + chunk written by this
        prompt)."""
        if getattr(self, "_chunk_slab", None) is None:
            llm = self.model.config.llm
            Dh = llm.head_dim_
            cap = self.pages_max * self.page_size
            dtype = self.state["k"].dtype
            self._chunk_slab = {
                "k": jnp.zeros((llm.num_layers, 1, llm.num_kv_heads, cap, Dh),
                               dtype),
                "v": jnp.zeros((llm.num_layers, 1, llm.num_kv_heads, cap, Dh),
                               dtype),
            }
            if self.mesh is not None:
                # slab layout (L, 1, Hkv, cap, Dh): kv-head axis is 2
                self._chunk_slab = self._shard_state(
                    self._chunk_slab, kv_axis={"k": 2, "v": 2})
        return self._chunk_slab

    def _build_chunk_prefill_fn(self, bucket: int) -> Callable:
        """Prefill ONE chunk of a long prompt into a slot's cache at
        ``start_len`` (sglang-style chunked prefill: prompts beyond the
        largest bucket no longer raise, SURVEY §2.3 parity item).

        Non-paged (slab kv_mode) only — paged mode goes through
        ``_build_chunk_prefill_slab_fn``."""
        model, cfg = self.model, self.cfg
        llm = self._prefill_llm()

        sampler = self._make_sampler()

        def chunk_prefill(params, state, input_ids, attention_mask,
                          mm_inputs, dest, start_len, temps, top_ps, seed):
            embeds = model.embed(params, input_ids, mm_inputs)
            # dest: scalar slot id
            k_slot = jax.lax.dynamic_slice_in_dim(state["k"], dest, 1, axis=1)
            v_slot = jax.lax.dynamic_slice_in_dim(state["v"], dest, 1, axis=1)
            slot_cache = {"k": k_slot, "v": v_slot,
                          "length": start_len[None]}
            _, slot_cache, hidden = llama_forward(
                params["llm"], llm,
                inputs_embeds=embeds,
                attention_mask=attention_mask,
                kv_cache=slot_cache,
                prefill=True,
                attn_impl=cfg.attn_impl,
                return_hidden=True,
            )
            k = jax.lax.dynamic_update_slice(
                state["k"], slot_cache["k"], (0, dest, 0, 0, 0))
            v = jax.lax.dynamic_update_slice(
                state["v"], slot_cache["v"], (0, dest, 0, 0, 0))
            chunk_len = attention_mask.sum(axis=-1).astype(jnp.int32)
            last_h = jnp.take_along_axis(
                hidden, (chunk_len - 1)[:, None, None], axis=1)
            last = lm_head_logits(params["llm"], llm, last_h)[:, 0]
            return ({**state, "k": k, "v": v},
                    sampler(last, temps, top_ps, seed), last)

        return jax.jit(chunk_prefill, donate_argnums=(1,))

    def _get_admit_slot_fn(self) -> Callable:
        """Tiny jitted scatter that writes ONE admitted slot's scheduling
        row into the device state (used by the rare chunked-prefill path;
        grouped prefill folds this into the prefill graph itself)."""
        if getattr(self, "_admit_slot_fn", None) is None:
            paged = self.paged
            eos = self.eos_id

            def admit(state, slot, length, first_token, temp, top_p, budget,
                      page_row):
                active_new = jnp.logical_and(first_token != eos, budget > 1)
                state = {
                    **state,
                    "length": state["length"].at[slot].set(length),
                    "tokens": state["tokens"].at[slot].set(first_token),
                    "active": state["active"].at[slot].set(active_new),
                    "remaining": state["remaining"].at[slot].set(budget - 1),
                    "temps": state["temps"].at[slot].set(temp),
                    "top_ps": state["top_ps"].at[slot].set(top_p),
                }
                if paged:
                    state["pages_length"] = (
                        state["pages_length"].at[slot].set(length))
                    state["page_table"] = (
                        state["page_table"].at[slot].set(page_row))
                return state

            self._admit_slot_fn = jax.jit(admit, donate_argnums=(0,))
        return self._admit_slot_fn

    def _build_fork_fn(self, n_forks: int, copy_partial: bool) -> Callable:
        """Admit ``n_forks`` slots sharing a just-prefilled prompt's KV.

        The forks' first tokens are sampled from the primary's saved
        last-position logits (the prompt is never re-run); the only KV
        traffic is an in-place copy of the parent's PARTIAL last page
        into each fork's own first page (full prompt pages are shared
        host-side by refcount). sglang RadixAttention-style prefix
        sharing (SURVEY §2.3 serving parity) — turns GRPO's G rollouts
        per prompt into ~1 prefill per prompt."""
        eos = self.eos_id
        sampler = self._make_sampler()

        def fork(state, last_logits, slot_ids, page_rows, src_page,
                 dst_pages, plen, temps, top_ps, budgets, seed, src_slot):
            k, v = state["k"], state["v"]
            if copy_partial:
                src_k = jax.lax.dynamic_slice_in_dim(k, src_page, 1, axis=2)
                src_v = jax.lax.dynamic_slice_in_dim(v, src_page, 1, axis=2)
                for f in range(n_forks):  # static unroll; in-place DUS
                    k = jax.lax.dynamic_update_slice(
                        k, src_k, (0, 0, dst_pages[f], 0, 0))
                    v = jax.lax.dynamic_update_slice(
                        v, src_v, (0, 0, dst_pages[f], 0, 0))
            logits = jnp.broadcast_to(
                last_logits[0], (n_forks, last_logits.shape[-1]))
            first = sampler(logits, temps, top_ps, seed)
            active_new = jnp.logical_and(first != eos, budgets > 1)
            lengths = jnp.full((n_forks,), plen, jnp.int32)
            state = {
                **state, "k": k, "v": v,
                "length": state["length"].at[slot_ids].set(lengths),
                "tokens": state["tokens"].at[slot_ids].set(first),
                "active": state["active"].at[slot_ids].set(active_new),
                "remaining": state["remaining"].at[slot_ids].set(budgets - 1),
                "temps": state["temps"].at[slot_ids].set(temps),
                "top_ps": state["top_ps"].at[slot_ids].set(top_ps),
                "pages_length": state["pages_length"].at[slot_ids].set(lengths),
                "page_table": state["page_table"].at[slot_ids].set(page_rows),
            }
            if "history" in state:
                # forks inherit the primary's committed-token history so
                # speculative drafting works from the first step
                hrow = jax.lax.dynamic_slice_in_dim(
                    state["history"], src_slot, 1, axis=0)
                hist = state["history"].at[slot_ids].set(
                    jnp.broadcast_to(hrow, (n_forks, hrow.shape[1])))
                hist = hist.at[slot_ids, lengths].set(first)
                state["history"] = hist
            return state, first

        return jax.jit(fork, donate_argnums=(0,))

    def _try_admit_group(self, primary: Request, free: List[int]) -> bool:
        """Admit a forked group (primary + siblings) atomically: one
        prefill, then fork. Returns False when slots or pages are short
        (the group waits at the queue head, FIFO)."""
        forks = primary.forks
        need_slots = 1 + len(forks)
        if len(free) < need_slots:
            return False
        plen = int(np.asarray(primary.batch["attention_mask"]).sum())
        P = self.page_size
        p_need = self._required_pages(primary)
        n_full = min(plen // P, p_need)
        own = max(p_need - n_full, 0)
        if p_need + len(forks) * own > len(self.free_pages):
            return False
        self.queue.remove(primary)
        slots = [free.pop(0) for _ in range(need_slots)]
        slot0, fork_slots = slots[0], slots[1:]
        # Reserve ALL pages up front: the forks' refcounts on the shared
        # prompt pages must exist before the primary's bookkeeping might
        # finish-and-release it (e.g. EOS on the first sampled token).
        self._reserve_pages(primary, slot0)
        src_page = 0
        for f, s in zip(forks, fork_slots):
            src_page = self._reserve_fork_pages(f, s, slot0, plen) or src_page
        if self._bucket_for(primary.batch["input_ids"].shape[1]) is None:
            self._prefill_chunked(primary, slot0, reserve=False)
        else:
            sig = self._request_signature(primary)
            self._prefill_group([primary], [slot0], sig, reserve=False)

        F = len(forks)
        copy_partial = src_page != 0
        key = (F, copy_partial)
        if key not in self._fork_fns:
            self._fork_fns[key] = self._build_fork_fn(F, copy_partial)
        fork_slots_np = np.asarray(fork_slots, np.int32)
        page_rows = self.page_table[fork_slots_np].astype(np.int32)
        dst_pages = np.asarray(
            [self.page_table[s, n_full] for s in fork_slots], np.int32)
        temps = np.asarray([r.temperature for r in forks], np.float32)
        top_ps = np.asarray([r.top_p for r in forks], np.float32)
        budgets = np.asarray([r.max_new_tokens for r in forks], np.int32)
        self.state, first_tokens = self._fork_fns[key](
            self.state, self._last_prefill_logits,
            jnp.asarray(fork_slots_np), jnp.asarray(page_rows),
            jnp.int32(src_page), jnp.asarray(dst_pages), jnp.int32(plen),
            jnp.asarray(temps), jnp.asarray(top_ps), jnp.asarray(budgets),
            self._next_seed(), jnp.int32(slot0),
        )
        first_tokens = np.asarray(first_tokens)
        now = time.time()
        for j, (req, slot) in enumerate(zip(forks, fork_slots)):
            first = int(first_tokens[j])
            req.first_token_time = now
            req.tokens.append(first)
            self.slot_request[slot] = req
            self.lengths[slot] = plen
            self.pages_length[slot] = plen
            self.slot_budget[slot] = req.max_new_tokens
            self.slot_generated[slot] = 1
            self.slot_temperature[slot] = req.temperature
            self.last_tokens[slot] = first
            if first == self.eos_id:
                self._finish(slot, reason="eos")
            elif req.max_new_tokens <= 1:
                self._finish(slot, reason="budget")
            else:
                self.active[slot] = True
        return True

    @staticmethod
    def _chunk_mm(mm, start: int, length: int, bucket: int):
        """Shift a request's mm pack into chunk-local coordinates; spans
        outside [start, start+length) scatter out of range (dropped). The
        full item stack is passed to every chunk so the compiled signature
        stays stable across chunks."""
        if not mm:
            return None
        out = {}
        for mtype, pack in mm.items():
            tp = np.asarray(pack["token_pos"])
            bi = np.asarray(pack["batch_idx"])
            in_chunk = (tp >= start) & (tp < start + length) & (bi < 1)
            out[mtype] = {
                "values": jnp.asarray(np.asarray(pack["values"])),
                "batch_idx": jnp.asarray(
                    np.where(in_chunk, 0, 1).astype(np.int32)),
                "token_pos": jnp.asarray(
                    np.where(in_chunk, tp - start, bucket).astype(np.int32)),
            }
        return out

    def _prefill_chunked(self, req: Request, slot: int,
                         reserve: bool = True) -> None:
        ids = np.asarray(req.batch["input_ids"])[0]
        mask = np.asarray(req.batch["attention_mask"])[0]
        plen = int(mask.sum())
        ids = ids[:plen]
        W = self.cfg.prefill_buckets[-1]
        mm = req.batch.get("mm_inputs") or {}
        mm_sig = self._request_signature(req)[1]

        if self.paged:
            if reserve:
                self._reserve_pages(req, slot)
            dest = jnp.asarray(self.page_table[slot].astype(np.int32))
            slab = self._get_chunk_slab()
        start = 0
        first_token = None
        temps = np.asarray([req.temperature], np.float32)
        top_ps = np.asarray([req.top_p], np.float32)
        while start < plen:
            c = min(W, plen - start)
            bucket = next(b for b in self.cfg.prefill_buckets if c <= b)
            chunk_ids = np.zeros((1, bucket), np.int32)
            chunk_ids[0, :c] = ids[start : start + c]
            chunk_mask = np.zeros((1, bucket), np.int32)
            chunk_mask[0, :c] = 1
            key = ("chunk", bucket, mm_sig)
            if self.paged:
                if key not in self._chunk_prefill_fns:
                    self._chunk_prefill_fns[key] = (
                        self._build_chunk_prefill_slab_fn(bucket))
                slab, first_token, last_logits = self._chunk_prefill_fns[key](
                    self.params, slab,
                    jnp.asarray(chunk_ids), jnp.asarray(chunk_mask),
                    self._chunk_mm(mm, start, c, bucket),
                    jnp.int32(start),
                    jnp.asarray(temps), jnp.asarray(top_ps),
                    self._next_seed(),
                )
            else:
                if key not in self._chunk_prefill_fns:
                    self._chunk_prefill_fns[key] = (
                        self._build_chunk_prefill_fn(bucket))
                self.state, first_token, last_logits = self._chunk_prefill_fns[key](
                    self.params,
                    self.state,
                    jnp.asarray(chunk_ids), jnp.asarray(chunk_mask),
                    self._chunk_mm(mm, start, c, bucket),
                    jnp.int32(slot), jnp.int32(start),
                    jnp.asarray(temps), jnp.asarray(top_ps),
                    self._next_seed(),
                )
            start += c
        self._last_prefill_logits = last_logits
        if self.paged:
            # fold the prompt's KV into the page pool ONCE
            self._chunk_slab = slab
            self.state = self._get_slab_scatter_fn()(self.state, slab, dest)

        first = int(np.asarray(first_token)[0])
        page_row = (self.page_table[slot].astype(np.int32) if self.paged
                    else np.zeros((1,), np.int32))
        self.state = self._get_admit_slot_fn()(
            self.state, jnp.int32(slot), jnp.int32(plen), jnp.int32(first),
            jnp.float32(req.temperature), jnp.float32(req.top_p),
            jnp.int32(req.max_new_tokens), jnp.asarray(page_row),
        )
        req.first_token_time = time.time()
        req.tokens.append(int(first))
        self.slot_request[slot] = req
        self.lengths[slot] = plen
        if self.paged:
            self.pages_length[slot] = plen
        self.slot_budget[slot] = req.max_new_tokens
        self.slot_generated[slot] = 1
        self.slot_temperature[slot] = req.temperature
        self.last_tokens[slot] = int(first)
        if int(first) == self.eos_id:
            self._finish(slot, reason="eos")
        elif req.max_new_tokens <= 1:
            self._finish(slot, reason="budget")
        else:
            self.active[slot] = True

    def _next_seed(self) -> np.int32:
        self._seed_ctr += 1
        return np.int32((self.cfg.seed + 0x9E3779B1 * self._seed_ctr) & 0x7FFFFFFF)

    def _finish(self, slot: int, reason: str = "budget") -> None:
        if self.paged:
            self._release_pages(slot)
        req = self.slot_request[slot]
        if req is not None:
            req.done = True
            req.finish_time = time.time()
            if req.finish_reason is None:
                req.finish_reason = reason
        self.slot_request[slot] = None
        self.active[slot] = False

    def step(self) -> bool:
        """Admit + one decode chunk for all active slots.
        Returns True if any work remains."""
        self._admit()

        # Capacity finishes are honest: a slot only ends early when there
        # is genuinely no cache room for one more token, and the request
        # is told why (finish_reason="capacity").
        for slot in range(self.cfg.max_slots):
            if self.active[slot] and self.lengths[slot] >= self.cfg.max_seq_len:
                self._finish(slot, reason="capacity")

        if not self.active.any():
            return bool(self.queue)

        if self.spec_k:
            return self._spec_step()

        # Shrink the final chunk to the tightest active slot's headroom
        # (power-of-two variants bound the compile count) instead of
        # force-finishing slots with budget remaining.
        headroom = min(
            self.cfg.max_seq_len - int(self.lengths[s])
            for s in range(self.cfg.max_slots) if self.active[s]
        )
        chunk_now = min(self.decode_chunk, max(1, headroom))
        if self.cfg.prefill_group_cap and self.queue:
            # prefill-priority while staggering: a 1-step chunk keeps the
            # admitted streams alive without making the next group's
            # first tokens wait a full decode chunk
            chunk_now = 1
        chunk_now = 1 << (chunk_now.bit_length() - 1)
        decode_fn = self._get_decode_fn(chunk_now)

        active_at_start = self.active.copy()
        # ZERO uploads: params + the whole scheduling state already live
        # on device; ONE download: the token matrix.
        self.state, toks = decode_fn(self.params, self.state)
        toks = np.asarray(toks)  # (chunk, slots)

        # Advance the host mirrors from the tokens alone, replicating the
        # in-graph deactivation rules exactly: a slot that emitted EOS or
        # exhausted its budget at step s advanced its device length by
        # s+1 and then stopped.
        for slot in range(self.cfg.max_slots):
            if not active_at_start[slot]:
                continue
            req = self.slot_request[slot]
            for s in range(chunk_now):
                tok = int(toks[s, slot])
                req.tokens.append(tok)
                self.slot_generated[slot] += 1
                self.lengths[slot] += 1
                self.last_tokens[slot] = tok
                if tok == self.eos_id:
                    self._finish(slot, reason="eos")
                    break
                if self.slot_generated[slot] >= self.slot_budget[slot]:
                    self._finish(slot, reason="budget")
                    break
                if self.lengths[slot] >= self.cfg.max_seq_len:
                    # in-graph capacity deactivation mirrored here; the
                    # finish itself (page release) happens at the top of
                    # the next step so the fold of THIS chunk still owned
                    # the pages
                    break
        if self.paged:
            # the fold moved this chunk's ring rows into the pages
            self.pages_length = self.lengths.copy()
        return bool(self.queue) or bool(self.active.any())

    def _spec_step(self) -> bool:
        """Speculative decode chunk + host-mirror advance. Capacity,
        budget and EOS are enforced IN-GRAPH by the emit mask, so the
        mirrors just replay it."""
        n_steps = (1 if (self.cfg.prefill_group_cap and self.queue)
                   else self.decode_chunk)
        fn = self._get_spec_decode_fn(n_steps)
        self.state, (gs, emits) = fn(self.params, self.state)
        gs = np.asarray(gs)          # (n_steps, slots, k+1)
        ems = np.asarray(emits)
        # acceptance accounting: verify steps that had >= 1 active slot,
        # and tokens committed — tokens/step is the speculative speedup
        # over one-token-at-a-time decode
        live = ems.any(axis=2)       # (n_steps, slots)
        self.spec_verify_steps = (getattr(self, "spec_verify_steps", 0)
                                  + int(live.any(axis=1).sum()))
        self.spec_slot_steps = (getattr(self, "spec_slot_steps", 0)
                                + int(live.sum()))
        self.spec_emitted = (getattr(self, "spec_emitted", 0)
                             + int(ems.sum()))
        for s in range(gs.shape[0]):
            for slot in range(self.cfg.max_slots):
                req = self.slot_request[slot]
                if req is None or not self.active[slot]:
                    continue
                for i in range(gs.shape[2]):
                    if not ems[s, slot, i]:
                        continue
                    tok = int(gs[s, slot, i])
                    req.tokens.append(tok)
                    self.slot_generated[slot] += 1
                    self.lengths[slot] += 1
                    self.last_tokens[slot] = tok
                    if tok == self.eos_id:
                        self._finish(slot, reason="eos")
                        break
                if (self.slot_request[slot] is not None
                        and self.active[slot]):
                    if self.slot_generated[slot] >= self.slot_budget[slot]:
                        self._finish(slot, reason="budget")
                    elif self.lengths[slot] >= self.cfg.max_seq_len:
                        self._finish(slot, reason="capacity")
        if self.paged:
            # the fold moved this chunk's ring rows into the pages
            self.pages_length = self.lengths.copy()
        return bool(self.queue) or bool(self.active.any())

    def run(self) -> None:
        """Drain the queue completely."""
        while self.step():
            pass

    def generate(
        self,
        batches: List[Dict[str, Any]],
        max_new_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
        group_size: Optional[int] = None,
    ) -> List[List[int]]:
        """Synchronous batch generation through the continuous-batching path.

        With ``group_size=G``, consecutive runs of G batches are assumed
        to repeat ONE prompt (GRPO rollout layout) and go through
        ``submit_group`` — the prompt prefills once, siblings fork its KV
        pages."""
        if group_size and group_size > 1:
            if len(batches) % group_size != 0:
                raise ValueError("len(batches) must be a multiple of group_size")
            reqs: List[Request] = []
            for i in range(0, len(batches), group_size):
                reqs.extend(self.submit_group(
                    batches[i], group_size,
                    max_new_tokens=max_new_tokens, temperature=temperature,
                ))
        else:
            reqs = [
                self.submit(b, max_new_tokens=max_new_tokens,
                            temperature=temperature)
                for b in batches
            ]
        self.run()
        return [r.tokens for r in reqs]
