"""Host-side training data loading.

Replaces the reference's HF-Trainer DataLoader plumbing
(``cli/train.py:46-68`` dataset concatenation + shuffle; 16 workers per
process feeding the collator, SURVEY.md §3.1): datasets are concatenated
and shuffled, then a background worker pool runs the (numpy) collator so
host preprocessing overlaps device steps — the TPU input-pipeline
equivalent of dataloader workers. ``worker_mode="process"`` matches the
reference's worker PROCESSES for GIL-bound collation (tokenizer/numpy
label masking; PIL releases the GIL for decode/resize but not for
array conversion): the pool spawns workers that each hold a pickled
collator (initializer) and ship collated batches back. Batches are
~20 MB of pixel data, so process mode only wins when collation cost
exceeds pickle cost — benchmark with ``benchmarks/collator_bench.py``
on the target host and keep ``thread`` (the default) otherwise.
"""

from __future__ import annotations

import concurrent.futures as cf
import logging
import os
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def is_dataset_folder(folder: str) -> bool:
    return os.path.exists(os.path.join(folder, "dataset_info.json")) and os.path.exists(
        os.path.join(folder, "state.json")
    )


def build_datasets(dataset_configs: List[Dict[str, Any]], seed: int = 0, num_proc: int = 1):
    """Load + concatenate + shuffle packed datasets
    (reference ``cli/train.py:46-68``)."""
    from datasets import Dataset, concatenate_datasets, load_dataset, load_from_disk

    parts = []
    for ds_config in dataset_configs:
        path = ds_config["packed_path"]
        if is_dataset_folder(path):
            ds = load_from_disk(path)
        elif path.endswith(".jsonl"):
            from multimeditron_tpu.utils.jsonl import JSONLGenerator

            gen = JSONLGenerator(path)
            ds = Dataset.from_generator(lambda gen=gen: iter(gen))
        elif path.endswith(".parquet"):
            ds = load_dataset("parquet", data_files=path)["train"]
        else:
            ds = load_dataset(path, num_proc=num_proc or None)["train"]
        parts.append(ds)
    return concatenate_datasets(parts).shuffle(seed=seed)


class DataLoader:
    """Shuffled epoch iterator: dataset -> collated numpy batches, with a
    small pipeline of background collation workers.

    Multi-host: every process draws the SAME per-epoch permutation (seeded
    identically) and takes its contiguous slice of each global batch, so
    the union of all hosts' local batches is exactly the global batch and
    shards are disjoint — the torchrun/DistributedSampler contract
    (reference trains per-rank via torchrun, docs/source/guides/training.rst).
    ``batch_size`` is the GLOBAL batch size; each host yields
    ``batch_size // process_count`` samples per step.
    """

    def __init__(
        self,
        dataset: Sequence[Dict[str, Any]],
        collator: Callable[[List[Dict[str, Any]]], Dict[str, Any]],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 2,
        num_epochs: Optional[int] = None,
        skip_errors: bool = True,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        worker_mode: str = "thread",
    ):
        self.dataset = dataset
        self.collator = collator
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode must be thread|process, got {worker_mode!r}")
        self.worker_mode = worker_mode
        self.num_epochs = num_epochs
        # Input-fault tolerance: a batch whose collation raises (corrupt
        # image, malformed sample) is logged and skipped instead of killing
        # a multi-hour run. The reference only handles this in its expert
        # trainer (corrupt-image filter, train_clip.py:495-510).
        self.skip_errors = skip_errors
        if process_count is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        if batch_size % process_count:
            raise ValueError(
                f"Global batch size {batch_size} must divide evenly over "
                f"{process_count} processes"
            )
        self.process_index = process_index
        self.process_count = process_count
        self.local_batch_size = batch_size // process_count
        if drop_last and len(dataset) < batch_size:
            raise ValueError(
                f"Dataset has {len(dataset)} samples but the global batch "
                f"size is {batch_size} (drop_last would yield no batches)"
            )

    def _index_batches(self, epoch: int) -> Iterator[List[int]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(self.seed + epoch).permutation(n)
        lb = self.local_batch_size
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if len(idx) < self.batch_size and (
                self.drop_last or self.process_count > 1
            ):
                # Multi-host always drops the partial global batch: a
                # ragged per-host split would desynchronize step counts
                # (and hang the collectives).
                return
            yield list(idx[self.process_index * lb : (self.process_index + 1) * lb])

    def _result(self, fut) -> Optional[Dict[str, Any]]:
        try:
            return fut.result()
        except Exception:
            if not self.skip_errors:
                raise
            logger.exception("Skipping batch that failed to collate")
            return None

    def _make_pool(self):
        if self.worker_mode == "process":
            try:
                # spawn, not fork: the parent typically holds live JAX/XLA
                # threads and fork() of a multithreaded process can deadlock
                # the children. spawn requires the collator to pickle, which
                # the fallback below already guards.
                import multiprocessing as mp
                import pickle

                # spawn pickles initargs lazily (at first worker start), so
                # probe picklability NOW to keep the fallback eager.
                pickle.dumps(self.collator)
                pool = cf.ProcessPoolExecutor(
                    max_workers=self.num_workers,
                    mp_context=mp.get_context("spawn"),
                    initializer=_proc_worker_init,
                    initargs=(self.collator,),
                )
                return pool, _proc_worker_collate
            except Exception:
                logger.exception(
                    "Process pool unavailable (unpicklable collator?); "
                    "falling back to threads"
                )
        return (
            cf.ThreadPoolExecutor(max_workers=self.num_workers),
            self.collator,
        )

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        epoch = 0
        pool, fn = self._make_pool()
        with pool:
            while self.num_epochs is None or epoch < self.num_epochs:
                pending = []
                for idx in self._index_batches(epoch):
                    samples = [self.dataset[int(i)] for i in idx]
                    pending.append(pool.submit(fn, samples))
                    # keep a bounded pipeline
                    while len(pending) > self.num_workers:
                        batch = self._result(pending.pop(0))
                        if batch is not None:
                            yield batch
                for fut in pending:
                    batch = self._result(fut)
                    if batch is not None:
                        yield batch
                epoch += 1


_WORKER_COLLATOR = None


def _proc_worker_init(collator) -> None:
    global _WORKER_COLLATOR
    _WORKER_COLLATOR = collator


def _proc_worker_collate(samples):
    return _WORKER_COLLATOR(samples)


def globalize_mm_pack(
    pack: Dict[str, np.ndarray],
    local_rows: int,
    process_index: int,
    process_count: int,
    pad_items_to: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Rewrite a host-local mm_inputs pack into GLOBAL batch coordinates.

    The collator emits scatter targets relative to the local batch
    (``batch_idx`` in [0, local_rows), padded slots >= local_rows). On a
    multi-host mesh the global batch is the concatenation of every host's
    rows, so live indices shift by ``process_index * local_rows`` and pad
    slots move past the GLOBAL row count. ``pad_items_to`` additionally
    pads the item stack (zero values + dropped indices) so every host
    contributes the same number of items — required by
    ``jax.make_array_from_process_local_data``'s uniform-shard contract.
    """
    values = np.asarray(pack["values"])
    bi = np.asarray(pack["batch_idx"])
    tp = np.asarray(pack["token_pos"])
    global_rows = local_rows * process_count
    bi = np.where(bi < local_rows, bi + process_index * local_rows,
                  global_rows).astype(np.int32)
    if pad_items_to is not None and values.shape[0] < pad_items_to:
        n_emb = bi.shape[0] // max(values.shape[0], 1) if values.shape[0] else 1
        extra = pad_items_to - values.shape[0]
        values = np.concatenate(
            [values, np.zeros((extra,) + values.shape[1:], values.dtype)])
        bi = np.concatenate(
            [bi, np.full(extra * n_emb, global_rows, np.int32)])
        tp = np.concatenate([tp, np.zeros(extra * n_emb, np.int32)])
    return {"values": values, "batch_idx": bi, "token_pos": tp.astype(np.int32)}
