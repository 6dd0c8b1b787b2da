"""Per-host input pipeline (round-1 VERDICT missing #2).

Two simulated processes: each host's DataLoader must draw a disjoint
shard of every global batch (union = global batch), and the mm_inputs
scatter metadata must be rewritten into global batch coordinates.
"""

import numpy as np

from multimeditron_tpu.train.data import DataLoader, globalize_mm_pack


def _dataset(n):
    return [{"i": i} for i in range(n)]


def _collate(samples):
    return {"idx": np.asarray([s["i"] for s in samples])}


def test_dataloader_process_shards_are_disjoint_and_complete():
    n, B, pc = 64, 8, 2
    loaders = [
        DataLoader(_dataset(n), _collate, batch_size=B, seed=3, num_epochs=1,
                   num_workers=1, process_index=pi, process_count=pc)
        for pi in range(pc)
    ]
    per_host = [[b["idx"] for b in ld] for ld in loaders]
    assert len(per_host[0]) == len(per_host[1]) == n // B
    for step, (a, b) in enumerate(zip(*per_host)):
        assert len(a) == len(b) == B // pc  # local batch size
        assert set(a) & set(b) == set()     # disjoint
    all_a = np.concatenate(per_host[0])
    all_b = np.concatenate(per_host[1])
    assert set(all_a.tolist()) | set(all_b.tolist()) == set(range(n))

    # same epoch permutation across hosts: union of each STEP's shards is
    # the same global batch a single-process loader would have drawn
    single = [b["idx"] for b in DataLoader(
        _dataset(n), _collate, batch_size=B, seed=3, num_epochs=1,
        num_workers=1, process_index=0, process_count=1)]
    for step, (a, b) in enumerate(zip(*per_host)):
        assert set(a.tolist()) | set(b.tolist()) == set(single[step].tolist())


def test_dataloader_multihost_drops_partial_global_batch():
    n, B, pc = 20, 8, 2  # 2 full global batches + 4 leftover
    ld = DataLoader(_dataset(n), _collate, batch_size=B, seed=0,
                    num_epochs=1, num_workers=1, drop_last=False,
                    process_index=0, process_count=pc)
    assert len(list(ld)) == n // B


def test_globalize_mm_pack_offsets_and_pads():
    n_emb = 3
    pack = {
        "values": np.ones((2, 4, 4, 3), np.float32),
        "batch_idx": np.asarray([0, 0, 0, 1, 1, 1], np.int32),
        "token_pos": np.asarray([5, 6, 7, 9, 10, 11], np.int32),
    }
    out = globalize_mm_pack(pack, local_rows=4, process_index=1,
                            process_count=2, pad_items_to=4)
    # live rows shift by process_index * local_rows = 4
    np.testing.assert_array_equal(out["batch_idx"][:6], [4, 4, 4, 5, 5, 5])
    # padded items scatter past the GLOBAL row count (8)
    assert out["values"].shape[0] == 4
    assert (out["batch_idx"][6:] == 8).all()
    assert out["token_pos"].shape[0] == out["batch_idx"].shape[0]

    # padded slots already >= local_rows also land past the global rows
    pack2 = {
        "values": np.ones((2, 2, 2, 3), np.float32),
        "batch_idx": np.asarray([0, 0, 9, 9], np.int32),  # item 2 is pad
        "token_pos": np.zeros(4, np.int32),
    }
    out2 = globalize_mm_pack(pack2, local_rows=4, process_index=0,
                             process_count=2)
    np.testing.assert_array_equal(out2["batch_idx"], [0, 0, 8, 8])
