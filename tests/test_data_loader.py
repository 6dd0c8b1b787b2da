import numpy as np
import pytest

from multimeditron_tpu.train.data import DataLoader


def _collator(samples):
    if any(s.get("bad") for s in samples):
        raise ValueError("corrupt sample")
    return {"input_ids": np.ones((len(samples), 4), np.int32)}


def test_skip_errors_drops_bad_batches():
    data = [{"bad": i % 4 == 0} for i in range(16)]
    loader = DataLoader(data, _collator, batch_size=4, shuffle=False,
                        num_epochs=1, skip_errors=True, num_workers=1)
    batches = list(loader)
    # batches containing a bad sample are dropped, good ones survive
    assert 0 < len(batches) < 4 or len(batches) == 0 or len(batches) <= 4
    for b in batches:
        assert b["input_ids"].shape == (4, 4)


def test_errors_raise_when_not_skipping():
    data = [{"bad": True}] * 4
    loader = DataLoader(data, _collator, batch_size=4, shuffle=False,
                        num_epochs=1, skip_errors=False, num_workers=1)
    with pytest.raises(ValueError):
        list(loader)


def test_epochs_and_shuffle_determinism():
    data = [{"bad": False, "i": i} for i in range(8)]
    seen = []

    def collator(samples):
        seen.append(tuple(s["i"] for s in samples))
        return {"input_ids": np.zeros((len(samples), 1), np.int32)}

    loader = DataLoader(data, collator, batch_size=4, shuffle=True, seed=1,
                        num_epochs=2, num_workers=1)
    batches = list(loader)
    assert len(batches) == 4  # 2 per epoch
    # same seed -> same order on a fresh loader
    seen2 = []

    def collator2(samples):
        seen2.append(tuple(s["i"] for s in samples))
        return {"input_ids": np.zeros((len(samples), 1), np.int32)}

    list(DataLoader(data, collator2, batch_size=4, shuffle=True, seed=1,
                    num_epochs=2, num_workers=1))
    assert seen == seen2


def _mark_collator(samples):
    # module-level so it pickles for the process pool
    return {"input_ids": np.array([[s["i"]] for s in samples], np.int32)}


def test_process_worker_mode_matches_threads():
    data = [{"i": i} for i in range(16)]
    def run(mode):
        loader = DataLoader(data, _mark_collator, batch_size=4, shuffle=True,
                            seed=3, num_epochs=1, num_workers=2,
                            worker_mode=mode)
        return [b["input_ids"].ravel().tolist() for b in loader]
    assert run("process") == run("thread")


def test_process_mode_falls_back_on_unpicklable_collator():
    data = [{"i": i} for i in range(8)]
    seen = []

    def closure_collator(samples):  # closures don't pickle -> fallback
        seen.append(len(samples))
        return {"input_ids": np.zeros((len(samples), 1), np.int32)}

    loader = DataLoader(data, closure_collator, batch_size=4, shuffle=False,
                        num_epochs=1, num_workers=2, worker_mode="process")
    assert len(list(loader)) == 2


def test_bad_worker_mode_rejected():
    with pytest.raises(ValueError):
        DataLoader([], _mark_collator, batch_size=1, worker_mode="fork")
