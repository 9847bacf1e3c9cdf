"""Data-loader unit tests: batching/padding policy, multi-host sharding,
cycle iterator, producer-thread shutdown on abandoned iteration."""
import threading
import time

import numpy as np
import pytest

from insenticap_model_tpu.data.loaders import (CycleIterator, Loader,
                                               device_prefetch)


def _collate(xs):
    return {"x": np.asarray(xs)}


def test_drop_last_and_padding():
    ld = Loader(list(range(10)), 4, _collate, shuffle=False, drop_last=True)
    batches = list(ld)
    assert len(batches) == 2
    assert all(b["valid"] == 4 for b in batches)

    ld = Loader(list(range(10)), 4, _collate, shuffle=False, drop_last=False)
    batches = list(ld)
    assert len(batches) == 3
    assert batches[-1]["valid"] == 2
    # padded by repeating the final item
    assert list(batches[-1]["x"]) == [8, 9, 9, 9]


def test_shuffle_reshuffles_across_epochs():
    ld = Loader(list(range(64)), 8, _collate, shuffle=True, seed=0)
    e1 = np.concatenate([b["x"] for b in ld])
    e2 = np.concatenate([b["x"] for b in ld])
    assert sorted(e1) == sorted(e2) == list(range(64))
    assert not np.array_equal(e1, e2)


def test_host_sharding_disjoint():
    items = list(range(20))
    shards = [Loader(items, 2, _collate, shuffle=False, drop_last=False,
                     shard=(i, 4)) for i in range(4)]
    seen = [int(v) for ld in shards for b in ld
            for v in b["x"][:b["valid"]]]
    assert sorted(seen) == items  # disjoint and complete


def test_host_sharding_equal_batch_counts_when_uneven():
    """21 items over 8 hosts: every host must see the SAME number of items
    and batches (floor(n/count) truncation) — unequal stripes would let one
    host run a collective-bearing step the others never join."""
    items = list(range(21))
    shards = [Loader(items, 2, _collate, shuffle=False, drop_last=True,
                     shard=(i, 8)) for i in range(8)]
    assert all(len(ld.items) == 2 for ld in shards)
    counts = [len(list(ld)) for ld in shards]
    assert counts == [1] * 8
    seen = [int(v) for ld in shards for b in ld for v in b["x"]]
    assert len(seen) == len(set(seen))  # stripes stay disjoint


def test_cycle_iterator_wraps_and_rejects_empty():
    ld = Loader(list(range(6)), 3, _collate, shuffle=False)
    it = CycleIterator(ld)
    vals = [it.next()["x"][0] for _ in range(5)]
    assert len(vals) == 5  # wrapped past 2 batches/epoch

    empty = Loader(list(range(2)), 5, _collate, shuffle=False,
                   drop_last=True)
    with pytest.raises(ValueError, match="empty loader"):
        CycleIterator(empty).next()


def test_abandoned_iteration_does_not_leak_threads():
    base = threading.active_count()
    for _ in range(10):
        ld = Loader(list(range(100)), 5, _collate, shuffle=False)
        for i, b in enumerate(ld):
            if i >= 1:
                break
    deadline = time.time() + 5.0
    while threading.active_count() > base and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= base


def test_device_prefetch_preserves_order_and_count():
    ld = Loader(list(range(12)), 3, _collate, shuffle=False)
    staged = []
    out = list(device_prefetch(iter(ld), lambda b: staged.append(b) or b,
                               depth=2))
    assert len(out) == 4
    assert [int(b["x"][0]) for b in out] == [0, 3, 6, 9]
    assert len(staged) == 4
