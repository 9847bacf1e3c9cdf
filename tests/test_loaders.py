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


# ---------------------------------------------------------------------------
# host_shard(mesh): per-data-group striping on multi-axis meshes
# (integration-proved by tests/test_multiprocess.py; these cover the
# group derivation + error branches cheaply with fake process layouts)
# ---------------------------------------------------------------------------

class _FakeDev:
    def __init__(self, process_index):
        self.process_index = process_index


class _FakeMesh:
    """Duck-typed stand-in for jax.sharding.Mesh: only the attributes
    host_shard() reads (devices / axis_names / shape)."""

    def __init__(self, proc_grid, axis_names):
        self.devices = np.array(
            [[_FakeDev(p) for p in row] for row in proc_grid], dtype=object)
        self.axis_names = tuple(axis_names)
        self.shape = dict(zip(axis_names, self.devices.shape))


def _host_shard_as(monkeypatch, pid, nprocs, mesh):
    import jax
    from insenticap_model_tpu.cli import common
    monkeypatch.setattr(jax, "process_count", lambda: nprocs)
    monkeypatch.setattr(jax, "process_index", lambda: pid)
    return common.host_shard(mesh)


def test_host_shard_groups_processes_sharing_data_coordinate(monkeypatch):
    # (2, 2) data x model mesh, 4 processes, one device each laid out so
    # processes {0,1} sit at data-coord 0 and {2,3} at data-coord 1:
    # both members of a data group must load the SAME stripe.
    mesh = _FakeMesh([[0, 1], [2, 3]], ("data", "model"))
    stripes = [_host_shard_as(monkeypatch, p, 4, mesh) for p in range(4)]
    assert stripes == [(0, 2), (0, 2), (1, 2), (1, 2)]


def test_host_shard_full_data_axis_per_process_means_no_striping(
        monkeypatch):
    # 2 processes each owning a full model COLUMN (devices at every data
    # coordinate): each must supply rows for every batch shard, so both
    # get the whole dataset (one group).
    mesh = _FakeMesh([[0, 1], [0, 1]], ("data", "model"))
    for p in range(2):
        assert _host_shard_as(monkeypatch, p, 2, mesh) == (0, 1)


def test_host_shard_model_major_layout(monkeypatch):
    # transposed ownership: processes {0,2} share data-coord 0 via the
    # model axis being axis 0 of the grid
    mesh = _FakeMesh([[0, 1], [2, 3]], ("model", "data"))
    stripes = [_host_shard_as(monkeypatch, p, 4, mesh) for p in range(4)]
    assert stripes == [(0, 2), (1, 2), (0, 2), (1, 2)]


def test_host_shard_rejects_process_without_devices(monkeypatch):
    mesh = _FakeMesh([[0, 0], [1, 1]], ("data", "model"))
    with pytest.raises(ValueError, match="owns no device"):
        _host_shard_as(monkeypatch, 2, 3, mesh)


def test_host_shard_rejects_partial_data_shard_overlap(monkeypatch):
    # process 1's data-coordinate set {0, 1} overlaps process 0's {0}
    # without being equal — no consistent per-group stripe exists
    mesh = _FakeMesh([[0, 1], [1, 1]], ("data", "model"))
    with pytest.raises(ValueError, match="unsupported mesh"):
        _host_shard_as(monkeypatch, 0, 2, mesh)


def test_host_shard_single_process_is_none(monkeypatch):
    import jax
    from insenticap_model_tpu.cli import common
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    assert common.host_shard() is None


def test_host_shard_rejects_permuted_data_blocks(monkeypatch):
    # groups {0,2} and {1,3}: disjoint and equal-size, but stripe r would
    # land on non-contiguous global row blocks — must raise, not
    # silently permute rows
    mesh = _FakeMesh([[0, 0], [1, 1], [0, 0], [1, 1]], ("data", "model"))
    with pytest.raises(ValueError, match="contiguous"):
        _host_shard_as(monkeypatch, 0, 2, mesh)


def test_host_shard_rejects_unequal_group_sizes(monkeypatch):
    # groups {0} and {1,2}: disjoint but unequal — the equal-stripe
    # loaders cannot express it; must fail here with a clear error
    # rather than later inside make_array_from_process_local_data
    mesh = _FakeMesh([[0, 0], [1, 1], [1, 1]], ("data", "model"))
    with pytest.raises(ValueError, match="equal contiguous"):
        _host_shard_as(monkeypatch, 0, 2, mesh)
