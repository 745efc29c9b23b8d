"""Loader num_workers wiring + per-host index sharding (VERDICT items 7/8).

- Batches must be byte-identical for any worker count (ordering preserved,
  thread pool only parallelizes per-item fetches within a batch).
- shard_by_process must give every host a disjoint, equal-sized index slice
  that jointly covers all but the tail remainder.
"""
import numpy as np

from garmentnets_tpu.data.dataset import Loader, ConvImplicitWNFDataModule


class _ArrayDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rs = np.random.RandomState(i)
        return {"pos": rs.rand(4, 3).astype(np.float32),
                "idx": np.array([i])}


def _all_batches(loader):
    return [{k: v.copy() for k, v in b.items()} for b in loader]


def test_num_workers_batches_identical():
    ds = _ArrayDataset(13)
    idxs = np.arange(13)
    serial = _all_batches(Loader(ds, idxs, 4, shuffle=True, seed=3))
    pooled = _all_batches(Loader(ds, idxs, 4, shuffle=True, seed=3,
                                 num_workers=4))
    assert len(serial) == len(pooled) == 4
    for a, b in zip(serial, pooled):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_early_break_advances_epoch_and_reaps_thread():
    """VERDICT r1 weak #2: abandoning the iterator mid-epoch must still
    advance the shuffle epoch (fresh order next time) and must not leak the
    prefetch thread blocked on queue.put."""
    import gc
    import threading
    import time

    ds = _ArrayDataset(32)
    idxs = np.arange(32)
    loader = Loader(ds, idxs, 2, shuffle=True, seed=7, prefetch=1)

    def first_batch_idxs():
        it = iter(loader)
        b = next(it)
        del it          # abandon mid-epoch (generator GC -> close())
        gc.collect()
        return b["idx"].ravel().copy()

    n0 = threading.active_count()
    orders = [first_batch_idxs() for _ in range(4)]
    assert any(not np.array_equal(orders[0], o) for o in orders[1:]), \
        "every abandoned epoch reused the same shuffle order"
    deadline = time.time() + 5.0
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n0, "prefetch threads leaked"


def test_full_drain_epoch_sequence_unchanged():
    """Epoch advance moved to iteration start; fully-drained epochs must see
    the same seed sequence as before (epoch 0, 1, 2, ...)."""
    ds = _ArrayDataset(8)
    idxs = np.arange(8)
    loader = Loader(ds, idxs, 8, shuffle=True, seed=5)
    seen = [next(iter(loader))["idx"].ravel().copy() for _ in range(2)]
    expect = []
    for epoch in range(2):
        rs = np.random.RandomState(5 + epoch)
        expect.append(idxs[rs.permutation(8)])
    for got, exp in zip(seen, expect):
        np.testing.assert_array_equal(np.sort(got), np.arange(8))
        np.testing.assert_array_equal(got, exp)


def test_process_shard_disjoint_cover():
    dm = ConvImplicitWNFDataModule.__new__(ConvImplicitWNFDataModule)
    dm.kwargs = {"shard_by_process": True, "dataset_split": [8, 1, 1]}
    idxs = np.arange(103)
    shards = [dm._process_shard(idxs, process_count=4, process_index=p)
              for p in range(4)]
    sizes = {len(s) for s in shards}
    assert sizes == {25}                      # equal steps on every host
    union = np.sort(np.concatenate(shards))
    np.testing.assert_array_equal(union, np.arange(100))  # tail dropped
    flat = np.concatenate(shards)
    assert len(np.unique(flat)) == len(flat)  # disjoint


def test_process_shard_disabled_passthrough():
    dm = ConvImplicitWNFDataModule.__new__(ConvImplicitWNFDataModule)
    dm.kwargs = {"dataset_split": [8, 1, 1]}
    idxs = np.arange(10)
    np.testing.assert_array_equal(
        dm._process_shard(idxs, process_count=4, process_index=1), idxs)


def test_slow_consumer_receives_stop_sentinel():
    """End-of-epoch deadlock regression: the producer thread used
    put_nowait for the stop sentinel, which silently dropped it whenever
    the consumer lagged >= prefetch batches behind at producer exit — the
    consumer then blocked on q.get() forever. Reproduced by the predict
    CLI on any dataset longer than ~6 batches (fast loader, slow
    zarr-writing consumer). A slow consumer must still drain the epoch
    and terminate."""
    import threading
    import time

    loader = Loader(_ArrayDataset(16), np.arange(16), batch_size=2,
                    prefetch=1, num_workers=0)
    got = []

    def consume():
        for b in loader:
            time.sleep(0.05)   # slower than the producer fills prefetch=1
            got.append(b["idx"].ravel())

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=30)
    assert not t.is_alive(), "consumer never saw the stop sentinel"
    np.testing.assert_array_equal(np.concatenate(got), np.arange(16))
