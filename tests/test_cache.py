"""Unit tests for the source-stamped disk cache (utils/cache.py).

Covers the contract the dataset relies on (reference common/cache.py role):
hit on unchanged source, miss + recompute when the source changes, and
resilience to corrupt entries.
"""
import os
import pickle

from garmentnets_tpu.utils.cache import SourceStampCache, file_attr_cache


def _touch(path, text):
    path.write_text(text)


def test_hit_and_invalidation(tmp_path):
    src = tmp_path / "data.zarr"
    _touch(src, "v1")
    cache = SourceStampCache(tmp_path / "cache")

    calls = []

    def compute():
        calls.append(1)
        return {"n": len(calls)}

    assert cache.get_or_compute(src, compute) == {"n": 1}
    assert cache.get_or_compute(src, compute) == {"n": 1}  # hit
    assert len(calls) == 1

    # change the source (mtime_ns + size both move)
    _touch(src, "v2 longer")
    os.utime(src, ns=(123, 456_000_000_000))
    assert cache.get_or_compute(src, compute) == {"n": 2}
    assert len(calls) == 2
    # stale entry for the old state was garbage-collected
    entries = list((tmp_path / "cache").glob("*.pkl"))
    assert len(entries) == 1


def test_corrupt_entry_recomputes(tmp_path):
    src = tmp_path / "data.zarr"
    _touch(src, "v1")
    cache = SourceStampCache(tmp_path / "cache")
    assert cache.get_or_compute(src, lambda: 7) == 7
    (entry,) = (tmp_path / "cache").glob("*.pkl")
    entry.write_bytes(b"not a pickle")
    assert cache.get_or_compute(src, lambda: 8) == 8


def test_decorator_facade(tmp_path):
    src = tmp_path / "data.zarr"
    _touch(src, "v1")
    calls = []

    @file_attr_cache(src, cache_dir=tmp_path / "cache")
    def scan(x):
        calls.append(x)
        return x * 2

    assert scan(21) == 42
    assert scan(21) == 42
    assert calls == [21]
    # a fresh decorated function hits the same persisted entry
    @file_attr_cache(src, cache_dir=tmp_path / "cache")
    def scan2(x):
        raise AssertionError("should have been served from disk")

    assert scan2(21) == 42


def test_distinct_sources_do_not_collide(tmp_path):
    a, b = tmp_path / "a.zarr", tmp_path / "b.zarr"
    _touch(a, "same")
    _touch(b, "same")
    cache = SourceStampCache(tmp_path / "cache")
    assert cache.get_or_compute(a, lambda: "A") == "A"
    assert cache.get_or_compute(b, lambda: "B") == "B"
    assert cache.get_or_compute(a, lambda: "X") == "A"
