"""Degraded-link defense (VERDICT r4 #5): a device->host fetch that stalls
must produce a one-line degradation warning and a BOUNDED-latency failure,
not an indefinite hang (the reference's per-sample try/except failure
protocol, predict.py:165-189, extended to time).
"""
import time

import numpy as np
import pytest

from garmentnets_tpu.harness import linkguard


@pytest.fixture(autouse=True)
def _reset_warned():
    linkguard._WARNED[0] = False
    yield
    linkguard._WARNED[0] = False


def test_fast_fetch_passes_through(monkeypatch):
    monkeypatch.setenv("GARMENTNETS_FETCH_DEADLINE", "60")
    assert linkguard.guarded_fetch(lambda: 41 + 1, "fast") == 42


def test_disabled_guard_runs_inline(monkeypatch):
    monkeypatch.setenv("GARMENTNETS_FETCH_DEADLINE", "0")
    # runs on the calling thread: thread-local state proves it
    import threading
    ident = linkguard.guarded_fetch(
        lambda: threading.get_ident(), "inline")
    assert ident == threading.get_ident()


def test_slow_fetch_warns_once(monkeypatch, capfd):
    monkeypatch.setenv("GARMENTNETS_FETCH_DEADLINE", "8")
    # soft threshold = deadline/4 = 2s; the fetch takes 2.5s -> warns, then
    # completes fine
    out = linkguard.guarded_fetch(
        lambda: (time.sleep(2.5), "done")[1], "slow-but-alive")
    assert out == "done"
    err = capfd.readouterr().err
    assert "DEGRADED LINK" in err and "slow-but-alive" in err
    # one-shot: a second slow fetch does not re-warn
    out = linkguard.guarded_fetch(
        lambda: (time.sleep(2.5), "again")[1], "slow-but-alive-2")
    assert out == "again"
    assert "DEGRADED LINK" not in capfd.readouterr().err


def test_stalled_fetch_raises_bounded(monkeypatch, capfd):
    monkeypatch.setenv("GARMENTNETS_FETCH_DEADLINE", "2")
    t0 = time.time()
    with pytest.raises(linkguard.LinkStall, match="deadline"):
        linkguard.guarded_fetch(lambda: time.sleep(60), "stalled")
    elapsed = time.time() - t0
    assert elapsed < 10, f"failure not bounded: {elapsed:.1f}s"
    assert "DEGRADED LINK" in capfd.readouterr().err
    # the guard recovers after abandoning the stuck worker
    monkeypatch.setenv("GARMENTNETS_FETCH_DEADLINE", "60")
    assert linkguard.guarded_fetch(lambda: "recovered", "next") == "recovered"


def test_engine_extract_meshes_stall(monkeypatch, capfd):
    """End-to-end: PredictEngine.extract_meshes against an enc whose page
    fetch hangs (monkeypatched __array__ delay) fails loudly and fast."""
    from garmentnets_tpu.harness.predict_engine import PredictEngine

    class HangingPage:
        def __array__(self, dtype=None, copy=None):
            time.sleep(60)
            return np.zeros((1, 17, 17), np.int32)

    eng = PredictEngine.__new__(PredictEngine)
    eng.brick_page = 16
    monkeypatch.setenv("GARMENTNETS_FETCH_DEADLINE", "2")
    t0 = time.time()
    with pytest.raises(linkguard.LinkStall, match="brick page 0"):
        eng.extract_meshes({"active_pages": (HangingPage(),)})
    assert time.time() - t0 < 10
    assert "DEGRADED LINK" in capfd.readouterr().err
