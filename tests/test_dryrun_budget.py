"""The dryrun production phase's wall-budget wrapper (VERDICT r4 #1):
over-budget degrades to a printed skip line instead of an rc=124 null
artifact; failures propagate; success is silent."""
import subprocess
import time

import pytest

import __graft_entry__ as graft


def test_skip_when_budget_exhausted(monkeypatch, capsys):
    monkeypatch.setenv("GARMENTNETS_DRYRUN_BUDGET", "100")
    monkeypatch.setenv("_GARMENTNETS_DRYRUN_T0", repr(time.time() - 99))
    called = []
    monkeypatch.setattr(subprocess, "Popen",
                        lambda *a, **k: called.append(a))
    graft._run_production_budgeted(2)
    assert not called, "must not spawn a subprocess with <120s left"
    out = capsys.readouterr().out
    assert "SKIPPED" in out and "toy phase OK" in out


class _FakeProc:
    def __init__(self, rc, after=0.0):
        self._rc, self._t0, self._after = rc, time.time(), after

    def poll(self):
        return self._rc if time.time() - self._t0 >= self._after else None

    def kill(self):
        self._rc = -9

    def wait(self):
        return self._rc


def test_success_path(monkeypatch, capsys):
    monkeypatch.setenv("GARMENTNETS_DRYRUN_BUDGET", "10000")
    monkeypatch.setenv("_GARMENTNETS_DRYRUN_T0", repr(time.time()))
    monkeypatch.setattr(subprocess, "Popen",
                        lambda *a, **k: _FakeProc(rc=0))
    graft._run_production_budgeted(2)
    assert "SKIPPED" not in capsys.readouterr().out


def test_failure_propagates(monkeypatch):
    monkeypatch.setenv("GARMENTNETS_DRYRUN_BUDGET", "10000")
    monkeypatch.setenv("_GARMENTNETS_DRYRUN_T0", repr(time.time()))
    monkeypatch.setattr(subprocess, "Popen",
                        lambda *a, **k: _FakeProc(rc=3))
    with pytest.raises(RuntimeError, match="rc=3"):
        graft._run_production_budgeted(2)


def test_over_budget_kills_and_skips(monkeypatch, capsys):
    # enough budget to pass the 120s pre-check, but the (monkeypatched)
    # clock jumps past the deadline on the first poll loop iteration
    t0 = time.time()
    monkeypatch.setenv("GARMENTNETS_DRYRUN_BUDGET", "200")
    monkeypatch.setenv("_GARMENTNETS_DRYRUN_T0", repr(t0))
    proc = _FakeProc(rc=0, after=1e9)     # never finishes on its own
    monkeypatch.setattr(subprocess, "Popen", lambda *a, **k: proc)
    real_time = time.time
    clock = {"jumped": False}

    def fake_time():
        # first call(s) inside the wait loop return now; after the loop
        # starts polling, jump past the deadline
        if clock["jumped"]:
            return t0 + 10_000
        return real_time()

    # _run_production_budgeted imports the time MODULE locally, so patching
    # time.time on the module reaches it
    monkeypatch.setattr(time, "time", fake_time)

    # let the pre-check pass with the real clock, then jump the clock
    import threading
    threading.Timer(0.5, lambda: clock.__setitem__("jumped", True)).start()
    graft._run_production_budgeted(2)
    assert proc._rc == -9, "stuck production subprocess must be killed"
    out = capsys.readouterr().out
    assert "SKIPPED" in out and "exceeded" in out
