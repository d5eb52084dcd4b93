"""Unit tests for bench.py's driver-facing harness logic.

The bench itself needs the real TPU chip, but the outage-recovery wait loop
(`wait_for_backend`) is pure control flow around a subprocess probe and must
behave deterministically: return immediately when the backend is up, retry
while it is down, and give up at the deadline so the driver sees the real
in-process error rather than a silent hang.  (The live-outage behavior was
also validated against a real tunnel outage — docs/PERF.md.)
"""

from __future__ import annotations

import subprocess
import sys
import types

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


class _FakeCompleted:
    def __init__(self, returncode, stderr=""):
        self.returncode = returncode
        self.stderr = stderr


def test_wait_returns_immediately_when_backend_up(monkeypatch):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return _FakeCompleted(0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: pytest.fail("slept"))
    bench.wait_for_backend()
    assert len(calls) == 1


def test_wait_retries_then_recovers(monkeypatch):
    state = {"n": 0}

    def fake_run(cmd, **kw):
        state["n"] += 1
        if state["n"] < 3:
            return _FakeCompleted(1, stderr="UNAVAILABLE: TPU backend setup/compile error")
        return _FakeCompleted(0)

    slept = []
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    monkeypatch.setenv("BENCH_BACKEND_WAIT_S", "1500")
    bench.wait_for_backend()
    assert state["n"] == 3
    assert slept == [60, 60]


def test_wait_gives_up_at_deadline(monkeypatch):
    """Probes that hang (TimeoutExpired) must not loop past the deadline."""
    state = {"n": 0}

    def fake_run(cmd, **kw):
        state["n"] += 1
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 180))

    # Deadline of 0 ⇒ exactly one probe, then proceed (no sleep).
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: pytest.fail("slept past deadline"))
    monkeypatch.setenv("BENCH_BACKEND_WAIT_S", "0")
    bench.wait_for_backend()
    assert state["n"] == 1
