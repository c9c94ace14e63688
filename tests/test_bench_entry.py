"""The bench.py entry contract the driver depends on (VERDICT r4 weak #1).

The round-4 scoreboard was lost because a flaky TPU tunnel turned bench.py
into a raw traceback. These tests pin the hardened behavior hermetically
(no chip, no tunnel): the backend wait retries through probe failures and
hangs, gives up within budget, and every failure path still prints exactly
one structured JSON line with ``value: null`` and an ``error`` field.
Reference throughput definition the scoreboard feeds:
/root/reference/language_modelling/run_generation.py:503.
"""
import argparse
import importlib.util
import io
import json
import os
import subprocess
import sys
from contextlib import redirect_stdout

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _args(**kw):
    ns = argparse.Namespace(data=False, generate=False, pipeline=False,
                            eval=False, t5=False, kernel=False)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_emit_error_is_one_structured_json_line(bench):
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench._emit_error(_args(), "tunnel down")
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["value"] is None
    assert rec["metric"] == "train_sections_per_sec_per_chip"
    assert "tunnel down" in rec["error"]


def test_emit_error_metric_tracks_mode(bench):
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench._emit_error(_args(t5=True), "x")
    assert (json.loads(buf.getvalue())["metric"]
            == "t5_train_sections_per_sec_per_chip")


class _Result:
    def __init__(self, rc, err=""):
        self.returncode = rc
        self.stderr = err
        self.stdout = ""


def test_await_backend_retries_through_failures(bench, monkeypatch):
    calls = []

    def fake_run(cmd, timeout, capture_output, text):
        calls.append(timeout)
        if len(calls) < 3:
            return _Result(1, "RuntimeError: UNAVAILABLE axon")
        return _Result(0)

    monkeypatch.setattr(bench.subprocess, "run", fake_run, raising=False)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    ok, detail = bench._await_backend(10_000)
    assert ok and "attempt 3" in detail
    assert len(calls) == 3


def test_await_backend_survives_probe_hang(bench, monkeypatch):
    """A hung jax.devices() (the observed tunnel failure mode) must count
    as a failed attempt, not propagate TimeoutExpired to the caller."""
    calls = []

    def fake_run(cmd, timeout, capture_output, text):
        calls.append(timeout)
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return _Result(0)

    monkeypatch.setattr(bench.subprocess, "run", fake_run, raising=False)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    ok, detail = bench._await_backend(10_000)
    assert ok and len(calls) == 2


def test_await_backend_gives_up_within_budget(bench, monkeypatch):
    clock = [0.0]
    monkeypatch.setattr(bench.time, "time", lambda: clock[0])

    def fake_sleep(s):
        clock[0] += s

    def fake_run(cmd, timeout, capture_output, text):
        clock[0] += 5.0
        return _Result(1, "RuntimeError: UNAVAILABLE axon tunnel")

    monkeypatch.setattr(bench.subprocess, "run", fake_run, raising=False)
    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    ok, detail = bench._await_backend(180.0)
    assert not ok
    assert "UNAVAILABLE" in detail and "probes" in detail
    assert clock[0] < 400.0  # bounded: never far past the budget


def test_sigterm_mid_wait_still_prints_json():
    """The driver bounds bench.py with `timeout` (SIGTERM). A kill that
    lands during the backend wait must still produce exit 0 + the one
    structured JSON line, not a silent death (the r4 failure mode)."""
    import time as _time

    env = dict(os.environ, MMGL_BENCH_BACKEND_WAIT="100000",
               MMGL_BENCH_PROBE_TIMEOUT="600")
    env.pop("JAX_PLATFORMS", None)
    p = subprocess.Popen(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    # wait for the armed marker so the TERM always lands on the handler,
    # then a beat more so it lands inside the first backend probe — the
    # probe's own `import jax` takes seconds, so we cannot reach a real
    # measurement (and cannot touch a chip) before the kill
    for _ in range(600):
        line = p.stderr.readline()
        if "signal guard armed" in line:
            break
    else:  # pragma: no cover
        p.kill()
        pytest.fail("never saw the armed marker")
    _time.sleep(1.0)
    p.terminate()
    out, err = p.communicate(timeout=60)
    assert p.returncode == 0, (p.returncode, err[-300:])
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1, out
    rec = json.loads(lines[0])
    assert rec["value"] is None and "signal" in rec["error"]


def test_cli_failure_path_prints_json_not_traceback():
    """End to end through __main__: the exact driver contract is exit 0 +
    EXACTLY ONE parseable JSON line on stdout, whatever the backend does.
    With no reachable TPU (probe hang or fast failure) that line must be
    the structured error record; with a live chip the --quick smoke may
    legitimately print a measured record instead — both satisfy the
    scoreboard. The probe timeout is shrunk so the hung-tunnel case costs
    seconds, not the production 150 s."""
    env = dict(os.environ, MMGL_BENCH_BACKEND_WAIT="0",
               MMGL_BENCH_PROBE_TIMEOUT="20")
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "bench.py", "--quick"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-500:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert "metric" in rec and "value" in rec
    if rec["value"] is None:
        assert rec["error"]
