"""bench.py must survive a TPU-less host (round-3 regression).

Round 3 lost its driver-captured performance number because bench.py's CPU
fallback kept ``compute.backend="pallas"`` after switching platforms and
crashed with "Only interpret mode is supported on CPU backend".  This test
runs the real bench script in a subprocess with JAX forced to CPU and asserts
it exits 0 and prints a parseable JSON line with the headline metric.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_cpu_fallback_reports_json():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Drop any inherited virtual-device forcing so the bench sees a plain
    # single-device CPU backend (the conftest sets 8 virtual devices).
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--nodes", "2048", "--degree", "4.0", "--iters", "1",
         "--warmup", "1", "--skip-baseline", "--skip-decode", "--mesh", "0",
         "--skip-eval"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 0, f"stdout={r.stdout[-800:]} stderr={r.stderr[-2000:]}"
    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["metric"] == "symgatedgcn_train_step_edges_per_s"
    assert out["value"] > 0
    assert out["platform"] == "cpu-fallback"
    assert out["backend"] == "xla"


def test_probe_tpu_rejects_cpu_platform(monkeypatch):
    """probe_tpu must not report success just because rc==0 — it must see the
    literal TPU platform string (on a TPU-less host JAX silently initialises
    the CPU backend, the probe process exits 0, and round 3's probe was
    fooled)."""
    sys.path.insert(0, REPO)
    import importlib
    import types
    bench = importlib.import_module("bench")
    monkeypatch.setenv("JAX_PLATFORMS", "")

    def fake_run(platform):
        def run(*a, **k):
            return types.SimpleNamespace(returncode=0,
                                         stdout=f"PLATFORM={platform}\n",
                                         stderr="")
        return run

    monkeypatch.setattr(bench.subprocess, "run", fake_run("cpu"))
    assert bench.probe_tpu(timeout_s=5, attempts=1) is False
    monkeypatch.setattr(bench.subprocess, "run", fake_run("tpu"))
    assert bench.probe_tpu(timeout_s=5, attempts=1) is True

    # a wedged tunnel times out every attempt -> False (with retries)
    calls = {"n": 0}

    def run_timeout(*a, **k):
        calls["n"] += 1
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

    monkeypatch.setattr(bench.subprocess, "run", run_timeout)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.probe_tpu(timeout_s=1, attempts=3) is False
    assert calls["n"] == 3

    # explicit CPU forcing short-circuits without spawning a probe process
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setattr(bench.subprocess, "run", fake_run("tpu"))
    assert bench.probe_tpu(timeout_s=1, attempts=1) is False
