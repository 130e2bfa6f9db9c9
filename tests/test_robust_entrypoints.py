"""Driver entry points must survive a dead/hung TPU backend.

Round-3 postmortem: the ambient TPU tunnel hung, `bench.py` died at its
first `jax.default_backend()` (BENCH_r03 rc=1) and `dryrun_multichip`'s
parent hung probing `jax.device_count()` (MULTICHIP_r03 rc=124).  The
reference's own protocol never loses the measurement — its stdout timing
lines print unconditionally (project.cu:1096-1102).  These tests pin the
bulletproofing: a subprocess-probed backend with timeout + retry, a
CPU-labeled fallback metric, and a dryrun parent that never initializes
any backend.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from nbody_tpu.utils import backend as backend_mod


@pytest.fixture(autouse=True)
def _fresh_probe_cache():
    """Each test sees an unprobed cache."""
    saved = backend_mod._cache
    backend_mod._cache = backend_mod._UNPROBED
    yield
    backend_mod._cache = saved


def test_probe_timeout_returns_none(monkeypatch):
    """A hung probe (TimeoutExpired) must yield None after retries, not
    propagate or hang."""
    calls = []

    def fake_run(*a, **kw):
        calls.append(a)
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=kw["timeout"])

    monkeypatch.setattr(backend_mod.subprocess, "run", fake_run)
    out = _probe_without_inprocess_fastpath(monkeypatch)
    assert out is None
    assert len(calls) == 2  # retried once


def test_probe_failure_rc_returns_none(monkeypatch):
    """A crashing probe (nonzero rc) must yield None."""

    def fake_run(*a, **kw):
        return subprocess.CompletedProcess(a[0], 1, stdout="", stderr="boom")

    monkeypatch.setattr(backend_mod.subprocess, "run", fake_run)
    assert _probe_without_inprocess_fastpath(monkeypatch) is None


def test_probe_success_parses_last_line(monkeypatch):
    """Probe output may carry plugin chatter before the backend name —
    only the last line counts."""

    def fake_run(*a, **kw):
        return subprocess.CompletedProcess(
            a[0], 0, stdout="some warning\ntpu\n", stderr=""
        )

    monkeypatch.setattr(backend_mod.subprocess, "run", fake_run)
    assert _probe_without_inprocess_fastpath(monkeypatch) == "tpu"


def _probe_without_inprocess_fastpath(monkeypatch):
    """Call ambient_backend with the already-initialized-backends fast
    path disabled (the test process HAS initialized the CPU backend via
    conftest, which would short-circuit the subprocess logic under test).
    """
    import jax._src.xla_bridge as xb

    monkeypatch.setattr(xb, "_backends", {}, raising=False)
    return backend_mod.ambient_backend(timeout=1.0, use_cache=False)


def test_inprocess_fastpath_wins():
    """With backends initialized (conftest pins cpu), no subprocess is
    spawned and the in-process answer returns."""
    import jax

    jax.devices()  # ensure initialized
    assert backend_mod.ambient_backend(use_cache=False) == "cpu"


def test_headline_main_emits_fallback_line(monkeypatch, capsys):
    """bench.py's contract: when the measurement dies, main() still
    prints ONE parseable JSON line and returns normally (exit 0) — the
    round-4 done-criterion for BENCH robustness."""
    from nbody_tpu.bench import headline

    def boom(backend):
        raise RuntimeError("simulated backend death")

    monkeypatch.setattr(headline, "_measure", boom)
    monkeypatch.setenv(headline._FORCE_CPU_ENV, "1")  # skip subprocess retry
    headline.main()
    out_lines = [
        ln for ln in capsys.readouterr().out.strip().splitlines() if ln
    ]
    rec = json.loads(out_lines[-1])
    assert rec["backend"] == "numpy-fallback"
    assert rec["value"] > 0
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)


def test_headline_numpy_fallback_is_real():
    """The last-ditch metric is a real measurement, not a fabricated 0."""
    from nbody_tpu.bench import headline

    rec = headline._numpy_fallback()
    assert rec["value"] > 1e6  # any machine does >1M pairs/s in numpy
    assert rec["backend"] == "numpy-fallback"


def test_config3_refresh_is_atomic(monkeypatch, tmp_path):
    """Round-4 weak #6: a crash mid-write must leave the old baseline
    record intact.  Kill json.dump mid-write and check the artifact
    survives byte-for-byte; a successful refresh also drops the prior
    session's note/tree_build_seconds (round-4 advisor finding)."""
    import json as _json

    from nbody_tpu.bench import headline

    path = tmp_path / "results.json"
    old = [
        {
            "config": 3,
            "steps_per_sec": 100.0,
            "tree_build_seconds": 0.002,
            "note": "from a prior session",
        }
    ]
    path.write_text(_json.dumps(old))

    def boom(*a, **kw):
        raise KeyboardInterrupt("simulated crash mid-write")

    real_dump = _json.dump
    monkeypatch.setattr(_json, "dump", boom)
    try:
        headline.refresh_config3_record(str(path), {"config": 3})
    except KeyboardInterrupt:
        pass
    monkeypatch.setattr(_json, "dump", real_dump)
    assert _json.loads(path.read_text()) == old  # artifact untouched

    # a successful refresh merges and drops the stale session keys
    headline.refresh_config3_record(
        str(path), {"config": 3, "steps_per_sec": 170.0, "note": "fresh"}
    )
    rec = _json.loads(path.read_text())[0]
    assert rec["steps_per_sec"] == 170.0
    assert rec["note"] == "fresh"
    assert "tree_build_seconds" not in rec


def test_baseline_main_merges_partial_rerun(monkeypatch, tmp_path):
    """``baseline.main --configs 3`` into an existing results file must
    refresh ONLY config 3: a partial re-run (refreshing the TPU configs
    on a quieter chip window) must not clobber the records it did not
    run, and the write is atomic (tmp + os.replace)."""
    import json as _json

    from nbody_tpu.bench import baseline

    path = tmp_path / "results.json"
    prior = [
        {"config": 1, "pass_1e-3_at_step45_f64": True},
        {"config": 3, "steps_per_sec": 100.0},
        {"config": 4, "backend": "cpu-fake-8-device-mesh"},
    ]
    path.write_text(_json.dumps(prior))
    monkeypatch.setattr(
        baseline, "config3", lambda: {"config": 3, "steps_per_sec": 170.0}
    )
    baseline.main(["--configs", "3", "--out", str(path)])
    report = _json.loads(path.read_text())
    assert [r["config"] for r in report] == [1, 3, 4]
    assert report[1]["steps_per_sec"] == 170.0  # refreshed
    assert report[0] == prior[0] and report[2] == prior[2]  # untouched


def test_dryrun_parent_never_touches_backend(monkeypatch):
    """The dryrun parent must not query any JAX backend (that's what
    hung MULTICHIP_r03): it re-execs a CPU-pinned child.  Simulate a
    hung TPU by making every backend query explode."""
    import jax

    import __graft_entry__ as ge

    def explode(*a, **kw):
        raise AssertionError("parent touched the JAX backend")

    monkeypatch.setattr(jax, "devices", explode)
    monkeypatch.setattr(jax, "device_count", explode)
    monkeypatch.setattr(jax, "default_backend", explode)

    captured = {}

    def fake_run(cmd, **kw):
        captured["cmd"] = cmd
        captured["env"] = kw.get("env", {})
        captured["timeout"] = kw.get("timeout")
        return subprocess.CompletedProcess(cmd, 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.delenv(ge._CHILD_ENV, raising=False)

    ge.dryrun_multichip(8)

    # the child pins the CPU platform before any jax import side effects
    child_code = captured["cmd"][-1]
    assert "jax.config.update('jax_platforms', 'cpu')" in child_code
    assert captured["env"][ge._CHILD_ENV] == "1"
    assert "xla_force_host_platform_device_count" in captured["env"].get(
        "XLA_FLAGS", ""
    )
    assert captured["timeout"] is not None  # bounded, can't hang forever


def test_dryrun_child_sentinel_runs_impl(monkeypatch):
    """With the child sentinel set, dryrun_multichip runs the real impl
    in-process (no recursion into subprocesses)."""
    import __graft_entry__ as ge

    monkeypatch.setenv(ge._CHILD_ENV, "1")
    called = {}
    monkeypatch.setattr(
        ge, "_dryrun_impl", lambda n: called.setdefault("n", n)
    )
    ge.dryrun_multichip(4)
    assert called["n"] == 4


def test_scan_path_reports_overflow(capsys):
    """Fused runs must not silently keep overflowed steps (round-3 weak
    #6): run_scan surfaces per-step counts and warns like the contract
    loop."""
    from nbody_tpu import SimConfig
    from nbody_tpu.models.simulation import Simulation
    from nbody_tpu.rng import random_state

    cfg = SimConfig(
        n_bodies=2048, n_steps=2, engine="barnes_hut", seed=5,
        frontier_cap=32, group_size=256,
    )
    sim = Simulation(cfg, state=random_state(cfg))
    sim.run_scan()
    assert sim.last_scan_overflow is not None
    assert sim.last_scan_overflow.shape == (2,)
    assert sim.last_scan_overflow.sum() > 0
    err = capsys.readouterr().err
    assert "overflowed" in err and "fused runs do NOT retry" in err

    # an overflow-free engine reports all-zero counts and stays silent
    cfg_ok = SimConfig(n_bodies=256, n_steps=2, engine="naive", seed=5)
    sim_ok = Simulation(cfg_ok, state=random_state(cfg_ok))
    sim_ok.run_scan()
    assert sim_ok.last_scan_overflow.sum() == 0
    assert "overflowed" not in capsys.readouterr().err
