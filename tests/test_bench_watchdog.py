"""The bench backend watchdog, tested without a TPU.

Round-4 postmortem: a wedged axon grant consumed bench's entire 3600 s
budget and left a null artifact (`BENCH_r04.json`). The hardened
watchdog must (a) time out a blocking probe with the wedge explanation,
(b) fail FAST with the probe's own error when backend init dies (the
`UNAVAILABLE: TPU backend setup/compile error` state), (c) pass a
healthy probe through, (d) honor the `BENCH_BUDGET_S` env cap, and
(e) emit the early heartbeat line so a killed run still leaves a
diagnostic tail. Probes are injected; jax is never initialized here.
"""

import json
import threading
import time

import pytest

import bench


def test_watchdog_times_out_blocking_probe():
    """A probe that never returns (simulated wedge) must raise the
    wedge explanation at the deadline, not hang."""
    release = threading.Event()

    def wedged_probe():
        release.wait(30)
        return "never"

    t0 = time.perf_counter()
    with pytest.raises(RuntimeError, match="wedge"):
        bench._init_backend_with_watchdog(
            0.5, probe_fn=wedged_probe, slice_s=0.1
        )
    assert time.perf_counter() - t0 < 5
    release.set()


def test_watchdog_fails_fast_on_probe_error():
    """A probe that DIES (fast infra error) must raise immediately with
    the probe's error — well before the wedge timeout — and must not be
    mislabeled a wedge."""

    def dying_probe():
        raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

    t0 = time.perf_counter()
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench._init_backend_with_watchdog(
            60.0, probe_fn=dying_probe, slice_s=1.0
        )
    # one slice at most, not the 60 s budget
    assert time.perf_counter() - t0 < 10


def test_watchdog_passes_healthy_probe():
    assert (
        bench._init_backend_with_watchdog(
            5.0, probe_fn=lambda: "TPU v5 lite", slice_s=0.1
        )
        == "TPU v5 lite"
    )


def test_budget_env_caps_backend_timeout(monkeypatch):
    monkeypatch.delenv("BENCH_BACKEND_TIMEOUT_S", raising=False)
    monkeypatch.delenv("BENCH_BUDGET_S", raising=False)
    assert bench._backend_timeout_s() == 3600.0
    monkeypatch.setenv("BENCH_BUDGET_S", "600")
    assert bench._backend_timeout_s() == 360.0
    # the cap never goes below one wait slice
    monkeypatch.setenv("BENCH_BUDGET_S", "120")
    assert bench._backend_timeout_s() == 60.0
    # an explicit tighter BENCH_BACKEND_TIMEOUT_S still wins
    monkeypatch.setenv("BENCH_BACKEND_TIMEOUT_S", "30")
    assert bench._backend_timeout_s() == 30.0


def test_entry_claim_delegates_to_bench_watchdog(monkeypatch):
    """__graft_entry__._claim_backend_or_die must delegate to THIS
    watchdog (one implementation, one test surface) and wrap its
    failures with the recovery pointer — a second hand-rolled copy is
    exactly what drifted in round 4."""
    import __graft_entry__ as ge

    seen = {}

    def fake(timeout_s, probe_fn=None, slice_s=60.0):
        seen["timeout_s"] = timeout_s
        return "FakeTPU"

    monkeypatch.setattr(bench, "_init_backend_with_watchdog", fake)
    assert ge._claim_backend_or_die(123.0) == "FakeTPU"
    assert seen["timeout_s"] == 123.0

    def boom(timeout_s, probe_fn=None, slice_s=60.0):
        raise RuntimeError("TPU backend init did not complete within 5s")

    monkeypatch.setattr(bench, "_init_backend_with_watchdog", boom)
    with pytest.raises(RuntimeError, match="tpu_claim_wait"):
        ge._claim_backend_or_die(5.0)


def test_heartbeat_line_is_parseable_and_cites_last_run(capsys):
    bench._print_heartbeat(1234.0)
    line = capsys.readouterr().out.strip()
    hb = json.loads(line)
    assert hb["metric"] == "bench_heartbeat"
    assert hb["backend_timeout_s"] == 1234.0
    assert "wait_policy" in hb
    # the NEWEST preserved builder run ships in docs/ (r4 at minimum;
    # later rounds preserve bench_r5_builder.json etc. and win the sort)
    assert hb["last_preserved_run"]["decode_frames_per_sec"] > 1e7
    src = hb["last_preserved_run"]["source"]
    assert src.startswith("docs/bench_r") and src.endswith("_builder.json")
