"""Driver-contract smoke: bench.py must run end to end and print one valid
JSON line. Runs the real main() at micro shapes on CPU — protects the
round-end benchmark from Python-level breakage (the full-scale numbers are
only meaningful on the real chip)."""
import io
import json
import sys

import pytest

@pytest.mark.slow
def test_bench_main_prints_contract_json(monkeypatch):
    import bench
    from diffreg_tpu.utils.precision import set_precision

    monkeypatch.setenv("DIFFREG_COMPUTE_DTYPE", "float32")
    monkeypatch.setattr(sys, "argv", ["bench.py", "1", "1", "192"])
    buf = io.StringIO()
    stdout = sys.stdout
    try:
        sys.stdout = buf
        bench.main()
    finally:
        sys.stdout = stdout
        set_precision("highest")       # restore the test-suite policy

    line = buf.getvalue().strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "registered_pairs_per_sec"
    assert out["unit"] == "pairs/s"
    assert out["value"] > 0
    assert "vs_baseline" in out
    d = out["detail"]
    assert d["warp_active_pairs_per_sec"] > 0
    assert d["sample_steps"] == 1 and d["batch_size"] == 1
    # MFU keys are always present; values are None off-TPU (no cost model /
    # no peak entry for the host CPU) and numeric on the chip
    assert "mfu_pct" in d and "achieved_tflops" in d


@pytest.mark.slow
def test_bench_main_fused_rotary_ab_env(monkeypatch):
    """The DIFFREG_FUSED_ROTARY A/B path must run end to end (the on-chip
    A/B depends on this env plumbing working)."""
    import bench
    from diffreg_tpu.utils.precision import set_precision

    monkeypatch.setenv("DIFFREG_COMPUTE_DTYPE", "float32")
    monkeypatch.setenv("DIFFREG_FUSED_ROTARY", "1")
    monkeypatch.setattr(sys, "argv", ["bench.py", "1", "1", "192"])
    buf = io.StringIO()
    stdout = sys.stdout
    try:
        sys.stdout = buf
        bench.main()
    finally:
        sys.stdout = stdout
        set_precision("highest")

    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["value"] > 0


def _orchestrate(monkeypatch, capsys, **env):
    import bench

    monkeypatch.setenv("DIFFREG_BENCH_RETRIES", "2")
    monkeypatch.setenv("DIFFREG_BENCH_BACKOFF", "0")
    monkeypatch.setenv("DIFFREG_BENCH_PROBE_TIMEOUT", "5")
    monkeypatch.setenv("DIFFREG_BENCH_RUN_TIMEOUT", "5")
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    rc = bench.orchestrate([])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(line)


def test_orchestrate_emits_structured_json_when_backend_down(monkeypatch, capsys):
    # a dead tunnel == probe that never returns; simulate with a probe that
    # fails outright and one that hangs past the timeout
    rc, out = _orchestrate(monkeypatch, capsys, DIFFREG_BENCH_PROBE_CMD="false")
    assert rc == 1
    assert out["metric"] == "registered_pairs_per_sec"
    assert out["value"] == 0.0 and out["vs_baseline"] == 0.0
    assert "unavailable" in out["error"]
    assert len(out["detail"]["attempts"]) == 2


def test_orchestrate_survives_hanging_probe(monkeypatch, capsys):
    monkeypatch.setenv("DIFFREG_BENCH_PROBE_TIMEOUT", "1")
    rc, out = _orchestrate(monkeypatch, capsys,
                           DIFFREG_BENCH_PROBE_CMD="sleep 60")
    assert rc == 1
    assert "error" in out
    assert any("timed out" in a for a in out["detail"]["attempts"])


def test_orchestrate_passes_through_bench_json(monkeypatch, capsys):
    fake = json.dumps({"metric": "registered_pairs_per_sec", "value": 12.3,
                       "unit": "pairs/s", "vs_baseline": 1.0})
    rc, out = _orchestrate(
        monkeypatch, capsys,
        DIFFREG_BENCH_PROBE_CMD="true",
        DIFFREG_BENCH_RUN_CMD=f"echo 'some log line'; echo '{fake}'")
    assert rc == 0
    assert out["value"] == 12.3


def test_orchestrate_retries_after_failed_run(monkeypatch, capsys):
    # run cmd rc!=0 on every attempt -> error JSON after the retry budget
    rc, out = _orchestrate(monkeypatch, capsys,
                           DIFFREG_BENCH_PROBE_CMD="true",
                           DIFFREG_BENCH_RUN_CMD="echo oops >&2; exit 3")
    assert rc == 1
    assert len(out["detail"]["attempts"]) == 2
    assert all("rc=3" in a for a in out["detail"]["attempts"])
