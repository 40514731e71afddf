"""Driver-contract smoke: bench.py must run end to end and print one valid
JSON line. Runs the real main() at micro shapes on CPU — protects the
round-end benchmark from Python-level breakage (the full-scale numbers are
only meaningful on the real chip)."""
import io
import json
import sys

import pytest

pytestmark = pytest.mark.slow


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
