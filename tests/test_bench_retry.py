"""Wedge-proofing tests for bench.py's retry harness (VERDICT r3 item 1).

The axon TPU tunnel can wedge mid-run with the process blocked inside the
runtime; round 3's driver bench died that way (BENCH_r03.json rc 17, value
0.0). bench.py now runs the measured section in a killable subprocess and
retries once through a wedge. These tests force the wedge with a stub child
command — no TPU involved.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _stub_child(tmp_path, wedge_first_n: int, result: dict):
    """A child command that sleeps forever on its first `wedge_first_n`
    invocations (tracked via sentinel files) and then prints `result`."""
    sentinel = tmp_path / "attempts"
    code = (
        "import json, os, sys, time\n"
        f"d = {str(repr(str(sentinel)))}\n"
        "os.makedirs(d, exist_ok=True)\n"
        "n = len(os.listdir(d))\n"
        "open(os.path.join(d, str(n)), 'w').close()\n"
        f"if n < {wedge_first_n}:\n"
        "    time.sleep(3600)\n"
        f"print(json.dumps({result!r}))\n"
    )
    return [sys.executable, "-c", code]


RESULT = {"metric": "m", "value": 123.0, "unit": "u", "vs_baseline": 1.0}


def test_retry_recovers_from_one_wedge(tmp_path):
    progress = tmp_path / "progress"
    progress.write_text(json.dumps({"compile_done": True}) + "\n")
    cmd = _stub_child(tmp_path, wedge_first_n=1, result=RESULT)
    out = bench.run_with_retry(cmd, timeout_s=5, retries=1,
                               progress_path=str(progress))
    assert out == RESULT


def test_all_attempts_wedged_reports_progress(tmp_path):
    progress = tmp_path / "progress"
    progress.write_text(
        json.dumps({"backend_up": True}) + "\n"
        + json.dumps({"compile_done": True, "compile_s": 41.0}) + "\n"
    )
    cmd = _stub_child(tmp_path, wedge_first_n=10, result=RESULT)
    out = bench.run_with_retry(cmd, timeout_s=2, retries=1,
                               progress_path=str(progress))
    assert out["_failed"]
    # the breadcrumbs make the wedge diagnosable: we know compile finished
    assert out["progress"]["compile_done"] is True
    assert out["progress"]["compile_s"] == 41.0
    assert "no result within" in out["progress"]["last_error"]


def test_probe_gates_retry(tmp_path):
    """A dead backend probe must stop the retry loop instead of burning the
    timeout budget on a doomed attempt."""
    calls = []

    def dead_probe():
        calls.append(1)
        return False

    cmd = _stub_child(tmp_path, wedge_first_n=10, result=RESULT)
    out = bench.run_with_retry(cmd, timeout_s=2, retries=3,
                               progress_path=str(tmp_path / "none"),
                               probe=dead_probe)
    assert out["_failed"]
    assert len(calls) == 1  # stopped at the first failed probe
    assert "never recovered" in out["progress"]["last_error"]


def test_child_failure_rc_is_retried_then_reported(tmp_path):
    cmd = [sys.executable, "-c", "import sys; sys.exit(3)"]
    out = bench.run_with_retry(cmd, timeout_s=5, retries=1,
                               progress_path=str(tmp_path / "none"))
    assert out["_failed"]
    assert "rc=3" in out["progress"]["last_error"]


def _varying_child(tmp_path, values):
    """A child that prints a result whose value depends on the invocation
    count (sentinel files), emulating run-to-run tunnel variance."""
    sentinel = tmp_path / "mruns"
    code = (
        "import json, os, sys\n"
        f"d = {str(repr(str(sentinel)))}\n"
        "os.makedirs(d, exist_ok=True)\n"
        "n = len(os.listdir(d))\n"
        "open(os.path.join(d, str(n)), 'w').close()\n"
        f"vals = {values!r}\n"
        "if vals[n] is None:\n"
        "    sys.exit(3)\n"
        "print(json.dumps({'metric': 'm', 'value': vals[n], 'unit': 'u',\n"
        "                  'vs_baseline': 1.0, 'step_ms': 1000.0/vals[n]}))\n"
    )
    return [sys.executable, "-c", code]


def test_median_of_runs_reports_spread(tmp_path):
    """VERDICT r4 item 4: the headline is the median of N subprocess runs and
    the JSON carries a spread field, so a single ±3% tunnel sample can't pass
    as the round's number."""
    cmd = _varying_child(tmp_path, [1900.0, 2000.0, 1950.0])
    out, _ = bench.run_median_of(cmd, timeout_s=10, retries=0, n_runs=3,
                                 progress_path=str(tmp_path / "none"))
    assert out["value"] == 1950.0  # the median run's record
    sp = out["spread"]
    assert sp["runs"] == 3 and sp["requested_runs"] == 3
    assert sorted(sp["fps"]) == [1900.0, 1950.0, 2000.0]
    assert sp["min"] == 1900.0 and sp["max"] == 2000.0
    assert sp["rel_spread"] == pytest.approx(100.0 / 2000.0, abs=1e-4)


def test_median_tolerates_one_failed_run(tmp_path):
    cmd = _varying_child(tmp_path, [1900.0, None, 1950.0])
    out, last_failed = bench.run_median_of(
        cmd, timeout_s=10, retries=0, n_runs=3,
        progress_path=str(tmp_path / "none"))
    assert out["spread"]["runs"] == 2
    assert out["spread"]["requested_runs"] == 3
    assert out["value"] in (1900.0, 1950.0)
    assert last_failed["_failed"]


def test_median_all_failed_returns_none(tmp_path):
    cmd = [sys.executable, "-c", "import sys; sys.exit(3)"]
    out, last_failed = bench.run_median_of(
        cmd, timeout_s=10, retries=0, n_runs=2,
        progress_path=str(tmp_path / "none"))
    assert out is None
    assert "rc=3" in last_failed["progress"]["last_error"]


def test_inner_smoke_cpu():
    """End-to-end: the BENCH_INNER child runs a tiny config on the CPU backend
    and prints a JSON line carrying the round-4 step_ms/mxu_util/config fields
    (VERDICT r3 item 5). Uses ResNet18 at 32px so it stays cheap."""
    env = dict(
        os.environ,
        BENCH_INNER="1",
        BENCH_PLATFORM="cpu",
        BENCH_BATCH="8",
        BENCH_STEPS="2",
        BENCH_BACKBONE="ResNet18",
        BENCH_IMAGE="32",
        BENCH_QUEUE="256",
    )
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    line = [l for l in res.stdout.strip().splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["value"] > 0
    assert out["step_ms"] > 0
    assert 0 <= out["mxu_util"] <= 1
    assert out["config"]["backbone"] == "ResNet18"
    assert out["config"]["dtype"] == "bfloat16"
