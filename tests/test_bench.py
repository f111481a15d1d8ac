"""bench.py robustness contract: ALWAYS exit 0 with one parseable JSON line.

Round-2 postmortem: the driver's capture ran while the TPU backend was down
and bench.py crashed at its first device op -> BENCH_r02.json rc=1,
parsed=null, a whole round of perf evidence lost.  These tests pin the fix:
a dead backend (simulated) must still produce a valid zero-value record
carrying the failure in extras["errors"].
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _last_json_line(stdout: str):
    for line in reversed(stdout.splitlines()):
        try:
            cand = json.loads(line)
        except ValueError:
            continue
        if isinstance(cand, dict) and "metric" in cand:
            return cand
    return None


def test_bench_dead_backend_emits_parseable_json(tmp_path):
    env = dict(os.environ)
    env["YOLOV4TPU_BENCH_SELFTEST_FAIL"] = "1"
    env["YOLOV4TPU_BENCH_RETRY_DELAYS"] = "0"  # 2 attempts, no sleep
    # Redirect the artifact: a simulated-failure run must never clobber
    # the machine's last REAL BENCH_LAST.json.
    artifact = tmp_path / "BENCH_LAST.json"
    env["YOLOV4TPU_BENCH_LAST_PATH"] = str(artifact)
    proc = subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, env=env, timeout=120, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = _last_json_line(proc.stdout)
    assert rec is not None, proc.stdout[-2000:]
    assert rec["metric"] == "inference_throughput_416_busy"
    assert rec["value"] == 0.0
    assert rec["unit"] == "img/s"
    assert rec["vs_baseline"] == 0.0
    errors = rec["extras"]["errors"]
    assert errors and any("simulated dead backend" in e for e in errors)
    # the parent retried: both the child errors and the parent's record
    assert any(e.startswith("parent:") for e in errors)
    # the file artifact honoured the redirect and matches stdout
    assert json.loads(artifact.read_text()) == rec


def test_bench_child_crash_without_json_still_yields_record(tmp_path):
    """Child killed so hard it prints nothing: parent must still emit."""
    env = dict(os.environ)
    env["YOLOV4TPU_BENCH_RETRY_DELAYS"] = "0"
    env["YOLOV4TPU_BENCH_LAST_PATH"] = str(tmp_path / "BENCH_LAST.json")
    # Unimportable site dir first on path would be too invasive; instead
    # simulate by pointing the child timeout to ~0 so the parent records a
    # timeout and falls back.
    env["YOLOV4TPU_BENCH_CHILD_TIMEOUT"] = "0.01"
    proc = subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, env=env, timeout=120, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = _last_json_line(proc.stdout)
    assert rec is not None, proc.stdout[-2000:]
    assert rec["value"] == 0.0
    assert any("timed out" in e for e in rec["extras"]["errors"])
