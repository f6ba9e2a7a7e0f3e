"""bench.py supervisor: the round artifact must survive tunnel stalls.

The measurement runs in a child process under a hard deadline (a hung PJRT
readback cannot be interrupted by signals in-process); the parent emits the
best completed result on expiry.  These tests pin the two deterministic
paths: clean passthrough and total-failure exit code.  The partial-emission
path is timing-dependent and exercised manually (a mid-run kill emits the
median of completed estimates with "partial": true).
"""

import json
import subprocess
import sys

BENCH = ["--cpu", "--scan", "--batch", "32", "--k-lo", "1", "--k-hi", "2",
         "--repeats", "1", "--no-calibration", "--raw-dir",
         "/root/reference/DX_data"]


def test_supervised_run_emits_json():
    r = subprocess.run(
        [sys.executable, "bench.py", *BENCH, "--deadline-s", "600"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = next(l for l in r.stdout.splitlines() if l.startswith("{"))
    rec = json.loads(line)
    assert rec["unit"] == "patches/sec" and rec["value"] > 0
    assert rec["metric"] == "patches_per_sec_encode_decode_b32"
    assert "partial" not in rec  # clean run is a pure passthrough


def test_deadline_with_no_measurement_fails_cleanly():
    r = subprocess.run(
        [sys.executable, "bench.py", *BENCH, "--deadline-s", "2",
         "--retries", "0"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert r.returncode == 3
    # a 2 s deadline dies at the device probe (the fast-fail path for a dead
    # tunnel); a deadline long enough for the probe but not the measurement
    # dies with "no completed measurement" — both must exit 3
    assert ("device probe did not complete" in r.stderr
            or "no completed measurement" in r.stderr)
    # ... and emit ONE self-explanatory record (value null + error) so the
    # round artifact explains the outage instead of being empty
    line = next(l for l in r.stdout.splitlines() if l.startswith("{"))
    rec = json.loads(line)
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert rec["metric"] == "patches_per_sec_encode_decode_b32"
    assert "device unreachable" in rec["error"]
