"""Environment diagnosis (`dxvae_tpu doctor`) — beyond-reference.

The reference assumes a healthy local torch install and fails with a hang or
a bare stack trace otherwise.  On real accelerator deployments the failure
modes are subtler: an unreachable device can hang the FIRST backend call
forever (observed on this image's tunneled TPU), caches go cold, data dirs
move.  ``doctor`` checks each subsystem and prints one PASS/FAIL line per
check, without ever risking a hang: everything that touches the jax backend
runs in a child process killed at ``probe_timeout``.

Exit code 0 = every check passed; 1 = at least one failed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

# the child prints one JSON line; run with -S? no: sitecustomize may be what
# registers the platform plugin — the child must see the SAME environment the
# real workload would
_PROBE_CODE = """\
import json, time
import jax
if {cpu!r}:
    jax.config.update("jax_platforms", "cpu")
t0 = time.time()
import jax.numpy as jnp
x = jnp.ones((128, 128))
s = float((x @ x).sum())  # scalar readback = full round trip
print(json.dumps({{
    "platform": jax.default_backend(),
    "devices": [str(d) for d in jax.devices()],
    "matmul_ok": s == 128.0 * 128 * 128,
    "first_call_s": round(time.time() - t0, 2),
}}))
"""


def probe_device(timeout_s: float = 90.0, cpu: bool = False) -> dict:
    """One tiny matmul + scalar readback in a CHILD process.

    A dead tunnel hangs the first device call indefinitely and SIGALRM
    cannot interrupt a blocked PJRT readback, so the probe must be a
    subprocess the parent can kill (same design as bench.py's supervisor).
    Returns the child's report, or ``{"ok": False, "error": ...}``.
    """
    child = subprocess.Popen(
        [sys.executable, "-c", _PROBE_CODE.format(cpu=cpu)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        out, err = child.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        child.kill()
        child.wait()
        return {"ok": False,
                "error": f"device unreachable: probe did not complete in "
                         f"{timeout_s:.0f}s (tunnel/driver down?)"}
    line = next((l for l in out.splitlines() if l.startswith("{")), None)
    if child.returncode != 0 or line is None:
        return {"ok": False,
                "error": f"probe exited {child.returncode}: {err.strip()[-500:]}"}
    try:
        rep = json.loads(line)
    except ValueError:
        return {"ok": False, "error": f"probe printed malformed report: {line[:200]!r}"}
    rep["ok"] = bool(rep.get("matmul_ok"))
    if not rep["ok"]:
        # reachable but miscomputing — as loud a failure as unreachable
        rep.setdefault("error", f"device answered but the matmul verification "
                                f"failed: {line[:200]}")
    return rep


def run_checks(raw_dir: str | None = None, probe_timeout: float = 90.0,
               cpu: bool = False) -> list[dict]:
    """Run every check; returns [{"check", "ok", "detail"}, ...]."""
    from dxvae_tpu.data.dataset import default_raw_dir

    # the env-aware default the scripts use ($DXVAE_RAW_DIR, then the known
    # mount) — NOT the CLI train commands' reference-parity relative
    # "DX_data", which would make a bare `doctor` cry wolf from any cwd
    raw_dir = raw_dir or default_raw_dir()
    checks: list[dict] = []

    def add(check: str, ok: bool, detail: str) -> None:
        checks.append({"check": check, "ok": bool(ok), "detail": detail})

    # 1. versions — import metadata only; must not init any backend
    import jax

    import dxvae_tpu

    add("versions", True,
        f"dxvae_tpu {dxvae_tpu.__version__}, jax {jax.__version__}, "
        f"python {sys.version.split()[0]}")

    # 2. device: the only check allowed to take real time
    rep = probe_device(probe_timeout, cpu=cpu)
    if rep["ok"]:
        add("device", True,
            f"{rep['platform']}: {len(rep['devices'])} device(s) "
            f"({rep['devices'][0]}), first call {rep['first_call_s']}s")
    else:
        add("device", False, rep["error"])

    # 3. persistent compile cache
    from dxvae_tpu.utils.profiling import CACHE_DIR

    cache = Path(CACHE_DIR)
    if cache.is_dir():
        entries = list(cache.iterdir())
        size = sum(f.stat().st_size for f in entries if f.is_file())
        add("compile_cache", True,
            f"{cache}: {len(entries)} entries, {size / 1e6:.0f} MB "
            "(first compiles of the big unrolled programs take minutes; "
            "cached re-runs take seconds)")
    else:
        add("compile_cache", True,  # absent = cold, not broken
            f"{cache}: empty (created on first use; expect slow first compiles)")

    # 4. training data
    raw = Path(raw_dir)
    banks = sorted(raw.rglob("*.syx")) if raw.is_dir() else []
    add("data", bool(banks),
        f"{raw}: {len(banks)} .syx banks" if banks
        else f"{raw}: missing or holds no .syx banks (pass --raw-dir)")

    # 5. dataset cache location is writable (never the read-only data mount)
    from dxvae_tpu.data.dataset import _default_save_dir

    try:
        cache_dir = Path(_default_save_dir(raw))
        cache_dir.mkdir(parents=True, exist_ok=True)
        t = cache_dir / f".doctor_write_test_{os.getpid()}"
        t.write_bytes(b"ok")
        t.unlink()
        add("dataset_cache", True, f"{cache_dir}: writable")
    except OSError as e:
        add("dataset_cache", False, f"cache dir not writable: {e}")

    # 6. native codec tier.  Only consult available() when the library file
    # already exists: on a missing .so, native._load() would g++-BUILD it
    # (up to ~2 min) — a diagnostic must not compile, mutate the tree, or
    # mask that the deployment lacked the built tier
    from dxvae_tpu.data import native

    lib = native._LIB_PATH
    if not lib.exists():
        add("native_codec", True,  # fallback is bit-exact, so not a failure
            f"{lib} absent — using the bit-exact NumPy codec "
            "(scripts/build_native.sh builds the native tier)")
    else:
        try:
            loadable = native.available()
        except OSError:  # corrupt/foreign-arch .so: CDLL raises out of _load
            loadable = False
        if loadable:
            add("native_codec", True, f"C++ codec loaded ({lib})")
        else:
            add("native_codec", False,
                f"{lib} exists but failed to load — rebuild with "
                "scripts/build_native.sh (NumPy fallback still works)")

    # 7. shipped checkpoints
    ckpt_dir = Path(__file__).resolve().parents[2] / "checkpoints"
    npz = sorted(ckpt_dir.glob("*.npz")) if ckpt_dir.is_dir() else []
    add("checkpoints", True,
        f"{ckpt_dir}: {len(npz)} .npz" if npz
        else f"{ckpt_dir}: none found (train one, or pass --checkpoint paths)")

    return checks


def main_doctor(raw_dir: str | None, probe_timeout: float, cpu: bool,
                as_json: bool) -> int:
    t0 = time.time()
    checks = run_checks(raw_dir, probe_timeout, cpu=cpu)
    if as_json:
        print(json.dumps({"checks": checks,
                          "ok": all(c["ok"] for c in checks),
                          "elapsed_s": round(time.time() - t0, 1)}))
    else:
        for c in checks:
            print(f"[{'PASS' if c['ok'] else 'FAIL'}] {c['check']:>14}  {c['detail']}")
        bad = [c["check"] for c in checks if not c["ok"]]
        print(f"doctor: {'all checks passed' if not bad else 'FAILED: ' + ', '.join(bad)}"
              f" ({time.time() - t0:.1f}s)")
    return 0 if all(c["ok"] for c in checks) else 1
