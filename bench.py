"""Headline benchmark: encode+decode throughput at batch 1024 (BASELINE.json).

Round trip = encode the 1024-patch dataset -> posterior mean z -> full
autoregressive decode (nodes, self-loops, all edge decisions, quantizers).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 50_000 (the driver-set target for 1x TPU v5e).

Timing methodology: the execution platform (axon tunnel) has a large fixed
host<->device round-trip latency and a block_until_ready that does not
actually block, so per-call wall timing is useless.  Instead the round trip
is chained K times inside ONE jitted call with a data-dependent carry
(decoded X/adj feed the next encode; decoded params fold into a carried
scalar so no path is dead-code-eliminated), synced by fetching the scalar.
Per-iteration time = (T(K_hi) - T(K_lo)) / (K_hi - K_lo), which cancels the
fixed overhead exactly.

Variance normalization (VERDICT r2 #1): the tunneled chip shows ±10-30%
session-to-session swings (docs/PERF.md), so the headline roundtrip also runs
a same-session bare-matmul calibration with the identical methodology and
emits ``calibration_tflops`` + ``mfu_vs_session`` (roundtrip-implied TFLOP/s /
independent-matmul TFLOP/s).  Interpretation: a patches/sec drop at constant
mfu_vs_session is the chip/session, not the code — BENCH_r01 742k vs BENCH_r02
648k was exactly such a swing.  The ratio sits slightly above 1.0 (~1.2):
the model's matmul mix includes 4H-wide shapes that beat the single 3H
calibration shape, so this is a session-normalized throughput ratio, not a
true utilization fraction (docs/PERF.md has the true MFU accounting).

Stall protection: the tunnel can hang a device RPC indefinitely (observed on
this image), so by default the measurement runs in a supervised child process
under ``--deadline-s`` (45 min).  Each attempt first runs a 5-minute device
probe (one tiny matmul in a child) so a dead tunnel is diagnosed in minutes
instead of burning the full deadline.  On deadline expiry the parent kills
the child and emits the best completed result ("partial": true); with no
completed measurement it retries once, then exits 3 after emitting a
value-null record whose "error" field explains the outage.
``--deadline-s 0`` runs unsupervised.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

# --mode -> metric-name suffix; single source for the clean, partial, and
# error records so the artifact naming can never diverge between paths
MODE_SUFFIX = {"roundtrip": "encode_decode", "encode": "encode_only",
               "decode": "decode_only"}


def _probe_device(argv: list[str], timeout_s: float) -> bool:
    """Cheap child-process liveness check: one tiny matmul + scalar readback.

    A downed tunnel hangs the FIRST device call forever, so without this the
    supervisor burns the full --deadline-s per attempt before concluding the
    device is unreachable (observed: multi-hour tunnel outages on this
    image).  ~15 s when healthy; killed at ``timeout_s`` when not."""
    cpu = ["--cpu"] if "--cpu" in argv else []
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--probe-device", *cpu])
    try:
        return child.wait(timeout=timeout_s) == 0
    except subprocess.TimeoutExpired:
        child.kill()
        child.wait()
        return False


def _supervise(argv: list[str], deadline_s: float, retries: int,
               batch: int = 1024, mode: str = "roundtrip") -> int:
    """Run the measurement in a child process with a hard deadline.

    The execution tunnel can stall a device RPC indefinitely (observed on
    this image: a hung call never returns and SIGALRM cannot interrupt a
    blocked PJRT readback), which would leave the driver with NO benchmark
    artifact at all.  The child streams each completed two-K estimate (and
    the pre-calibration record) as JSON lines to a progress file; on
    deadline the parent kills the child and emits the best measurement
    completed so far, marked ``"partial": true``.  A clean child exit is a
    pure passthrough — the emitted JSON is identical to an unsupervised run.
    """
    for attempt in range(retries + 1):
        probe_s = min(300.0, deadline_s)
        if not _probe_device(argv, probe_s):
            print(f"# WARNING: device probe did not complete in {probe_s:.0f}s "
                  f"(tunnel down?); attempt {attempt + 1}/{retries + 1}",
                  file=sys.stderr)
            if attempt < retries:  # no point sleeping before the final exit
                time.sleep(min(60.0, deadline_s))
            continue
        with tempfile.NamedTemporaryFile("r", suffix=".jsonl", delete=False) as pf:
            progress_path = pf.name
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), *argv,
             "--progress-file", progress_path],
        )
        crashed = False
        try:
            child.wait(timeout=deadline_s)
            if child.returncode == 0:
                return 0  # clean exit: the child printed the JSON itself
            # a crashing child (tunnel RPC error, post-measurement
            # calibration failure, ...) must get the SAME salvage/retry
            # treatment as a deadline kill — otherwise bench exits with no
            # artifact even when a completed record sits in the progress file
            crashed = True
            print(f"# WARNING: measurement child exited {child.returncode}; "
                  "salvaging completed records", file=sys.stderr)
        except subprocess.TimeoutExpired:
            child.kill()
            child.wait()
        finally:
            try:
                lines = [json.loads(l) for l in open(progress_path) if l.strip()]
            except (OSError, ValueError):
                lines = []
            os.unlink(progress_path)
        why = "child crashed" if crashed else f"deadline {deadline_s:.0f}s hit"
        record = next((l for l in reversed(lines) if l.get("type") == "record"), None)
        estimates = sorted(l["per_iter_s"] for l in lines
                           if l.get("type") == "estimate" and l["per_iter_s"] > 0)
        if record is not None:
            record.pop("type")
            record["partial"] = True  # interrupted during/after calibration
            print(json.dumps(record))
            print(f"# WARNING: {why} after the measurement completed "
                  "(calibration lost); emitting the measured record",
                  file=sys.stderr)
            return 0
        if len(estimates) >= 2:
            # enough completed two-K estimates for a median-of-what-finished
            per_iter = estimates[len(estimates) // 2]
            n = next((l["batch"] for l in lines if "batch" in l), None)
            mode = next((l["mode"] for l in lines if "mode" in l), "roundtrip")
            suffix = MODE_SUFFIX[mode]
            print(json.dumps({
                "metric": f"patches_per_sec_{suffix}_b{n}",
                "value": round(n / per_iter, 1),
                "unit": "patches/sec",
                "vs_baseline": round(n / per_iter / 50_000.0, 4)
                if (mode, n) == ("roundtrip", 1024) else None,
                "partial": True,
                "estimates_completed": len(estimates),
            }))
            print(f"# WARNING: {why}; emitting the median of "
                  f"{len(estimates)} completed estimates", file=sys.stderr)
            return 0
        print(f"# WARNING: {why} with no completed measurement "
              f"(tunnel stall?); attempt {attempt + 1}/{retries + 1}",
              file=sys.stderr)
    # no measurement possible: still emit ONE self-explanatory JSON line so
    # the recorded artifact says WHY there is no number (a dead tunnel is an
    # environment outage, not a code regression) instead of being empty
    suffix = MODE_SUFFIX[mode]
    print(json.dumps({
        "metric": f"patches_per_sec_{suffix}_b{batch}",
        "value": None,
        "unit": "patches/sec",
        "vs_baseline": None,
        "error": f"device unreachable: probe/measurement incomplete after "
                 f"{retries + 1} attempts (deadline {deadline_s:.0f}s each); "
                 "see the previous BENCH_r*.json for the last measured value",
    }))
    return 3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--k-lo", type=int, default=2)
    ap.add_argument("--k-hi", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=4)  # per-K timing repeats
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "bfloat16_mixed"],
                    help="compute dtype; default bfloat16 mixed precision (quantizer "
                         "grids, thresholds, and the posterior stay float32 — decode "
                         "decisions match f32 on 99.7%% of params). --dtype float32 "
                         "for reference-parity numerics; bfloat16_mixed keeps f32 "
                         "activation islands (training-quality mode)")
    ap.add_argument("--scan", action="store_true", help="use the scan execution path")
    ap.add_argument("--quantize-decode", default=None, choices=["int8"],
                    help="int8-quantize every decode-side matmul "
                         "(DXVAEConfig.quantize_decode) — the serving "
                         "quantization A/B arm (docs/PERF.md)")
    ap.add_argument("--mode", default="roundtrip",
                    choices=["roundtrip", "encode", "decode"],
                    help="roundtrip (headline) or the encode-only / decode-only "
                         "split (serving: latent indexing vs generation)")
    ap.add_argument("--no-calibration", action="store_true",
                    help="skip the same-session matmul calibration (quick runs)")
    ap.add_argument("--raw-dir", default=None,
                    help="bank directory (default: $DXVAE_RAW_DIR or the "
                         "reference mount)")
    ap.add_argument("--deadline-s", type=float, default=2700.0,
                    help="hard wall-clock limit; on expiry the supervisor "
                         "kills the measurement and emits the best completed "
                         "result, marked partial (0 disables supervision)")
    ap.add_argument("--retries", type=int, default=1,
                    help="restarts after a deadline expiry that produced no "
                         "measurement at all (transient tunnel stalls)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (dev/test; the env-pinned "
                         "platform cannot be overridden by env vars)")
    ap.add_argument("--progress-file", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--probe-device", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.probe_device:
        import jax

        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        x = jnp.ones((128, 128))
        print("# probe ok", float((x @ x).sum()), file=sys.stderr)
        return 0

    if args.deadline_s > 0 and args.progress_file is None:
        argv = [a for a in sys.argv[1:]]
        return _supervise(argv + ["--deadline-s", "0"], args.deadline_s,
                          max(0, args.retries), batch=args.batch, mode=args.mode)

    def progress(obj) -> None:
        if args.progress_file:
            with open(args.progress_file, "a") as f:
                f.write(json.dumps(obj) + "\n")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dxvae_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()

    from dxvae_tpu.data.dataset import DXDataset, default_raw_dir
    from dxvae_tpu.models import DXVAEConfig, decode, encode, init_params
    from dxvae_tpu.models.dxvae import _compute_params

    cfg = DXVAEConfig(unroll=not args.scan, compute_dtype=args.dtype,
                      quantize_decode=args.quantize_decode)
    params = init_params(jax.random.PRNGKey(0), cfg)
    # pre-cast once with the model's own cast policy (no-op in f32): the
    # in-jit master->compute cast is NOT loop-invariant-hoisted out of the
    # chained fori, costing ~0.3 ms per iteration
    params = _compute_params(params, cfg)
    if args.quantize_decode == "int8":
        # pre-quantize for the same reason (idempotent: decode re-runs the
        # transform as a no-op) — AOT serving const-folds this too, so the
        # in-loop A/B must not pay per-iteration re-quantization
        from dxvae_tpu.models.dxvae import _quantize_decode_params

        params = _quantize_decode_params(params)

    ds = DXDataset(args.raw_dir or default_raw_dir(),
                   save_dir="/tmp/dxvae_bench_cache", include="synprez")
    n = args.batch
    b = ds.batch.tile_to(n)  # cycle the 1024-patch corpus to the batch size
    X, adj = jnp.asarray(b.X), jnp.asarray(b.adj)

    # traced trip count: ONE compiled program serves every K, so the two-K
    # difference cancels fixed overheads exactly; every mode carries a data
    # dependence so no iteration can be dead-code-eliminated
    if args.mode == "roundtrip":

        @jax.jit
        def run(params, X, adj, k):
            def body(_, carry):
                x, a, acc = carry
                mu, _, _ = encode(params, x, a, cfg)
                xn, pn, an = decode(params, mu, cfg)
                return (xn, an, acc + pn.sum())

            _, _, acc = jax.lax.fori_loop(0, k, body, (X, adj, jnp.zeros((), X.dtype)))
            return acc

    elif args.mode == "encode":

        @jax.jit
        def run(params, X, adj, k):
            def body(_, carry):
                x, acc = carry
                mu, std, _ = encode(params, x, adj, cfg)
                xn = x + 1e-30 * mu.sum()  # data dependence only; value unchanged
                return (xn, acc + std.sum())

            _, acc = jax.lax.fori_loop(0, k, body, (X, jnp.zeros((), X.dtype)))
            return acc

    else:  # decode

        @jax.jit
        def run(params, X, adj, k):
            mu, _, _ = encode(params, X, adj, cfg)  # realistic latents, once

            def body(_, carry):
                z, acc = carry
                _, pn, _ = decode(params, z, cfg)
                zn = z + 1e-30 * pn.sum()
                return (zn, acc + pn.sum())

            _, acc = jax.lax.fori_loop(0, k, body, (mu, jnp.zeros((), X.dtype)))
            return acc

    def timed(k):
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(run(params, X, adj, k))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    float(run(params, X, adj, 1))  # compile once
    progress({"type": "compiled", "batch": n})
    estimates = []
    for _ in range(5):
        t_lo, t_hi = timed(args.k_lo), timed(args.k_hi)
        estimates.append((t_hi - t_lo) / (args.k_hi - args.k_lo))
        progress({"type": "estimate", "batch": n,
                  "per_iter_s": estimates[-1], "mode": args.mode})
    estimates.sort()
    per_iter = estimates[len(estimates) // 2]  # median of five two-K estimates
    if estimates[0] <= 0 or estimates[-1] > 2 * max(estimates[0], 1e-9):
        print(
            "# WARNING: two-K estimates are noise-dominated (spread "
            f"{[round(e*1e3, 3) for e in estimates]} ms) — the K-difference is "
            "too small vs the tunnel's readback jitter at this batch/K; use "
            "the default --batch 1024 --k-lo 2 --k-hi 10 for quotable numbers",
            file=sys.stderr,
        )
    if per_iter <= 0:
        # a negative/zero median would emit a garbage (negative) artifact or
        # divide by zero; exit nonzero so the supervisor retries/salvages
        print("# ERROR: non-positive median per-iteration time; no record",
              file=sys.stderr)
        return 4
    pps = n / per_iter

    # b1024 roundtrip = driver contract
    metric = f"patches_per_sec_{MODE_SUFFIX[args.mode]}_b{n}"
    # vs_baseline only exists for the headline roundtrip at batch 1024 (the
    # 50k target is defined for that workload); split modes / other batches
    # report null rather than a meaningless ratio
    vs_baseline = (
        round(pps / 50_000.0, 4) if args.mode == "roundtrip" and n == 1024 else None
    )
    record = {
        "metric": metric,
        "value": round(pps, 1),
        "unit": "patches/sec",
        "vs_baseline": vs_baseline,
    }
    progress({"type": "record", **record})  # measurement survives a
    # calibration-phase stall: the supervisor emits this on deadline

    if args.mode == "roundtrip" and not args.no_calibration:
        # same-session variance normalization: bare-matmul achievable TFLOP/s
        # measured with the identical chained methodology; a patches/sec move
        # at constant mfu_vs_session is chip-session variance, not code
        from dxvae_tpu.utils.calibration import (
            analytic_roundtrip_flops,
            matmul_calibration,
        )

        calib = matmul_calibration(n, cfg.size_h, args.dtype,
                                   repeats=args.repeats)
        model_tflops = analytic_roundtrip_flops(cfg) * pps / 1e12
        record["model_tflops"] = round(model_tflops, 2)
        record["calibration_tflops"] = calib
        record["mfu_vs_session"] = round(model_tflops / calib["independent"], 4)

    print(json.dumps(record))
    print(
        f"# per-roundtrip {per_iter*1e3:.3f} ms (estimates: "
        f"{[round(e*1e3, 3) for e in estimates]}) | batch {n} | dtype {args.dtype} | "
        f"devices {jax.devices()}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
