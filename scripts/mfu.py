"""MFU accounting for the headline roundtrip benchmark (VERDICT r1 #2).

Reconciles three independent measurements of the encode+decode roundtrip:

1. **Analytic matmul FLOPs** per patch, enumerated from the model dims
   (every GRU, projection cache, and head matmul in the 40-propagate cadence);
2. **XLA's own cost analysis** of the compiled program
   (``compiled.cost_analysis()['flops']``) — catches anything the analytic
   count misses or that XLA eliminates;
3. **Measured time** via a multi-K least-squares fit: T(K) for the K-chained
   roundtrip at several K, slope = per-roundtrip time.  The fit's R² validates
   the linearity assumption behind bench.py's two-K differencing.

Also runs a pure-matmul calibration with the same chained methodology: a
(B, H) @ (H, 3H) chain whose achievable TFLOP/s bounds what the chip can do —
if the roundtrip's implied TFLOP/s exceeded the calibration, the estimator
(not the chip) would be broken.

Usage: python scripts/mfu.py [--batch 1024] [--dtype bfloat16] [--ks 1 2 4 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dxvae_tpu.utils.calibration import (  # single source shared with bench.py
    V5E_BF16_PEAK,
    V5E_F32_PEAK,
    analytic_roundtrip_macs,
    matmul_calibration,
)


def fit_slope(ks, ts):
    """Least-squares slope + R^2 of T(K)."""
    ks = np.asarray(ks, np.float64)
    ts = np.asarray(ts, np.float64)
    A = np.stack([ks, np.ones_like(ks)], axis=1)
    (slope, icept), res, *_ = np.linalg.lstsq(A, ts, rcond=None)
    pred = A @ np.array([slope, icept])
    ss_res = float(((ts - pred) ** 2).sum())
    ss_tot = float(((ts - ts.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 1.0
    return float(slope), float(icept), r2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 2, 4, 6, 8, 10])
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--scan", action="store_true")
    ap.add_argument("--raw-dir", default=None, help="bank directory (default: $DXVAE_RAW_DIR or the reference mount)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dxvae_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()
    from dxvae_tpu.data.dataset import DXDataset, default_raw_dir
    from dxvae_tpu.models import DXVAEConfig, decode, encode, init_params
    from dxvae_tpu.models.dxvae import _compute_params

    cfg = DXVAEConfig(unroll=not args.scan, compute_dtype=args.dtype)
    params = init_params(jax.random.PRNGKey(0), cfg)
    # pre-cast with the model's own cast policy (same as bench.py) so the
    # measured program matches the headline benchmark exactly
    params = _compute_params(params, cfg)

    ds = DXDataset(args.raw_dir or default_raw_dir(),
                   save_dir="/tmp/dxvae_bench_cache", include="synprez")
    b = ds.batch
    n = args.batch
    reps = int(np.ceil(n / len(b.X)))
    X = jnp.asarray(np.tile(b.X, (reps, 1, 1))[:n])
    adj = jnp.asarray(np.tile(b.adj, (reps, 1, 1))[:n].astype(np.float32))

    # ---- 1. analytic FLOPs
    macs = analytic_roundtrip_macs(cfg)
    per_patch_flops = 2.0 * macs["TOTAL"]
    print(f"analytic matmul MACs/patch by category:")
    for k, v in macs.items():
        print(f"  {k:36s} {v/1e6:8.2f} M")
    print(f"analytic: {per_patch_flops/1e6:.1f} MFLOPs/patch, "
          f"{per_patch_flops*n/1e9:.1f} GFLOP per batch-{n} roundtrip")

    # ---- 2. XLA cost analysis of ONE roundtrip
    def roundtrip(params, X, adj):
        mu, _, _ = encode(params, X, adj, cfg)
        return decode(params, mu, cfg)

    compiled = jax.jit(roundtrip).lower(params, X, adj).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    xla_flops = float(ca.get("flops", float("nan")))
    print(f"XLA cost_analysis: {xla_flops/1e9:.1f} GFLOP per roundtrip "
          f"({xla_flops/n/1e6:.1f} MFLOPs/patch; ratio vs analytic "
          f"{xla_flops/(per_patch_flops*n):.3f})")

    # ---- 3. multi-K timing fit (same chained program as bench.py)
    @jax.jit
    def run(params, X, adj, k):
        def body(_, carry):
            x, a, acc = carry
            mu, _, _ = encode(params, x, a, cfg)
            xn, pn, an = decode(params, mu, cfg)
            return (xn, an, acc + pn.sum())

        _, _, acc = jax.lax.fori_loop(0, k, body, (X, adj, jnp.zeros((), X.dtype)))
        return acc

    float(run(params, X, adj, 1))  # compile
    times = []
    for k in args.ks:
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(run(params, X, adj, k))
            ts.append(time.perf_counter() - t0)
        times.append(min(ts))
    slope, icept, r2 = fit_slope(args.ks, times)
    print(f"T(K) fit over K={args.ks}: slope {slope*1e3:.3f} ms/roundtrip, "
          f"intercept {icept*1e3:.2f} ms (fixed overhead), R^2 {r2:.5f}")
    print(f"  raw: {[f'{t*1e3:.1f}' for t in times]} ms")

    peak = V5E_BF16_PEAK if args.dtype == "bfloat16" else V5E_F32_PEAK
    mfu_analytic = per_patch_flops * n / slope / peak
    mfu_xla = xla_flops / slope / peak
    pps = n / slope

    # ---- 4. pure-matmul calibration: what can this chip + estimator deliver?
    # (shared implementation with bench.py's mfu_vs_session normalization;
    # large Ks so the K-difference dwarfs the tunnel's ~±3 ms readback jitter)
    h = cfg.size_h
    mm_flops = 2.0 * n * h * 3 * h
    calib = matmul_calibration(n, h, args.dtype, repeats=args.repeats)
    for label, mm_tfs in calib.items():
        mm_t = mm_flops / (mm_tfs * 1e12)
        print(f"calibration ({label}): ({n},{h})@({h},{3*h}) {args.dtype}: "
              f"{mm_t*1e6:.2f} us/matmul = {mm_tfs:.1f} TFLOP/s "
              f"({mm_tfs*1e12/peak*100:.0f}% of peak)")

    print(json.dumps({
        "metric": "roundtrip_mfu",
        "batch": n,
        "dtype": args.dtype,
        "per_roundtrip_ms": round(slope * 1e3, 3),
        "patches_per_sec": round(pps, 1),
        "analytic_mflops_per_patch": round(per_patch_flops / 1e6, 2),
        "xla_mflops_per_patch": round(xla_flops / n / 1e6, 2),
        "fit_r2": round(r2, 6),
        "mfu_analytic": round(mfu_analytic, 4),
        "mfu_xla_flops": round(mfu_xla, 4),
        "matmul_calibration_tflops": calib,
        # fraction of the same-session achievable matmul throughput — the
        # session-variance-normalized figure of merit (see bench.py)
        "mfu_vs_session": round(
            per_patch_flops * pps / 1e12 / calib["independent"], 4
        ),
    }))


if __name__ == "__main__":
    main()
