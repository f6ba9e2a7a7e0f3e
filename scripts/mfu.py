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

V5E_BF16_PEAK = 197e12  # TPU v5e (lite) peak bf16 FLOP/s
V5E_F32_PEAK = 98.5e12


def analytic_roundtrip_macs(cfg) -> dict:
    """Matmul MACs per patch for one encode+decode roundtrip, by category.

    Enumerates the cadence exactly as implemented (dxvae.py): encode visits 7
    nodes (6 combiner+looper pairs + 1 rooter) and caches projections per
    node; decode runs 1 rooter + 33 combiner+looper propagates (SURVEY.md
    §3.1: node vi refreshed vi+2 times), per-node caches (projection pack +
    edge-head half) computed once per finalized node, 6 node heads, 6
    self-loop heads, 21 cached-split edge heads.
    """
    h, z, x, x0, n = cfg.size_h, cfg.size_z, cfg.size_x, cfg.size_x0, cfg.n_nodes
    gru = (x + h) * 3 * h          # combiner or looper: x@W_ih + h@W_hh
    gru_root = (x0 + h) * 3 * h
    proj_pack = h * 4 * h          # hidden -> [gate_f, gate_b, map_f, map_b]
    eh_half = h * 4 * h            # hidden -> edge-head W1b half (4H wide)
    n_ops = n - 1                  # 6 operator nodes
    n_props_dec = sum(vi + 2 for vi in range(1, n))  # 33
    n_edges = sum(vi for vi in range(1, n))          # 21

    enc = {
        "encode GRUs": n_ops * 2 * gru + gru_root,
        "encode projection caches": n * proj_pack,
        "posterior heads": 2 * h * z,
    }
    dec = {
        "z_to_h": z * h,
        "x0 head": h * 2 * h + 2 * h * 2 * h + 2 * h * (x0 + 32),
        "decode rooter": gru_root,
        "decode GRUs": n_props_dec * 2 * gru,
        "node caches (proj + edge half)": n_ops * (proj_pack + eh_half),
        "x head": n_ops * (h * 2 * h + 2 * h * 2 * h + 2 * h * x),
        "self-loop head": n_ops * (h * 2 * h + 2 * h * 1),
        "edge head (cached split)": n_edges * (h * 4 * h + 4 * h * 2),
    }
    out = {**enc, **dec}
    out["TOTAL"] = sum(out.values())
    return out


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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dxvae_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()
    from dxvae_tpu.data.dataset import DXDataset
    from dxvae_tpu.models import DXVAEConfig, decode, encode, init_params
    from dxvae_tpu.models.dxvae import _compute_params

    cfg = DXVAEConfig(unroll=not args.scan, compute_dtype=args.dtype)
    params = init_params(jax.random.PRNGKey(0), cfg)
    # pre-cast with the model's own cast policy (same as bench.py) so the
    # measured program matches the headline benchmark exactly
    params = _compute_params(params, cfg)

    ds = DXDataset("/root/reference/DX_data", save_dir="/tmp/dxvae_bench_cache",
                   include="synprez")
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
    h = cfg.size_h
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    w = jax.random.normal(jax.random.PRNGKey(1), (h, 3 * h), dt)
    v = jax.random.normal(jax.random.PRNGKey(2), (n, h), dt)

    @jax.jit
    def mm_chain(v, w, k):
        # dependent chain: each matmul consumes the previous result —
        # single-stream latency bound (the model's sequential depth regime)
        def body(_, carry):
            x, acc = carry
            y = x @ w
            xn = y[:, :h] * 1e-3 + x  # keep magnitude bounded, carry dependence
            return (xn, acc + y.sum())

        _, acc = jax.lax.fori_loop(0, k, body, (v, jnp.zeros((), jnp.float32)))
        return acc

    @jax.jit
    def mm_indep(v, w, k):
        # independent matmuls: only the tiny reduction chains — achievable
        # matmul THROUGHPUT upper bound for this shape
        def body(i, acc):
            # cast the feedback term back to v's dtype: a strongly-typed f32
            # acc would otherwise promote the whole matmul to f32 and the
            # bf16 calibration would silently measure f32 matmuls
            y = (v + (acc * 1e-20).astype(v.dtype)) @ w
            return acc + y.sum()

        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    mm_flops = 2.0 * n * h * 3 * h
    calib = {}
    for label, fn in (("dependent-chain", mm_chain), ("independent", mm_indep)):
        float(fn(v, w, 1))
        # large Ks: at ~7-12 us/matmul the K-difference must dwarf the ~±3 ms
        # readback jitter of the tunnel, or the two-K estimate can go negative
        KS = [512, 4096]
        mts = []
        for k in KS:
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                float(fn(v, w, k))
                ts.append(time.perf_counter() - t0)
            mts.append(min(ts))
        mm_t = (mts[1] - mts[0]) / (KS[1] - KS[0])
        mm_tfs = mm_flops / mm_t / 1e12
        calib[label] = round(mm_tfs, 1)
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
    }))


if __name__ == "__main__":
    main()
