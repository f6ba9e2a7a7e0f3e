"""Serving-path throughput: the AOT bundle vs the live-jit headline.

bench.py's headline chains K roundtrips INSIDE one jitted program — the
ceiling.  A serving process instead executes one exported artifact call per
request: per-call dispatch, no cross-request fusion.  This script measures
that path with the same two-K methodology (CLAUDE.md: never wall-time single
calls over the tunnel): K chained `Exported.call`s — each call's decoded
X/adj feed the next call's encode, so no request can be elided, and arrays
stay on device between calls — synced once by a scalar readback, and the
K_hi/K_lo difference cancels the fixed overhead.  The delta to `python
bench.py` (same session!) is the true per-request serving overhead.

Usage: python scripts/bench_serving.py [--batch 1024 --dtype bfloat16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--k-lo", type=int, default=2)
    ap.add_argument("--k-hi", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "bfloat16_mixed"])
    ap.add_argument("--scan", action="store_true",
                    help="export the scan path instead of the unrolled headline")
    ap.add_argument("--bundle", default=None,
                    help="reuse an existing bundle with a roundtrip export at "
                         "--batch (default: export a fresh one to /tmp)")
    ap.add_argument("--raw-dir", default=None,
                    help="bank directory (default: $DXVAE_RAW_DIR or the "
                         "reference mount)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from dxvae_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()

    from dxvae_tpu.api import DXVAE
    from dxvae_tpu.data.dataset import DXDataset, default_raw_dir
    from dxvae_tpu.serving import export_bundle

    platform = jax.devices()[0].platform

    if args.bundle is None:
        model = DXVAE(unroll=not args.scan, compute_dtype=args.dtype)
        args.bundle = f"/tmp/bench_serving_{args.dtype}_{args.batch}.npz"
        export_bundle(model, args.bundle, batch_sizes=(args.batch,),
                      functions=("roundtrip",), platforms=(platform,))
    with np.load(args.bundle) as f:
        art = jax_export.deserialize(bytes(f[f"roundtrip/{args.batch}"]))

    ds = DXDataset(args.raw_dir or default_raw_dir(),
                   save_dir="/tmp/dxvae_bench_cache", include="synprez")
    b = ds.batch
    n = args.batch
    reps = int(np.ceil(n / len(b.X)))
    X = jnp.asarray(np.tile(b.X, (reps, 1, 1))[:n], jnp.float32)
    adj = jnp.asarray(np.tile(b.adj, (reps, 1, 1))[:n], jnp.float32)

    def chain(k):
        Xk, adjk = X, adj
        P = None
        for _ in range(k):
            Xk, P, adjk = art.call(Xk, adjk)
        return float(P.sum())  # one scalar readback syncs the whole chain

    chain(1)  # compile once

    def timed(k):
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            chain(k)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    estimates = []
    for _ in range(5):
        t_lo, t_hi = timed(args.k_lo), timed(args.k_hi)
        estimates.append((t_hi - t_lo) / (args.k_hi - args.k_lo))
    estimates.sort()
    per_call = estimates[len(estimates) // 2]
    print(f"# per-call {per_call*1e3:.3f} ms (estimates: "
          f"{[round(e*1e3, 3) for e in estimates]}) | batch {n} | "
          f"dtype {args.dtype} | platform {platform}", file=sys.stderr)
    print(json.dumps({
        "metric": f"patches_per_sec_served_roundtrip_b{n}",
        "value": round(n / per_call, 1),
        "unit": "patches/sec",
        "note": "AOT bundle, one artifact call per request (per-call "
                "dispatch included); compare to bench.py in the SAME session",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
