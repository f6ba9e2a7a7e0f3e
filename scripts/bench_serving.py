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
    ap.add_argument("--http", action="store_true",
                    help="measure the HTTP frontend instead: per-request "
                         "localhost /v1/roundtrip wall time vs the direct "
                         "ServedDXVAE call — the difference is the "
                         "HTTP+JSON layer cost (host-side, chip-independent)")
    ap.add_argument("--http-concurrency", type=int, default=0, metavar="C",
                    help="with --http: ALSO measure C closed-loop clients "
                         "posting single-patch roundtrips, window off vs "
                         "--batch-window-ms on — the micro-batching A/B "
                         "(serving_http.MicroBatcher)")
    ap.add_argument("--batch-window-ms", type=float, default=5.0,
                    help="micro-batch window for the ON arm of the "
                         "--http-concurrency A/B")
    ap.add_argument("--requests-per-client", type=int, default=25)
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
    ds = DXDataset(args.raw_dir or default_raw_dir(),
                   save_dir="/tmp/dxvae_bench_cache", include="synprez")
    n = args.batch
    b = ds.batch.tile_to(n)
    X = jnp.asarray(b.X, jnp.float32)
    adj = jnp.asarray(b.adj, jnp.float32)

    if args.http:
        # per-request wall timing is valid here (unlike the tunnel caveat):
        # both arms fully materialize the numpy outputs, so the device
        # readback is included identically in each and cancels in the delta
        import http.client
        import threading

        from dxvae_tpu.serving import ServedDXVAE
        from dxvae_tpu.serving_http import make_server

        srv = ServedDXVAE.load(args.bundle)
        Xn = np.asarray(X, np.float32)
        adjn = np.asarray(adj, np.float32)
        srv.encode_decode((Xn, adjn))  # deserialize + warm

        def med(f, r=max(9, args.repeats * 3)):
            ts = []
            for _ in range(r):
                t0 = time.perf_counter()
                f()
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return ts[len(ts) // 2]

        t_direct = med(lambda: srv.encode_decode((Xn, adjn)))
        httpd = make_server(args.bundle)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            host, port = httpd.server_address[:2]
            body = json.dumps({"X": Xn.tolist(), "adj": adjn.tolist()})
            conn = http.client.HTTPConnection(host, port)  # keep-alive client

            def http_req():
                conn.request("POST", "/v1/roundtrip", body,
                             {"Content-Type": "application/json"})
                resp = conn.getresponse()
                payload = json.loads(resp.read())
                if resp.status != 200:  # a timed error response would be
                    # far cheaper than a roundtrip -> bogus overhead numbers
                    raise SystemExit(f"server error {resp.status}: {payload}")

            http_req()  # warm the server's artifact cache
            t_http = med(http_req)

            # binary wire: same endpoint, .npz request AND response —
            # measures what the JSON-lists conversion actually costs
            import io

            nbuf = io.BytesIO()
            np.savez(nbuf, X=Xn, adj=adjn)
            npz_body = nbuf.getvalue()

            def npz_req():
                conn.request("POST", "/v1/roundtrip", npz_body,
                             {"Content-Type": "application/x-npz"})
                resp = conn.getresponse()
                raw = resp.read()
                if resp.status != 200:
                    raise SystemExit(f"server error {resp.status}: "
                                     f"{raw[:200]}")
                with np.load(io.BytesIO(raw)) as f:
                    _ = f["params"]  # materialize like the JSON arm does

            npz_req()
            t_npz = med(npz_req)
        finally:
            httpd.shutdown()
            httpd.server_close()
        print(json.dumps({
            "metric": f"patches_per_sec_http_roundtrip_b{n}",
            "value": round(n / t_http, 1),
            "unit": "patches/sec",
            "direct_per_request_ms": round(t_direct * 1e3, 2),
            "http_per_request_ms": round(t_http * 1e3, 2),
            "http_overhead_ms": round((t_http - t_direct) * 1e3, 2),
            "npz_per_request_ms": round(t_npz * 1e3, 2),
            "npz_overhead_ms": round((t_npz - t_direct) * 1e3, 2),
            "note": "localhost HTTP frontend over the same artifact; "
                    "overheads are host-side (chip-independent); npz = "
                    "binary wire (Content-Type: application/x-npz)",
        }))

        if args.http_concurrency:
            # micro-batching A/B: C closed-loop clients each posting R
            # single-patch roundtrips (the workload the feature targets —
            # every un-merged request pays a full bucket-sized device call)
            from concurrent.futures import ThreadPoolExecutor

            C, R = args.http_concurrency, args.requests_per_client
            body1 = json.dumps({"X": Xn[:1].tolist(),
                                "adj": adjn[:1].tolist()})
            ab = {}
            # third arm: same window but adaptive — must KEEP the merge win
            # under same-endpoint concurrency (its cost saving shows up on
            # lone/mixed traffic, scripts/soak_serving.py)
            for label, window, adaptive in (
                    ("window_off", None, False),
                    ("window_on", args.batch_window_ms, False),
                    ("window_adaptive", args.batch_window_ms, True)):
                httpd2 = make_server(args.bundle, batch_window_ms=window,
                                     adaptive_window=adaptive)
                threading.Thread(target=httpd2.serve_forever,
                                 daemon=True).start()
                try:
                    h2, p2 = httpd2.server_address[:2]

                    def client(_i):
                        conn = http.client.HTTPConnection(h2, p2,
                                                          timeout=600)
                        try:
                            for _ in range(R):
                                conn.request(
                                    "POST", "/v1/roundtrip", body1,
                                    {"Content-Type": "application/json"})
                                resp = conn.getresponse()
                                data = resp.read()
                                if resp.status != 200:
                                    raise SystemExit(
                                        f"server error {resp.status}: "
                                        f"{data[:200]}")
                        finally:
                            conn.close()

                    client(0)  # warm the artifact + connection path
                    mb = (httpd2.batchers or {}).get("roundtrip")
                    # snapshot AFTER warm-up: the serial warm client's R
                    # un-merged requests would otherwise halve the ratio
                    base_calls = mb.n_calls if mb else 0
                    base_reqs = mb.n_requests if mb else 0
                    t0 = time.perf_counter()
                    with ThreadPoolExecutor(max_workers=C) as ex:
                        list(ex.map(client, range(C)))
                    wall = time.perf_counter() - t0
                    row = {"requests_per_sec": round(C * R / wall, 1),
                           "wall_s": round(wall, 3)}
                    if mb:
                        row["artifact_calls_per_request"] = round(
                            (mb.n_calls - base_calls)
                            / (mb.n_requests - base_reqs), 3)
                    ab[label] = row
                finally:
                    httpd2.shutdown()
                    httpd2.server_close()
            print(json.dumps({
                "metric": f"http_microbatch_ab_c{C}",
                "unit": "requests/sec",
                "batch_window_ms": args.batch_window_ms,
                "requests_per_client": R,
                **ab,
                "speedup": round(ab["window_on"]["requests_per_sec"]
                                 / ab["window_off"]["requests_per_sec"], 2),
                "speedup_adaptive": round(
                    ab["window_adaptive"]["requests_per_sec"]
                    / ab["window_off"]["requests_per_sec"], 2),
            }))
        return 0

    # the exact-bucket artifact is only needed on the direct path (the http
    # path serves any batch by padding to a bucket, serving.py:_call)
    with np.load(args.bundle) as f:
        key = f"roundtrip/{args.batch}"
        if key not in f:
            buckets = sorted(int(k.rsplit("/", 1)[1]) for k in f.files
                             if k.startswith("roundtrip/"))
            raise SystemExit(
                f"bundle has no roundtrip artifact at batch {args.batch} "
                f"(buckets: {buckets}); pass --batch matching a bucket or "
                "re-export with --batch-sizes")
        art = jax_export.deserialize(bytes(f[key]))

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
    if per_call <= 0 or estimates[-1] > 2 * max(estimates[0], 1e-9):
        print("# WARNING: two-K estimates noise-dominated; raise --k-hi / "
              "--repeats before quoting this number", file=sys.stderr)
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
