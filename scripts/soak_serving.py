"""Serving soak test: sustained mixed-endpoint load with latency percentiles.

The point-benchmarks (scripts/bench_serving.py) measure per-request medians
on one endpoint at a time; production serving cares about tail latency and
stability under sustained concurrent *mixed* load.  This harness runs N
closed-loop clients against a live `serve --http` server for a wall-clock
budget, each cycling through a workload mix (single-patch decode/roundtrip,
small generate), and reports per-endpoint p50/p95/p99 latency, throughput,
and an error ledger (4xx vs 5xx vs transport) — the numbers an operator
actually alarms on.  Beyond-reference: the reference has no serving at all
(its only artifact is a torch state_dict, model.py:388).

Usage (TPU, ~2 min):
    python scripts/soak_serving.py --seconds 60 --clients 8 \
        --batch-window-ms 25
CPU micro (tests): --bundle <tiny> --seconds 2 --clients 3
"""
import argparse
import http.client
import io
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def percentiles(ts):
    if not ts:
        return {}
    xs = np.sort(np.asarray(ts)) * 1e3
    return {"p50_ms": round(float(np.percentile(xs, 50)), 2),
            "p95_ms": round(float(np.percentile(xs, 95)), 2),
            "p99_ms": round(float(np.percentile(xs, 99)), 2),
            "max_ms": round(float(xs[-1]), 2)}


def run_soak(bundle_path, seconds=60.0, clients=8, batch_window_ms=None,
             wire="npz", seed=0):
    """Drive a live in-process server; returns the report dict."""
    from dxvae_tpu.serving import ServedDXVAE
    from dxvae_tpu.serving_http import make_server

    httpd = make_server(bundle_path, batch_window_ms=batch_window_ms)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    host, port = httpd.server_address[:2]
    srv: ServedDXVAE = httpd.model
    size_z = srv.manifest["cfg"]["size_z"]
    n_nodes = srv.manifest["cfg"]["n_nodes"]
    size_x = srv.manifest["cfg"]["size_x"]

    rng = np.random.default_rng(seed)
    z1 = rng.standard_normal((1, size_z)).astype(np.float32)
    # warm EVERY artifact the workload touches BEFORE the clock starts: the
    # first call of each exported function compiles on-device (minutes for
    # the big unrolled programs) — a soak measures steady-state serving,
    # not cold compiles (an unwarmed first run measured p50 ~90 s and even
    # tripped the micro-batch follower 503, all compile time)
    G = srv.decode(z1)
    X1 = np.asarray(G.X, np.float32)[:1]
    A1 = np.asarray(G.adj, np.float32)[:1]
    assert X1.shape == (1, n_nodes, size_x)
    srv.encode((X1, A1))
    srv.encode_decode((X1, A1))

    def npz_body(**arrays):
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        return buf.getvalue(), "application/x-npz"

    def json_body(**arrays):
        return (json.dumps({k: np.asarray(v).tolist()
                            for k, v in arrays.items()}),
                "application/json")

    body = npz_body if wire == "npz" else json_body
    workload = [
        ("/v1/decode", *body(z=z1)),
        ("/v1/roundtrip", *body(X=X1, adj=A1)),
        ("/v1/encode", *body(X=X1, adj=A1)),
        # generate takes JSON only (scalars); smallest bucket-size round
        ("/v1/generate", json.dumps({"n": 1, "seed": 7}),
         "application/json"),
    ]

    stats_mu = threading.Lock()
    lat = {route: [] for route, _, _ in workload}
    errors = {"4xx": 0, "5xx": 0, "transport": 0}
    stop = time.monotonic() + seconds

    def client(i):
        conn = http.client.HTTPConnection(host, port, timeout=600)
        k = i  # stagger the mix so clients don't sync on one endpoint
        try:
            while time.monotonic() < stop:
                route, payload, ctype = workload[k % len(workload)]
                k += 1
                t0 = time.perf_counter()
                try:
                    conn.request("POST", route, payload,
                                 {"Content-Type": ctype})
                    r = conn.getresponse()
                    r.read()
                    dt = time.perf_counter() - t0
                    with stats_mu:
                        if r.status == 200:
                            lat[route].append(dt)
                        elif r.status >= 500:
                            errors["5xx"] += 1
                        else:
                            errors["4xx"] += 1
                except OSError:
                    with stats_mu:
                        errors["transport"] += 1
                    conn.close()
                    conn = http.client.HTTPConnection(host, port,
                                                      timeout=600)
        finally:
            conn.close()

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    n_ok = sum(len(v) for v in lat.values())

    report = {
        "metric": "serving_soak",
        "bundle": str(bundle_path),
        "clients": clients,
        "seconds": round(wall, 1),
        "wire": wire,
        "batch_window_ms": batch_window_ms,
        "requests_ok": n_ok,
        "requests_per_sec": round(n_ok / wall, 1),
        "errors": errors,
        "endpoints": {route: {"n": len(ts), **percentiles(ts)}
                      for route, ts in lat.items()},
    }
    if httpd.batchers:
        report["micro_batching"] = {
            name: {"requests": mb.n_requests, "calls": mb.n_calls}
            for name, mb in httpd.batchers.items()}
    httpd.shutdown()
    httpd.server_close()
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bundle", default=None,
                    help="existing bundle (default: export a fresh "
                         "reference-size one to /tmp)")
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--batch-window-ms", type=float, default=None)
    ap.add_argument("--wire", default="npz", choices=["npz", "json"])
    ap.add_argument("--out", default=None,
                    help="also append the JSON report to this file")
    args = ap.parse_args(argv)

    from dxvae_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()

    if args.bundle is None:
        import jax

        from dxvae_tpu.api import DXVAE
        from dxvae_tpu.serving import export_bundle

        platform = jax.devices()[0].platform
        args.bundle = f"/tmp/soak_bundle_{platform}.npz"
        if not os.path.exists(args.bundle):
            model = DXVAE(compute_dtype="bfloat16")
            export_bundle(model, args.bundle, batch_sizes=(1, 8, 32),
                          platforms=(platform,))
    report = run_soak(args.bundle, seconds=args.seconds,
                      clients=args.clients,
                      batch_window_ms=args.batch_window_ms, wire=args.wire)
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "a") as fh:
            fh.write(line + "\n")
    return report


if __name__ == "__main__":
    main()
