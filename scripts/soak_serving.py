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
             wire="npz", seed=0, adaptive_window=False, call_timeout_s=None,
             inject_faults=False):
    """Drive a live in-process server; returns the report dict.

    ``inject_faults=True`` adds hostile traffic and a device stall alongside
    the normal clients — the hardening soak (VERDICT r3 #3):

    * one client per fault kind: oversized Content-Length (expects 413) and
      a stalled sender that opens a request then never sends the body
      (expects the server's read timeout to free the handler thread);
    * the served ``encode`` is wrapped to stall 3x the watchdog every 7th
      call, so ``call_timeout_s`` converts real device hangs into 503s.

    The report gains ``faults`` (per-kind client-observed outcomes),
    ``ledger`` (the server's own /healthz error ledger), and
    ``threads_leaked`` (alive threads after shutdown minus before startup —
    must be ~0 or handlers are leaking)."""
    from dxvae_tpu.serving import ServedDXVAE
    from dxvae_tpu.serving_http import make_server

    threads_before = threading.active_count()
    httpd = make_server(bundle_path, batch_window_ms=batch_window_ms,
                        adaptive_window=adaptive_window,
                        call_timeout_s=call_timeout_s,
                        read_timeout_s=2.0 if inject_faults else 30.0,
                        max_body_mb=8.0 if inject_faults else 32.0)
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
    faults = {"oversize_413": 0, "oversize_other": 0,
              "stall_dropped": 0, "stall_other": 0, "watchdog_503": 0}
    stop = time.monotonic() + seconds

    if inject_faults:
        # device-stall injection: every 7th encode sleeps out the watchdog
        # (3x call_timeout_s, or 6 s), exercising the 503 + ledger path on a
        # real in-flight artifact call
        real_encode = srv.encode
        stall_s = 3.0 * (call_timeout_s or 2.0)
        n_enc = [0]

        def stalling_encode(G):
            n_enc[0] += 1
            if n_enc[0] % 7 == 0:
                time.sleep(stall_s)
            return real_encode(G)

        srv.encode = stalling_encode

    def fault_client(kind):
        import socket as _socket

        while time.monotonic() < stop:
            try:
                conn = http.client.HTTPConnection(host, port, timeout=30)
                if kind == "oversize":
                    # claim a huge body; the server must 413 without reading
                    conn.putrequest("POST", "/v1/decode")
                    conn.putheader("Content-Type", "application/json")
                    conn.putheader("Content-Length", str(1 << 31))
                    conn.endheaders()
                    r = conn.getresponse()
                    r.read()
                    with stats_mu:
                        faults["oversize_413" if r.status == 413
                               else "oversize_other"] += 1
                else:  # stall: send headers, then go silent mid-body
                    conn.putrequest("POST", "/v1/decode")
                    conn.putheader("Content-Type", "application/json")
                    conn.putheader("Content-Length", "1000")
                    conn.endheaders()
                    conn.send(b'{"z": [[')  # ...never finishes
                    r = conn.getresponse()  # server read-timeout drops us
                    r.read()
                    with stats_mu:
                        faults["stall_other"] += 1
                conn.close()
            except (OSError, http.client.HTTPException, _socket.timeout):
                with stats_mu:
                    faults["stall_dropped" if kind == "stall" else
                           "oversize_other"] += 1
            time.sleep(0.5)  # hostile-but-slow: don't starve real clients

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
    if inject_faults:
        threads += [threading.Thread(target=fault_client, args=(k,))
                    for k in ("oversize", "stall")]
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
        "adaptive_window": adaptive_window,
        "call_timeout_s": call_timeout_s,
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
    if inject_faults:
        ledger = httpd.ledger.snapshot()
        faults["watchdog_503"] = sum(
            1 for e in ledger["recent"] if e["kind"] == "call_timeout")
        report["faults"] = faults
        report["ledger"] = {"count": ledger["count"], "kinds": sorted(
            {e["kind"] for e in ledger["recent"]})}
    httpd.shutdown()
    httpd.server_close()
    # a moment for handler threads to notice their closed sockets; anything
    # still alive after it is a leak
    if inject_faults:
        deadline = time.monotonic() + 10.0
        while (threading.active_count() > threads_before
               and time.monotonic() < deadline):
            time.sleep(0.1)
        report["threads_leaked"] = threading.active_count() - threads_before
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bundle", default=None,
                    help="existing bundle (default: export a fresh "
                         "reference-size one to /tmp)")
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--batch-window-ms", type=float, default=None)
    ap.add_argument("--adaptive-window", action="store_true",
                    help="micro-batch window opens only under same-endpoint "
                         "concurrency (serving_http.MicroBatcher adaptive)")
    ap.add_argument("--call-timeout-s", type=float, default=None,
                    help="watchdog: artifact calls running past this 503")
    ap.add_argument("--inject-faults", action="store_true",
                    help="add hostile clients (oversize body, stalled "
                         "sender) and a periodic device stall; report 413/"
                         "503 handling, the error ledger, and thread leaks")
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
                      batch_window_ms=args.batch_window_ms, wire=args.wire,
                      adaptive_window=args.adaptive_window,
                      call_timeout_s=args.call_timeout_s,
                      inject_faults=args.inject_faults)
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "a") as fh:
            fh.write(line + "\n")
    return report


if __name__ == "__main__":
    main()
