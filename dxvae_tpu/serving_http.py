"""HTTP frontend over AOT serving bundles (beyond-reference; the reference
deploys nothing — its only artifact is a torch state_dict, model.py:388).

Completes the deployment story end to end: ``export-serving`` builds the
StableHLO artifact, ``serve --http`` puts it on the network.  Pure stdlib
(``http.server`` + ``json``) — a serving host needs jax and this one file's
dependencies only, no checkpoint and no model build.

Endpoints (JSON bodies; arrays as nested lists):

* ``GET  /healthz`` -> ``{ok, bundle_version, dxvae_tpu_version, functions,
  has_prior, has_search_index, cfg}`` — readiness, the bucket table for
  client-side batching, and the tensor contract (``cfg.size_z`` etc.).
* ``POST /v1/generate`` ``{n, seed?, prior?, temperature?, valid_only?,
  format?}`` -> the sampled patches; ``format="syx"`` returns
  ``{syx_base64}``, a 32-voice bank (padded by repeating the last patch,
  the CLI convention) ready to write to a DX7.
* ``POST /v1/encode`` ``{X, adj}`` -> ``{mu, std}``
* ``POST /v1/decode`` ``{z}`` -> ``{X, params, adj}``
* ``POST /v1/roundtrip`` ``{X, adj}`` -> ``{X, params, adj}``

The three tensor endpoints also speak a binary wire format: POST the same
arrays as an ``.npz`` body (``np.savez(buf, X=..., adj=...)``) with
``Content-Type: application/x-npz`` and the response comes back as an
``.npz`` of the same keys the JSON form uses — skipping the tensor<->JSON
lists conversion measured at ~18 ms/request at batch 32 (docs/PERF.md
"HTTP frontend layer cost").  Composes with micro-batching (the wire
format is handled per-request, outside the merge).
* ``POST /v1/search`` ``{X, adj | syx_base64 [, voice], k?, metric?}`` ->
  ``{hits: [{idx, distance, name, bank, voice, alg}]}`` — latent k-NN over
  a loaded index (``make_server(index_path=...)`` / CLI ``--search-index``);
  a client can POST a raw bank and get its nearest library patches back.

A process-wide lock serializes artifact calls: one device stream per
process is the TPU contract (CLAUDE.md), so concurrent clients queue in
the frontend instead of contending on the chip.  Client errors
(unknown route / malformed body / bucket overflow / rejection-sampling
exhaustion) map to 4xx with ``{"error": ...}``; nothing crashes the server.
"""

from __future__ import annotations

import base64
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from dxvae_tpu.graph import GraphBatch
from dxvae_tpu.serving import (ServedDXVAE, bank_bytes, knn_hits,
                               load_search_index)


class MicroBatcher:
    """Cross-request micro-batching for one tensor endpoint.

    The artifact executes one call per request (~0.33 ms per-call overhead on
    TPU, docs/PERF.md "AOT serving path"), and the bundle's bucketed dispatch
    pads a 1-patch request up to a whole bucket anyway — so N concurrent
    small requests cost N bucket-sized device calls.  The batcher merges
    requests that arrive within ``window_s`` of each other into ONE call and
    hands each client its slice back: the first request in becomes the
    *leader*, sleeps out the window while followers append, then executes the
    merged batch under the device lock.  An empty window adds exactly
    ``window_s`` latency to a lone request; a busy window converts per-call
    overhead into per-batch overhead.

    ``fn`` maps the concatenated inputs to outputs; ``slice_out`` cuts one
    client's rows back out.  Failures of a merged call propagate to every
    caller in it — which is why the handler validates every request's
    shapes (``_check_batch``) BEFORE ``submit``: one malformed request must
    400 alone, not poison the ``np.concatenate`` for everyone sharing its
    window.
    """

    def __init__(self, fn, slice_out, lock, window_s: float = 0.005,
                 max_batch: int | None = None):
        self.fn, self.slice_out = fn, slice_out
        self.device_lock = lock
        self.window_s = float(window_s)
        self.max_batch = max_batch
        self._mu = threading.Lock()
        self._pending: list[dict] = []
        self.n_requests = 0
        self.n_calls = 0

    def submit(self, *arrays):
        item = {"in": arrays, "n": len(arrays[0]), "ev": threading.Event()}
        with self._mu:
            self._pending.append(item)
            self.n_requests += 1
            leader = len(self._pending) == 1
        if leader:
            time.sleep(self.window_s)
            with self._mu:
                batch, self._pending = self._pending, []
            self._run(batch)
        elif not item["ev"].wait(timeout=120.0):
            # a server-side stall, not a client error — the handler maps
            # TimeoutError to 503 so retrying clients don't give up
            raise TimeoutError("micro-batch timed out waiting for its "
                               "leader (server overloaded)")
        if "err" in item:
            raise item["err"]
        return item["out"]

    def _run(self, batch: list[dict]) -> None:
        # respect the bundle's largest bucket: chunk an oversized merge
        chunks, cur, cur_n = [], [], 0
        for it in batch:
            if cur and self.max_batch and cur_n + it["n"] > self.max_batch:
                chunks.append(cur)
                cur, cur_n = [], 0
            cur.append(it)
            cur_n += it["n"]
        chunks.append(cur)
        for chunk in chunks:
            fatal = None
            try:
                cat = tuple(np.concatenate([it["in"][i] for it in chunk])
                            for i in range(len(chunk[0]["in"])))
                with self.device_lock:
                    self.n_calls += 1
                    out = self.fn(*cat)
                ofs = 0
                for it in chunk:
                    it["out"] = self.slice_out(out, ofs, ofs + it["n"])
                    ofs += it["n"]
            except BaseException as e:  # deliver, don't swallow: every
                for it in chunk:        # waiter gets the failure instead of
                    it["err"] = e       # a timeout (or a bare KeyError)
                if not isinstance(e, Exception):
                    fatal = e  # SystemExit/KeyboardInterrupt: re-raise in
            finally:           # the leader after the waiters are released
                for it in chunk:
                    it["ev"].set()
            if fatal is not None:
                raise fatal


def _check_batch(name: str, arr: np.ndarray, *trailing: int) -> None:
    """Require shape (B>=1, *trailing).  Runs per-request BEFORE a tensor
    endpoint executes (or enters a micro-batch): with batching enabled an
    unvalidated shape would fail the merged np.concatenate and poison every
    request sharing the window."""
    if arr.ndim != 1 + len(trailing) or arr.shape[1:] != trailing \
            or len(arr) == 0:
        want = ", ".join(str(t) for t in trailing)
        raise ValueError(f"{name} must have shape (B>=1, {want}), "
                         f"got {tuple(arr.shape)}")


def _graph_json(G: GraphBatch) -> dict:
    return {"X": np.asarray(G.X).tolist(),
            "params": np.asarray(G.params).tolist(),
            "adj": np.asarray(G.adj).tolist()}


class _BundleHandler(BaseHTTPRequestHandler):
    server_version = "dxvae-tpu-serve/1"
    protocol_version = "HTTP/1.1"
    # TCP_NODELAY: without it, Nagle + the peer's delayed ACK stalls the
    # response body ~40 ms behind the header write (measured on the binary
    # wire at batch 32: 43 ms of a 52 ms request was this stall)
    disable_nagle_algorithm = True

    def log_message(self, fmt, *args):  # quiet by default
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    _NPZ = "application/x-npz"

    def _json(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _tensors(self, code: int, arrays: dict) -> None:
        """Tensor response in the request's wire format: an ``.npz`` body if
        the request was ``.npz``, JSON nested lists otherwise."""
        if not getattr(self, "_npz", False):
            return self._json(code, {k: np.asarray(v).tolist()
                                     for k, v in arrays.items()})
        import io

        buf = io.BytesIO()
        np.savez(buf, **{k: np.asarray(v) for k, v in arrays.items()})
        body = buf.getvalue()
        self.send_response(code)
        self.send_header("Content-Type", self._NPZ)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path != "/healthz":
            return self._json(404, {"error": f"unknown route {self.path!r}"})
        man = self.server.model.manifest
        health = {
            "ok": True,
            "bundle_version": man["bundle_version"],
            "dxvae_tpu_version": man["dxvae_tpu_version"],
            "functions": man["functions"],
            "has_prior": bool(man.get("has_prior")),
            "has_search_index": self.server.index is not None,
            # clients need the tensor contract (size_z for /v1/decode,
            # n_nodes/size_x for /v1/encode) without loading the bundle
            "cfg": man["cfg"],
        }
        if self.server.batchers:
            # merge-ratio observability: calls/requests << 1 means the
            # window is earning its latency; == 1 means it only adds delay
            health["micro_batching"] = {
                name: {"requests": mb.n_requests, "calls": mb.n_calls,
                       "window_ms": mb.window_s * 1e3}
                for name, mb in self.server.batchers.items()}
        self._json(200, health)

    def do_POST(self):
        ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
        self._npz = ctype == self._NPZ
        try:
            n_bytes = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n_bytes)
            if self._npz:
                if self.path not in ("/v1/encode", "/v1/decode",
                                     "/v1/roundtrip"):
                    return self._json(400, {
                        "error": f"{self._NPZ} bodies are only accepted on "
                                 "the tensor endpoints "
                                 "(/v1/encode, /v1/decode, /v1/roundtrip)"})
                import io
                import zipfile
                try:  # np.load default allow_pickle=False: data-only, safe
                    with np.load(io.BytesIO(body)) as f:
                        req = {k: f[k] for k in f.files}
                except (ValueError, OSError, EOFError, KeyError,
                        zipfile.BadZipFile) as e:
                    raise ValueError(f"not a readable .npz body: {e}") \
                        from None
            else:
                req = json.loads(body or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("body must be a JSON object")
        except (ValueError, json.JSONDecodeError) as e:
            return self._json(400, {"error": f"bad request body: {e}"})
        srv: ServedDXVAE = self.server.model
        try:
            # only the artifact calls need the device lock (one stream per
            # process); request parsing and response JSON stay outside it so
            # host-only work from one client never queues another
            if self.path == "/v1/generate":
                with self.server.lock:
                    G = srv.generate(
                        int(req["n"]), seed=int(req.get("seed", 0)),
                        prior=req.get("prior"),
                        temperature=float(req.get("temperature", 1.0)),
                        valid_only=bool(req.get("valid_only", False)))
                if req.get("format") == "syx":
                    raw = bank_bytes(G, checksum=req.get("checksum", "parity"))
                    return self._json(200, {
                        "syx_base64": base64.b64encode(raw).decode()})
                return self._json(200, _graph_json(G))
            cfg = srv.manifest["cfg"]
            if self.path == "/v1/encode":
                X = np.asarray(req["X"], np.float32)
                adj = np.asarray(req["adj"], np.float32)
                _check_batch("X", X, cfg["n_nodes"], cfg["size_x"])
                _check_batch("adj", adj, cfg["n_nodes"], cfg["n_nodes"])
                if len(X) != len(adj):
                    raise ValueError(f"X has {len(X)} patches but adj has "
                                     f"{len(adj)}")
                if self.server.batchers:
                    mu, std = self.server.batchers["encode"].submit(X, adj)
                else:
                    with self.server.lock:
                        mu, std = srv.encode((X, adj))
                return self._tensors(200, {"mu": mu, "std": std})
            if self.path == "/v1/decode":
                z = np.asarray(req["z"], np.float32)
                _check_batch("z", z, cfg["size_z"])
                if self.server.batchers:
                    G = self.server.batchers["decode"].submit(z)
                else:
                    with self.server.lock:
                        G = srv.decode(z)
                return self._tensors(200, {"X": G.X, "params": G.params,
                                           "adj": G.adj})
            if self.path == "/v1/roundtrip":
                X = np.asarray(req["X"], np.float32)
                adj = np.asarray(req["adj"], np.float32)
                _check_batch("X", X, cfg["n_nodes"], cfg["size_x"])
                _check_batch("adj", adj, cfg["n_nodes"], cfg["n_nodes"])
                if len(X) != len(adj):
                    raise ValueError(f"X has {len(X)} patches but adj has "
                                     f"{len(adj)}")
                if self.server.batchers:
                    G = self.server.batchers["roundtrip"].submit(X, adj)
                else:
                    with self.server.lock:
                        G = srv.encode_decode((X, adj))
                return self._tensors(200, {"X": G.X, "params": G.params,
                                           "adj": G.adj})
            if self.path == "/v1/search":
                index = self.server.index
                if index is None:
                    raise ValueError(
                        "server started without a search index "
                        "(serve --http ... --search-index idx.npz)")
                if "syx_base64" in req:  # a bank as the query, no tensors
                    from dxvae_tpu.data.sysex import (read_syx_bytes,
                                                      unpack_voices)

                    raw = read_syx_bytes(base64.b64decode(req["syx_base64"]))
                    _, X, adj = unpack_voices(raw)
                    v = int(req.get("voice", 0))
                    if not 0 <= v < len(X):
                        raise ValueError(
                            f"voice {v} out of range for a {len(X)}-voice bank")
                    X, adj = X[v:v + 1], adj[v:v + 1]
                else:
                    X = np.asarray(req["X"], np.float32)
                    adj = np.asarray(req["adj"], np.float32)
                if len(X) != 1:
                    # reject BEFORE the lock: a batched "query" would hold
                    # the device (queuing every other client) for an encode
                    # whose result is discarded
                    raise ValueError(
                        f"search takes exactly one query patch, got {len(X)}")
                with self.server.lock:
                    mu, _ = srv.encode((X, adj))
                hits = knn_hits(index["mu"], mu[0],
                                k=int(req.get("k", 5)),
                                metric=req.get("metric", "l2"))
                return self._json(200, {"hits": [
                    {"idx": i, "distance": d,
                     "name": str(index["names"][i]),
                     "bank": str(index["bank"][i]),
                     "voice": int(index["voice"][i]),
                     "alg": int(index["alg"][i])} for i, d in hits]})
            return self._json(404, {"error": f"unknown route {self.path!r}"})
        except KeyError as e:
            return self._json(400, {"error": f"missing field {e}"})
        except TimeoutError as e:
            # server-side stall (micro-batch leader overloaded), NOT a bad
            # request — 503 tells well-behaved clients to retry
            return self._json(503, {"error": str(e)})
        except (ValueError, TypeError, RuntimeError, IndexError) as e:
            return self._json(400, {"error": str(e)})


def make_server(bundle_path, host: str = "127.0.0.1", port: int = 0,
                verbose: bool = False,
                index_path=None,
                batch_window_ms: float | None = None) -> ThreadingHTTPServer:
    """Build (but don't start) an HTTP server over ``bundle_path``.  Port 0
    binds an ephemeral port — read it back from ``server_address``.
    ``index_path`` loads a latent index (CLI ``search --save-index``) and
    enables ``/v1/search``; it must live in the same latent space as the
    bundle (same checkpoint — the latent width is checked at startup).
    ``batch_window_ms`` enables cross-request micro-batching on the tensor
    endpoints (encode/decode/roundtrip): requests arriving within the window
    merge into one artifact call (see :class:`MicroBatcher`) — worth it when
    many clients send small batches; a lone request pays the window as extra
    latency."""
    httpd = ThreadingHTTPServer((host, port), _BundleHandler)
    try:  # never leak the bound socket on a failed startup
        httpd.model = ServedDXVAE.load(bundle_path)
        httpd.lock = threading.Lock()
        httpd.verbose = verbose
        httpd.index = None
        httpd.batchers = None
        if batch_window_ms is not None:
            if batch_window_ms < 0:
                raise ValueError(f"negative batch window: {batch_window_ms}")
            srv, w = httpd.model, batch_window_ms / 1000.0
            fns = srv.manifest["functions"]

            def _cap(name):
                return fns[name][-1] if name in fns else None

            _slice_graph = lambda G, a, b: G[a:b]
            httpd.batchers = {
                "encode": MicroBatcher(
                    lambda X, adj: srv.encode((X, adj)),
                    lambda out, a, b: (out[0][a:b], out[1][a:b]),
                    httpd.lock, w, _cap("encode")),
                "decode": MicroBatcher(
                    lambda z: srv.decode(z), _slice_graph,
                    httpd.lock, w, _cap("decode")),
                "roundtrip": MicroBatcher(
                    lambda X, adj: srv.encode_decode((X, adj)), _slice_graph,
                    httpd.lock, w, _cap("roundtrip")),
            }
        if index_path is not None:
            httpd.index = load_search_index(index_path)
            size_z = httpd.model.manifest["cfg"]["size_z"]
            got = httpd.index["mu"].shape[1]
            if got != size_z:
                raise ValueError(
                    f"search index latent width {got} != bundle size_z "
                    f"{size_z} — build the index with the same checkpoint "
                    "the bundle was exported from")
    except BaseException:
        httpd.server_close()
        raise
    return httpd


def serve_forever(bundle_path, host: str = "127.0.0.1", port: int = 8000,
                  verbose: bool = True, index_path=None,
                  batch_window_ms: float | None = None) -> None:
    httpd = make_server(bundle_path, host, port, verbose=verbose,
                        index_path=index_path,
                        batch_window_ms=batch_window_ms)
    h, p = httpd.server_address[:2]
    print(f"serving {bundle_path} at http://{h}:{p} "
          f"(functions: {sorted(httpd.model.manifest['functions'])})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
