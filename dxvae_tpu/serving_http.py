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
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from dxvae_tpu.graph import GraphBatch
from dxvae_tpu.serving import (ServedDXVAE, bank_bytes, knn_hits,
                               load_search_index)


def _graph_json(G: GraphBatch) -> dict:
    return {"X": np.asarray(G.X).tolist(),
            "params": np.asarray(G.params).tolist(),
            "adj": np.asarray(G.adj).tolist()}


class _BundleHandler(BaseHTTPRequestHandler):
    server_version = "dxvae-tpu-serve/1"
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet by default
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    def _json(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path != "/healthz":
            return self._json(404, {"error": f"unknown route {self.path!r}"})
        man = self.server.model.manifest
        self._json(200, {
            "ok": True,
            "bundle_version": man["bundle_version"],
            "dxvae_tpu_version": man["dxvae_tpu_version"],
            "functions": man["functions"],
            "has_prior": bool(man.get("has_prior")),
            "has_search_index": self.server.index is not None,
            # clients need the tensor contract (size_z for /v1/decode,
            # n_nodes/size_x for /v1/encode) without loading the bundle
            "cfg": man["cfg"],
        })

    def do_POST(self):
        try:
            n_bytes = int(self.headers.get("Content-Length") or 0)
            req = json.loads(self.rfile.read(n_bytes) or b"{}")
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
            if self.path == "/v1/encode":
                X = np.asarray(req["X"], np.float32)
                adj = np.asarray(req["adj"], np.float32)
                with self.server.lock:
                    mu, std = srv.encode((X, adj))
                return self._json(200, {"mu": mu.tolist(),
                                        "std": std.tolist()})
            if self.path == "/v1/decode":
                z = np.asarray(req["z"], np.float32)
                with self.server.lock:
                    G = srv.decode(z)
                return self._json(200, _graph_json(G))
            if self.path == "/v1/roundtrip":
                X = np.asarray(req["X"], np.float32)
                adj = np.asarray(req["adj"], np.float32)
                with self.server.lock:
                    G = srv.encode_decode((X, adj))
                return self._json(200, _graph_json(G))
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
        except (ValueError, TypeError, RuntimeError, IndexError) as e:
            return self._json(400, {"error": str(e)})


def make_server(bundle_path, host: str = "127.0.0.1", port: int = 0,
                verbose: bool = False,
                index_path=None) -> ThreadingHTTPServer:
    """Build (but don't start) an HTTP server over ``bundle_path``.  Port 0
    binds an ephemeral port — read it back from ``server_address``.
    ``index_path`` loads a latent index (CLI ``search --save-index``) and
    enables ``/v1/search``; it must live in the same latent space as the
    bundle (same checkpoint — the latent width is checked at startup)."""
    httpd = ThreadingHTTPServer((host, port), _BundleHandler)
    try:  # never leak the bound socket on a failed startup
        httpd.model = ServedDXVAE.load(bundle_path)
        httpd.lock = threading.Lock()
        httpd.verbose = verbose
        httpd.index = None
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
                  verbose: bool = True, index_path=None) -> None:
    httpd = make_server(bundle_path, host, port, verbose=verbose,
                        index_path=index_path)
    h, p = httpd.server_address[:2]
    print(f"serving {bundle_path} at http://{h}:{p} "
          f"(functions: {sorted(httpd.model.manifest['functions'])})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
