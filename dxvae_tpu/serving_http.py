"""HTTP frontend over AOT serving bundles (beyond-reference; the reference
deploys nothing — its only artifact is a torch state_dict, model.py:388).

Completes the deployment story end to end: ``export-serving`` builds the
StableHLO artifact, ``serve --http`` puts it on the network.  Pure stdlib
(``http.server`` + ``json``) — a serving host needs jax and this one file's
dependencies only, no checkpoint and no model build.

Endpoints (JSON bodies; arrays as nested lists):

* ``GET  /healthz`` -> ``{ok, bundle_version, dxvae_tpu_version, functions,
  has_prior, has_search_index, cfg, errors}`` — readiness, the bucket table
  for client-side batching, the tensor contract (``cfg.size_z`` etc.), and
  the rolling server-side error ledger.
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

Hardening (an open port is a production surface, unlike the library API):

* Request bodies are capped (``max_body_mb``, default 32 — default 413
  above it) and every client socket carries a read timeout
  (``read_timeout_s``) so a stalled sender frees its handler thread
  instead of pinning it and its RAM forever.
* All artifact calls run on ONE dedicated device thread
  (:class:`DeviceExecutor` — one device stream per process is the TPU
  contract, CLAUDE.md) with an optional per-call watchdog
  (``call_timeout_s``): a hung or cold-compiling device call turns into a
  503 + an error-ledger entry instead of a silently pinned handler.  The
  first call of each function/bucket is allowed the longer
  ``cold_timeout_s`` because StableHLO artifacts compile on first use —
  minutes for the big unrolled programs on this image (``warmup=True``
  pre-compiles every exported bucket at startup instead).
* Client errors (unknown route / malformed body / bucket overflow /
  rejection-sampling exhaustion) map to 4xx with ``{"error": ...}``;
  nothing crashes the server.
"""

from __future__ import annotations

import base64
import collections
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from dxvae_tpu.graph import GraphBatch
from dxvae_tpu.serving import (ServedDXVAE, bank_bytes, knn_hits,
                               load_search_index)


class ErrorLedger:
    """Bounded in-memory record of server-side failures, surfaced on
    ``/healthz`` — the signal an operator alarms on (the r3 soak showed
    11-16 s tunnel stalls reaching clients raw with no server-side trace)."""

    def __init__(self, cap: int = 64):
        self._mu = threading.Lock()
        self._items: collections.deque = collections.deque(maxlen=cap)
        self.count = 0

    def record(self, kind: str, detail: str) -> None:
        with self._mu:
            self.count += 1
            self._items.append({"ts": round(time.time(), 3), "kind": kind,
                                "detail": str(detail)[:200]})

    def snapshot(self) -> dict:
        with self._mu:
            return {"count": self.count, "recent": list(self._items)}


class DeviceExecutor:
    """Single worker thread owning ALL artifact calls (one device stream per
    process, CLAUDE.md), with a per-call watchdog.

    ``call`` enqueues a thunk and waits up to ``timeout_s``; past it the
    caller gets ``TimeoutError`` (the HTTP handler maps it to 503 and the
    ledger records it) while the device call keeps running on the worker —
    a hung call therefore occupies the single stream (subsequent calls queue
    behind it and time out too, each with its own 503) but never leaks a
    handler thread and never crashes the server.  Names that have completed
    once are "warm"; a cold name gets ``max(timeout_s, cold_timeout_s)``
    because first use of a StableHLO artifact compiles (minutes for the big
    unrolled programs on this image — the r3 soak tripped follower 503s on
    exactly this)."""

    def __init__(self, ledger: ErrorLedger | None = None,
                 cold_timeout_s: float = 600.0):
        self.ledger = ledger
        self.cold_timeout_s = float(cold_timeout_s)
        self._warm_names: set = set()
        self._q: queue.SimpleQueue = queue.SimpleQueue()
        self._t = threading.Thread(target=self._loop, daemon=True,
                                   name="dxvae-device")
        self._t.start()

    def call(self, name: str, thunk, timeout_s: float | None = None):
        if timeout_s is not None and name not in self._warm_names:
            timeout_s = max(timeout_s, self.cold_timeout_s)
        job = {"name": name, "thunk": thunk, "done": threading.Event()}
        self._q.put(job)
        if not job["done"].wait(timeout=timeout_s):
            job["abandoned"] = True
            if self.ledger is not None:
                self.ledger.record("call_timeout",
                                   f"{name} still running after {timeout_s:g} s")
            raise TimeoutError(
                f"artifact call {name!r} still running after {timeout_s:g} s "
                "(device stalled, or another call holds the stream) — retry")
        if "err" in job:
            raise job["err"]
        return job["out"]

    def _loop(self) -> None:
        while True:
            job = self._q.get()
            if job is None:
                return
            try:
                job["out"] = job["thunk"]()
                # the worker marks warmth (not the caller): even an
                # abandoned call that eventually completes has compiled
                # its artifact, so the next call gets the tight timeout
                self._warm_names.add(job["name"])
            except BaseException as e:  # delivered to the caller, not fatal
                job["err"] = e
            finally:
                job["done"].set()
            if job.get("abandoned") and self.ledger is not None:
                # the watchdog already 503'd the client; note how it ended
                kind = "late_failure" if "err" in job else "late_completion"
                self.ledger.record(kind, job["name"])

    def shutdown(self) -> None:
        self._q.put(None)


class MicroBatcher:
    """Cross-request micro-batching for one tensor endpoint.

    The artifact executes one call per request (~0.33 ms per-call overhead on
    TPU, docs/PERF.md "AOT serving path"), and the bundle's bucketed dispatch
    pads a 1-patch request up to a whole bucket anyway — so N concurrent
    small requests cost N bucket-sized device calls.  The batcher merges
    requests that arrive within ``window_s`` of each other into ONE call and
    hands each client its slice back: the first request in becomes the
    *leader*, sleeps out the window while followers append, then executes the
    merged batch on the device stream.  An empty window adds exactly
    ``window_s`` latency to a lone request; a busy window converts per-call
    overhead into per-batch overhead.

    ``adaptive=True`` stops lone requests paying the window at all: the
    window only opens while the endpoint is *hot* — two arrivals landed
    within ``hot_gap_s`` of each other (or a follower actually queued)
    within the last ``hot_s`` seconds.  Mixed sparse traffic (the r3 soak
    measured merge ratio ~= 0.99: the static window was pure added latency,
    docs/PERF.md "Serving soak") runs at window 0; a same-endpoint burst
    heats the window back up by its second request, so sustained concurrent
    load keeps merging.

    ``fn`` maps the concatenated inputs to outputs; ``slice_out`` cuts one
    client's rows back out; ``call`` serializes device access — either a
    plain lock, or a ``DeviceExecutor.call``-shaped callable
    ``(name, thunk, timeout_s=None)`` which adds the hung-call watchdog
    (``call_timeout_s``).  Failures of a merged call propagate to every
    caller in it — which is why the handler validates every request's
    shapes (``_check_batch``) BEFORE ``submit``: one malformed request must
    400 alone, not poison the ``np.concatenate`` for everyone sharing its
    window.

    A merged batch is split into device calls along the exported bucket
    table (``buckets``): e.g. 9 single-patch requests against buckets
    (1, 8, 32) dispatch as 8+1 (9 padded rows) rather than one 32-padded
    call.  The split minimizes ``dispatched bucket rows +
    OVERHEAD_ROWS per call`` — padded rows are marginal compute, while each
    extra call pays a fixed dispatch boundary (measured: 0.33 ms artifact
    boundary + ~20 ms HTTP/npz at batch 32, docs/PERF.md "AOT serving") —
    so 8 singles merge into ONE bucket-8 call and 3 singles prefer one
    half-empty bucket-8 call over three dispatches, but 9 singles still
    split 8+1 instead of one mostly-padding 32-call.  Without ``buckets``,
    ``max_batch`` only caps chunks at the largest bucket.
    """

    #: per-device-call fixed overhead, in padded-row equivalents, for the
    #: bucket-split optimizer (see class docstring for the measurements)
    OVERHEAD_ROWS = 8

    def __init__(self, fn, slice_out, call, window_s: float = 0.005,
                 max_batch: int | None = None,
                 buckets: list | tuple | None = None,
                 adaptive: bool = False,
                 call_timeout_s: float | None = None,
                 follower_timeout_s: float = 120.0,
                 cold_timeout_s: float = 600.0,
                 hot_s: float = 0.25, name: str = "batch"):
        self.fn, self.slice_out = fn, slice_out
        if hasattr(call, "acquire"):  # a plain lock: serialize, no watchdog
            lock = call

            def call(name, thunk, timeout_s=None):
                with lock:
                    return thunk()

        self._call = call
        self.window_s = float(window_s)
        self.buckets = sorted(int(b) for b in buckets) if buckets else None
        self.max_batch = (self.buckets[-1] if self.buckets else
                          (int(max_batch) if max_batch else None))
        self.adaptive = bool(adaptive)
        self.call_timeout_s = call_timeout_s
        self.follower_timeout_s = float(follower_timeout_s)
        self.cold_timeout_s = float(cold_timeout_s)
        self.hot_s = float(hot_s)
        self._hot_gap_s = max(2.0 * self.window_s, 0.02)
        self._hot_until = -1e18
        self._last_arrival = -1e18
        self.name = name
        self._mu = threading.Lock()
        self._pending: list[dict] = []
        self._merged: collections.deque = collections.deque(maxlen=32)
        self._warm = False
        self.n_requests = 0
        self.n_calls = 0

    def submit(self, *arrays):
        item = {"in": arrays, "n": len(arrays[0]), "ev": threading.Event()}
        now = time.monotonic()
        with self._mu:
            self._pending.append(item)
            self.n_requests += 1
            leader = len(self._pending) == 1
            w = self.window_s
            if self.adaptive:
                # same-endpoint concurrency (a close pair of arrivals, or an
                # actual follower) heats the window; sparse traffic cools it.
                # Heat only ever EXTENDS the horizon (a follower landing late
                # in a long-hot window must not shorten it)
                if now - self._last_arrival <= self._hot_gap_s or not leader:
                    self._hot_until = max(self._hot_until, now + self.hot_s)
                self._last_arrival = now
                if leader and now >= self._hot_until:
                    w = 0.0
        if leader:
            if w > 0:
                time.sleep(w)
            with self._mu:
                batch, self._pending = self._pending, []
            self._run(batch)
            if self.adaptive and len(batch) > 1:
                # an actual merge proves concurrency: keep the window open
                # past the device call so closed-loop clients that re-arrive
                # after their response still find it hot
                with self._mu:
                    self._hot_until = max(self._hot_until,
                                          time.monotonic() + self.hot_s)
        else:
            t = (self.follower_timeout_s if self._warm
                 else self.cold_timeout_s)
            if not item["ev"].wait(timeout=t):
                # a server-side stall, not a client error — the handler maps
                # TimeoutError to 503 so retrying clients don't give up
                raise TimeoutError("micro-batch timed out waiting for its "
                                   "leader (server overloaded)")
        if "err" in item:
            raise item["err"]
        return item["out"]

    # -- chunking ----------------------------------------------------------

    def _bucket_for(self, n: int) -> int | None:
        for b in self.buckets:
            if b >= n:
                return b
        return None

    def _chunks(self, batch: list[dict]) -> list[list[dict]]:
        if not self.buckets:
            # legacy greedy: respect only the max-bucket cap
            chunks, cur, cur_n = [], [], 0
            for it in batch:
                if cur and self.max_batch and cur_n + it["n"] > self.max_batch:
                    chunks.append(cur)
                    cur, cur_n = [], 0
                cur.append(it)
                cur_n += it["n"]
            chunks.append(cur)
            return chunks
        # split along exported bucket boundaries: minimize
        # bucket_rows + OVERHEAD_ROWS*calls (class docstring), tie-break
        # toward fewer device calls.  O(n^2) prefix DP over the (tens of)
        # requests sharing a window.
        sizes = [it["n"] for it in batch]
        n = len(sizes)
        best: list = [(0, 0)] + [None] * n  # (cost, calls) for [:j]
        cut = [0] * (n + 1)
        for j in range(1, n + 1):
            tot = 0
            for i in range(j - 1, -1, -1):
                tot += sizes[i]
                b = self._bucket_for(tot)
                if b is None:
                    if i < j - 1:
                        break  # tot only grows as i decreases
                    # single request beyond the largest bucket: isolate it so
                    # the artifact's overflow error hits only its sender
                    b = tot
                if best[i] is None:
                    continue
                cand = (best[i][0] + b + self.OVERHEAD_ROWS, best[i][1] + 1)
                if best[j] is None or cand < best[j]:
                    best[j], cut[j] = cand, i
        out, j = [], n
        while j > 0:
            out.append(batch[cut[j]:j])
            j = cut[j]
        return out[::-1]

    def _run(self, batch: list[dict]) -> None:
        for chunk in self._chunks(batch):
            fatal = None
            chunk_n = sum(it["n"] for it in chunk)
            bucket = self._bucket_for(chunk_n) if self.buckets else None
            timeout = None
            if self.call_timeout_s is not None:
                timeout = (self.call_timeout_s if self._warm
                           else max(self.call_timeout_s, self.cold_timeout_s))
            with self._mu:
                self.n_calls += 1
                self._merged.append(len(chunk))
            try:
                cat = tuple(np.concatenate([it["in"][i] for it in chunk])
                            for i in range(len(chunk[0]["in"])))
                out = self._call(f"{self.name}/{bucket or chunk_n}",
                                 lambda: self.fn(*cat), timeout_s=timeout)
                self._warm = True
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

    def stats(self) -> dict:
        """Counter snapshot, consistent under the batcher's own lock (the
        merge ratio shown can never exceed 1 request per call)."""
        with self._mu:
            m = list(self._merged)
            return {
                "requests": self.n_requests, "calls": self.n_calls,
                "window_ms": self.window_s * 1e3,
                "adaptive": self.adaptive,
                "window_hot": (time.monotonic() < self._hot_until
                               if self.adaptive else True),
                "recent_requests_per_call":
                    round(sum(m) / len(m), 3) if m else None,
            }


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

    def setup(self):
        # per-connection read timeout: a client that stalls mid-body (or
        # never sends one) raises socket.timeout in rfile.read, which
        # handle_one_request turns into a closed connection — freeing the
        # handler thread instead of pinning it forever
        self.timeout = getattr(self.server, "read_timeout_s", None)
        super().setup()

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
            "errors": self.server.ledger.snapshot(),
        }
        if self.server.batchers:
            # merge-ratio observability: requests/call >> 1 means the
            # window is earning its latency; == 1 means it only adds delay
            # (adaptive windows cool to 0 on exactly this signal)
            health["micro_batching"] = {
                name: mb.stats()
                for name, mb in self.server.batchers.items()}
        self._json(200, health)

    def _device(self, name: str, thunk):
        """Run an artifact call on the server's single device stream, under
        the per-call watchdog (TimeoutError -> the 503 path below)."""
        return self.server.exec.call(name, thunk,
                                     timeout_s=self.server.call_timeout_s)

    def do_POST(self):
        ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
        self._npz = ctype == self._NPZ
        try:
            n_bytes = int(self.headers.get("Content-Length") or 0)
            if n_bytes > self.server.max_body_bytes:
                # refuse BEFORE reading: a multi-GB body must not be
                # buffered into RAM.  The unread body makes the connection
                # unusable for keep-alive, so close it.
                self.close_connection = True
                self.server.ledger.record(
                    "oversize_body", f"{self.path} Content-Length {n_bytes}")
                return self._json(413, {
                    "error": f"request body {n_bytes} bytes exceeds the "
                             f"{self.server.max_body_bytes}-byte limit"})
            body = self.rfile.read(n_bytes)
            if len(body) < n_bytes:
                # client closed mid-body; don't parse the truncation
                self.close_connection = True
                return self._json(400, {"error": "truncated request body"})
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
        except TimeoutError:
            # stalled client: socket read timed out mid-body.  Record it and
            # re-raise — handle_one_request catches socket.timeout and
            # closes the connection, freeing this thread.
            self.server.ledger.record("client_stall", self.path)
            raise
        except (ValueError, json.JSONDecodeError) as e:
            return self._json(400, {"error": f"bad request body: {e}"})
        srv: ServedDXVAE = self.server.model
        try:
            # only the artifact calls go to the device thread (one stream
            # per process); request parsing and response JSON stay on the
            # handler thread so host-only work never queues another client
            if self.path == "/v1/generate":
                G = self._device("generate", lambda: srv.generate(
                    int(req["n"]), seed=int(req.get("seed", 0)),
                    prior=req.get("prior"),
                    temperature=float(req.get("temperature", 1.0)),
                    valid_only=bool(req.get("valid_only", False))))
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
                    mu, std = self._device("encode",
                                           lambda: srv.encode((X, adj)))
                return self._tensors(200, {"mu": mu, "std": std})
            if self.path == "/v1/decode":
                z = np.asarray(req["z"], np.float32)
                _check_batch("z", z, cfg["size_z"])
                if self.server.batchers:
                    G = self.server.batchers["decode"].submit(z)
                else:
                    G = self._device("decode", lambda: srv.decode(z))
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
                    G = self._device("roundtrip",
                                     lambda: srv.encode_decode((X, adj)))
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
                    # reject BEFORE dispatch: a batched "query" would hold
                    # the device (queuing every other client) for an encode
                    # whose result is discarded
                    raise ValueError(
                        f"search takes exactly one query patch, got {len(X)}")
                mu, _ = self._device("encode", lambda: srv.encode((X, adj)))
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
            # server-side stall (hung artifact call or overloaded micro-batch
            # leader), NOT a bad request — 503 tells clients to retry
            return self._json(503, {"error": str(e)})
        except (ValueError, TypeError, RuntimeError, IndexError) as e:
            return self._json(400, {"error": str(e)})


class _BundleServer(ThreadingHTTPServer):
    """ThreadingHTTPServer that also owns the device thread: closing the
    server shuts the :class:`DeviceExecutor` worker down (tests build many
    servers per process; each must not leak its worker)."""

    def server_close(self):
        super().server_close()
        ex = getattr(self, "exec", None)
        if ex is not None:
            ex.shutdown()


def _warm_buckets(httpd) -> None:
    """Pre-compile every exported function at every bucket with zero inputs,
    so no live request ever pays a first-call compile (minutes on this
    image) or trips the cold-bucket watchdog."""
    srv: ServedDXVAE = httpd.model
    cfg = srv.manifest["cfg"]
    for name, buckets in srv.manifest["functions"].items():
        for b in buckets:
            X = np.zeros((b, cfg["n_nodes"], cfg["size_x"]), np.float32)
            adj = np.zeros((b, cfg["n_nodes"], cfg["n_nodes"]), np.float32)
            z = np.zeros((b, cfg["size_z"]), np.float32)
            thunk = {"encode": lambda: srv.encode((X, adj)),
                     "decode": lambda: srv.decode(z),
                     "roundtrip": lambda: srv.encode_decode((X, adj))}[name]
            t0 = time.perf_counter()
            httpd.exec.call(f"warmup:{name}/{b}", thunk)
            if httpd.verbose:
                print(f"warmed {name}/{b} in "
                      f"{time.perf_counter() - t0:.1f} s", flush=True)
    for mb in (httpd.batchers or {}).values():
        mb._warm = True  # followers drop to the normal timeout immediately


def make_server(bundle_path, host: str = "127.0.0.1", port: int = 0,
                verbose: bool = False,
                index_path=None,
                batch_window_ms: float | None = None,
                adaptive_window: bool = False,
                call_timeout_s: float | None = None,
                read_timeout_s: float | None = 30.0,
                max_body_mb: float = 32.0,
                follower_timeout_s: float = 120.0,
                cold_timeout_s: float = 600.0,
                warmup: bool = False) -> ThreadingHTTPServer:
    """Build (but don't start) an HTTP server over ``bundle_path``.  Port 0
    binds an ephemeral port — read it back from ``server_address``.

    ``index_path`` loads a latent index (CLI ``search --save-index``) and
    enables ``/v1/search``; it must live in the same latent space as the
    bundle (same checkpoint — the latent width is checked at startup).

    ``batch_window_ms`` enables cross-request micro-batching on the tensor
    endpoints (encode/decode/roundtrip): requests arriving within the window
    merge into one artifact call (see :class:`MicroBatcher`).
    ``adaptive_window=True`` opens that window only while the endpoint sees
    same-endpoint concurrency, so lone/mixed traffic stops paying it.

    Hardening knobs: ``call_timeout_s`` (watchdog — a device call running
    past it 503s its client; None disables), ``read_timeout_s`` (stalled
    client sockets; None disables), ``max_body_mb`` (413 above it),
    ``follower_timeout_s``/``cold_timeout_s`` (micro-batch waiters, warm
    vs first-call-per-bucket), ``warmup`` (pre-compile every exported
    bucket before the socket is returned)."""
    httpd = _BundleServer((host, port), _BundleHandler)
    try:  # never leak the bound socket on a failed startup
        httpd.model = ServedDXVAE.load(bundle_path)
        httpd.verbose = verbose
        httpd.index = None
        httpd.batchers = None
        httpd.ledger = ErrorLedger()
        httpd.exec = DeviceExecutor(httpd.ledger,
                                    cold_timeout_s=cold_timeout_s)
        httpd.call_timeout_s = call_timeout_s
        httpd.read_timeout_s = read_timeout_s
        if max_body_mb <= 0:
            raise ValueError(f"non-positive max_body_mb: {max_body_mb}")
        httpd.max_body_bytes = int(max_body_mb * (1 << 20))
        if batch_window_ms is not None:
            if batch_window_ms < 0:
                raise ValueError(f"negative batch window: {batch_window_ms}")
            srv, w = httpd.model, batch_window_ms / 1000.0
            fns = srv.manifest["functions"]
            kw = dict(adaptive=adaptive_window,
                      call_timeout_s=call_timeout_s,
                      follower_timeout_s=follower_timeout_s,
                      cold_timeout_s=cold_timeout_s)

            _slice_graph = lambda G, a, b: G[a:b]
            httpd.batchers = {
                "encode": MicroBatcher(
                    lambda X, adj: srv.encode((X, adj)),
                    lambda out, a, b: (out[0][a:b], out[1][a:b]),
                    httpd.exec.call, w, buckets=fns.get("encode"),
                    name="encode", **kw),
                "decode": MicroBatcher(
                    lambda z: srv.decode(z), _slice_graph,
                    httpd.exec.call, w, buckets=fns.get("decode"),
                    name="decode", **kw),
                "roundtrip": MicroBatcher(
                    lambda X, adj: srv.encode_decode((X, adj)), _slice_graph,
                    httpd.exec.call, w, buckets=fns.get("roundtrip"),
                    name="roundtrip", **kw),
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
        if warmup:
            _warm_buckets(httpd)
    except BaseException:
        httpd.server_close()
        raise
    return httpd


def serve_forever(bundle_path, host: str = "127.0.0.1", port: int = 8000,
                  verbose: bool = True, index_path=None,
                  batch_window_ms: float | None = None,
                  adaptive_window: bool = False,
                  call_timeout_s: float | None = None,
                  warmup: bool = False) -> None:
    httpd = make_server(bundle_path, host, port, verbose=verbose,
                        index_path=index_path,
                        batch_window_ms=batch_window_ms,
                        adaptive_window=adaptive_window,
                        call_timeout_s=call_timeout_s, warmup=warmup)
    h, p = httpd.server_address[:2]
    print(f"serving {bundle_path} at http://{h}:{p} "
          f"(functions: {sorted(httpd.model.manifest['functions'])})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
