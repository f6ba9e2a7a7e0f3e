"""AOT serving bundles (dxvae_tpu/serving.py, beyond-reference).

jax.export lowers the inference surface to StableHLO at fixed batch
buckets with weights baked in; ServedDXVAE pads requests up to a bucket
and slices back.  The contract under test: served == direct, exactly.
"""

import numpy as np
import pytest

from dxvae_tpu.api import DXVAE
from dxvae_tpu.serving import BUNDLE_VERSION, ServedDXVAE, export_bundle


def test_package_level_serving_exports():
    """The serving surface is reachable from the package root (lazily, so
    data-only users still don't pay the jax import)."""
    import dxvae_tpu

    assert dxvae_tpu.ServedDXVAE is ServedDXVAE
    assert dxvae_tpu.export_bundle is export_bundle
    assert "ServedDXVAE" in dxvae_tpu.__all__


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    model = DXVAE(size_H=64, size_Z=16, seed=0, unroll=False)
    path = tmp_path_factory.mktemp("serving") / "tiny.bundle.npz"
    manifest = export_bundle(model, path, batch_sizes=(4, 8),
                             platforms=("cpu",))
    return model, path, manifest


def test_manifest_and_artifact(bundle):
    model, path, manifest = bundle
    assert path.exists()
    assert manifest["bundle_version"] == BUNDLE_VERSION
    assert manifest["functions"] == {f: [4, 8]
                                     for f in ("encode", "decode", "roundtrip")}
    assert manifest["cfg"]["size_h"] == 64 and manifest["cfg"]["size_z"] == 16


def test_served_decode_matches_direct_with_padding(bundle):
    """Batch 3 pads to bucket 4; batch 8 hits its bucket exactly — both must
    equal the live model bit-for-bit (same weights, same platform)."""
    model, path, _ = bundle
    served = ServedDXVAE.load(path)
    for n in (3, 8):
        z = np.random.default_rng(n).standard_normal((n, 16)).astype(np.float32)
        G_served = served.decode(z)
        G_direct = model.decode(z)
        np.testing.assert_array_equal(G_served.params, G_direct.params)
        np.testing.assert_array_equal(G_served.adj, G_direct.adj)
        np.testing.assert_array_equal(G_served.X, G_direct.X)


def test_served_encode_and_roundtrip_match_direct(bundle):
    model, path, _ = bundle
    served = ServedDXVAE.load(path)
    G = model.generate(5)
    mu_s, std_s = served.encode(G)
    mu_d, std_d = model.encode(G)
    np.testing.assert_array_equal(mu_s, np.asarray(mu_d))
    np.testing.assert_array_equal(std_s, np.asarray(std_d))
    R_served = served.encode_decode(G)
    R_direct = model.encode_decode(G)
    np.testing.assert_array_equal(R_served.params, R_direct.params)
    np.testing.assert_array_equal(R_served.adj, R_direct.adj)


def test_served_rejects_oversize_and_missing_function(bundle):
    model, path, _ = bundle
    served = ServedDXVAE.load(path)
    with pytest.raises(ValueError, match="largest exported bucket"):
        served.decode(np.zeros((9, 16), np.float32))
    served.manifest["functions"].pop("encode")
    with pytest.raises(ValueError, match="no 'encode'"):
        served.encode((np.zeros((1, 7, 27), np.float32),
                       np.zeros((1, 7, 7), np.float32)))


def test_export_rejects_bad_args(bundle):
    model, _, _ = bundle
    with pytest.raises(ValueError, match="unknown functions"):
        export_bundle(model, "/tmp/x.npz", functions=("generate",))
    with pytest.raises(ValueError, match="positive"):
        export_bundle(model, "/tmp/x.npz", batch_sizes=())


def test_served_generate_with_bundled_prior(bundle, tmp_path, dataset):
    """A model with a fitted prior exports it into the bundle; the served
    generate() samples the GMM with host-side NumPy (fitted is the default
    when present) and T=0 lands exactly on component means."""
    model, _, _ = bundle
    model.fit_prior(dataset[:32], n_components=3, samples_per_patch=2,
                    n_iters=5)
    path = tmp_path / "with_prior.npz"
    export_bundle(model, path, batch_sizes=(4,), platforms=("cpu",))
    served = ServedDXVAE.load(path)
    assert served.manifest["has_prior"]
    G = served.generate(4, seed=1)  # defaults to the bundled fitted prior
    assert G.params.shape == (4, 7, 21)
    # T=0 z's are component means: decode must equal decoding those means
    lw = served._blobs["prior/log_weights"]
    means = served._blobs["prior/means"]
    comps = np.random.default_rng(7).choice(
        len(lw), size=4, p=np.exp(lw) / np.exp(lw).sum())
    G0 = served.generate(4, seed=7, temperature=0.0)
    Gm = served.decode(means[comps].astype(np.float32))
    np.testing.assert_array_equal(G0.params, Gm.params)
    # standard prior still reachable; unknown prior rejected
    served.generate(2, prior="standard")
    with pytest.raises(ValueError, match="unknown prior"):
        served.generate(2, prior="gmm")
    # prior-less bundle: fitted raises, default falls back to standard
    fitted = model.prior
    try:
        model.prior = None
        bare = tmp_path / "bare.npz"
        export_bundle(model, bare, batch_sizes=(4,), platforms=("cpu",))
    finally:
        model.prior = fitted
    served_bare = ServedDXVAE.load(bare)
    with pytest.raises(ValueError, match="no fitted prior"):
        served_bare.generate(2, prior="fitted")
    assert served_bare.generate(2).params.shape == (2, 7, 21)


def test_served_generate_valid_only(bundle, monkeypatch):
    """Served valid_only mirrors DXVAE.generate: rounds are capped at the
    largest exported decode bucket, invalid topologies are rejected, alg
    bytes are synced.  Decode is stubbed for the success path (the tiny
    fixture model is untrained, validity ~0); the exhaustion path runs the
    real artifact."""
    from dxvae_tpu.data.algorithms import ALGO_ADJ
    from dxvae_tpu.graph import GraphBatch

    _, path, _ = bundle
    served = ServedDXVAE.load(path)
    with pytest.raises(RuntimeError, match="valid"):
        served.generate(2, valid_only=True, max_rounds=2)

    calls = []

    def fake_decode(z):
        B = len(np.asarray(z))
        calls.append(B)
        adj = np.ones((B, 7, 7), np.float32)
        adj[0] = ALGO_ADJ[17]
        P = np.zeros((B, 7, 21), np.int32)
        return GraphBatch(X=np.zeros((B, 7, 27), np.float32), params=P, adj=adj)

    monkeypatch.setattr(served, "decode", fake_decode)
    G = served.generate(2, valid_only=True)  # 1 valid per round -> 2 rounds
    assert len(G) == 2 and (G.params[:, 0, 18] == 17).all()
    np.testing.assert_array_equal(G.adj, ALGO_ADJ[[17, 17]].astype(G.adj.dtype))
    assert calls == [8, 8]  # rounds capped at the largest exported bucket


def test_serve_cli_generate_and_roundtrip(bundle, dataset, tmp_path, capsys):
    """The full deployment loop from the CLI: `serve --op generate` samples
    patches from the artifact and writes a parseable 32-voice bank;
    `serve --op roundtrip` pushes a dataset patch through the exported
    encode->decode program (no checkpoint flag anywhere)."""
    from dxvae_tpu.cli import main
    from dxvae_tpu.data.sysex import read_syx, unpack_voices

    _, path, _ = bundle
    out = tmp_path / "served_bank.syx"
    assert main(["serve", "--bundle", str(path), "--n", "3", "--seed", "5",
                 "--out", str(out), "--quiet"]) == 0
    P, X, adj = unpack_voices(read_syx(out))
    assert P.shape == (32, 7, 21)  # bank padded to 32 voices
    # prior mode name is honored (tiny bundle has no fitted prior)
    with pytest.raises(ValueError, match="no fitted prior"):
        main(["serve", "--bundle", str(path), "--prior", "fitted", "--quiet"])
    rt_out = tmp_path / "served_rt.syx"
    assert main(["serve", "--bundle", str(path), "--op", "roundtrip",
                 "--raw-dir", str(dataset.raw_dir), "--index", "1",
                 "--out", str(rt_out)]) == 0
    captured = capsys.readouterr().out
    assert "[ Decode (served) ]" in captured
    # --op roundtrip honors --out with the same padded-bank convention
    assert f"wrote {rt_out}" in captured
    assert read_syx(rt_out).shape == (32, 128)


def test_http_serving_endpoints(bundle, tmp_path):
    """The stdlib HTTP frontend over a bundle: health reports the bucket
    table, generate/decode responses equal the direct served model exactly,
    format='syx' returns a parseable framed bank, and client errors map to
    4xx JSON instead of crashing the server."""
    import base64
    import http.client
    import json
    import threading

    from dxvae_tpu.data.sysex import read_syx
    from dxvae_tpu.serving_http import make_server

    _, path, _ = bundle
    httpd = make_server(path)  # port 0 = ephemeral
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    direct = ServedDXVAE.load(path)
    try:
        host, port = httpd.server_address[:2]

        def rpc(method, route, body=None):
            conn = http.client.HTTPConnection(host, port, timeout=600)
            try:
                conn.request(method, route,
                             None if body is None else json.dumps(body),
                             {"Content-Type": "application/json"})
                r = conn.getresponse()
                return r.status, json.loads(r.read() or b"{}")
            finally:
                conn.close()

        st, health = rpc("GET", "/healthz")
        assert st == 200 and health["ok"]
        assert health["functions"]["decode"] == [4, 8]
        assert health["has_prior"] is False
        assert health["cfg"]["size_z"] == 16  # the client's tensor contract

        st, gen = rpc("POST", "/v1/generate", {"n": 3, "seed": 5})
        assert st == 200
        G = direct.generate(3, seed=5)
        np.testing.assert_array_equal(np.asarray(gen["params"]), G.params)
        np.testing.assert_array_equal(np.asarray(gen["adj"]), G.adj)

        z = np.zeros((2, 16), np.float32)
        z[0, 0] = 1.0
        st, dec = rpc("POST", "/v1/decode", {"z": z.tolist()})
        assert st == 200
        D = direct.decode(z)
        np.testing.assert_array_equal(np.asarray(dec["params"]), D.params)

        st, rt = rpc("POST", "/v1/roundtrip",
                     {"X": D.X.tolist(), "adj": D.adj.tolist()})
        assert st == 200
        R = direct.encode_decode((D.X, D.adj))
        np.testing.assert_array_equal(np.asarray(rt["params"]), R.params)
        st, enc = rpc("POST", "/v1/encode",
                      {"X": D.X.tolist(), "adj": D.adj.tolist()})
        mu, _ = direct.encode((D.X, D.adj))
        np.testing.assert_array_equal(np.asarray(enc["mu"], np.float32), mu)

        st, bank = rpc("POST", "/v1/generate",
                       {"n": 2, "seed": 1, "format": "syx"})
        assert st == 200
        raw = base64.b64decode(bank["syx_base64"])
        assert len(raw) == 4104 and raw[0] == 0xF0 and raw[-1] == 0xF7
        f = tmp_path / "served_http.syx"
        f.write_bytes(raw)
        assert read_syx(f).shape == (32, 128)  # padded 2 -> 32 voices

        st, err = rpc("POST", "/v1/nope", {})
        assert st == 404
        st, err = rpc("POST", "/v1/generate", {})
        assert st == 400 and "'n'" in err["error"]
        # malformed bodies: truncated JSON and a non-object both 400 cleanly
        conn = http.client.HTTPConnection(host, port, timeout=600)
        conn.request("POST", "/v1/generate", b'{"n": 3',
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        assert "bad request body" in json.loads(r.read())["error"]
        conn.close()
        st, err = rpc("POST", "/v1/generate", [1, 2, 3])
        assert st == 400 and "JSON object" in err["error"]
        st, err = rpc("POST", "/v1/decode",
                      {"z": np.zeros((9, 16)).tolist()})
        assert st == 400 and "bucket" in err["error"]
        st, err = rpc("GET", "/other")
        assert st == 404
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_serve_http_rejects_malformed_address(bundle):
    """--http validates [HOST]:PORT up front with a friendly error instead
    of an int() traceback (or silently mis-splitting a colonless host)."""
    from dxvae_tpu.cli import main

    _, path, _ = bundle
    for bad in ("127.0.0.1", "localhost", ":", "host:"):
        with pytest.raises(SystemExit, match="HOST"):
            main(["serve", "--bundle", str(path), "--http", bad])
    # and --batch-window-ms without --http: one-shot ops have nothing to merge
    with pytest.raises(SystemExit, match="only applies to --http"):
        main(["serve", "--bundle", str(path), "--op", "generate",
              "--batch-window-ms", "5"])


def test_http_concurrent_clients(bundle):
    """Parallel clients hitting mixed routes all succeed and get the same
    answers as a serial client: the device lock serializes artifact calls
    per the one-stream contract while the threaded frontend handles the
    connections (ThreadingHTTPServer)."""
    import http.client
    import json
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from dxvae_tpu.serving_http import make_server

    _, path, _ = bundle
    httpd = make_server(path)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        host, port = httpd.server_address[:2]

        def gen(seed):
            conn = http.client.HTTPConnection(host, port, timeout=600)
            try:
                conn.request("POST", "/v1/generate",
                             json.dumps({"n": 2, "seed": seed}),
                             {"Content-Type": "application/json"})
                r = conn.getresponse()
                return r.status, json.loads(r.read())
            finally:
                conn.close()

        gen(0)  # warm the artifact cache before fanning out
        with ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(gen, [s % 4 for s in range(24)]))
        assert all(st == 200 for st, _ in results)
        # determinism under concurrency: same seed -> same patches, and
        # every concurrent answer equals the serial one
        by_seed = {}
        for s, (st, out) in zip([x % 4 for x in range(24)], results):
            by_seed.setdefault(s, []).append(out)
        for seed, outs in by_seed.items():
            serial = gen(seed)[1]
            for out in outs:
                assert out == serial
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_search_endpoint(bundle, tmp_path):
    """/v1/search over a loaded latent index: a tensor query returns itself
    at distance ~0 with provenance, a base64 bank query round-trips through
    the codec to the same hit, a server without an index 400s the route,
    and a latent-width-mismatched index is rejected at startup."""
    import base64
    import http.client
    import json
    import threading

    from dxvae_tpu.serving import bank_bytes
    from dxvae_tpu.serving_http import make_server

    model, path, _ = bundle
    served = ServedDXVAE.load(path)
    G = model.generate(4)  # 4-patch corpus in the bundle's own space
    mu, _ = served.encode(G)
    np.savez(tmp_path / "idx.npz", mu=mu,
             names=np.asarray([f"PATCH{i:05d}" for i in range(4)]),
             bank=np.asarray(["mem://corpus"] * 4),
             voice=np.arange(4, dtype=np.int32),
             alg=np.asarray(G.params[:, 0, 18], np.int32),
             checkpoint=np.asarray(""))
    httpd = make_server(path, index_path=tmp_path / "idx.npz")
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        host, port = httpd.server_address[:2]

        def rpc(method, route, body=None):
            conn = http.client.HTTPConnection(host, port, timeout=600)
            try:
                conn.request(method, route,
                             None if body is None else json.dumps(body),
                             {"Content-Type": "application/json"})
                r = conn.getresponse()
                return r.status, json.loads(r.read() or b"{}")
            finally:
                conn.close()

        st, h = rpc("GET", "/healthz")
        assert st == 200 and h["has_search_index"] is True

        st, out = rpc("POST", "/v1/search",
                      {"X": G.X[2:3].tolist(), "adj": G.adj[2:3].tolist(),
                       "k": 2})
        assert st == 200 and len(out["hits"]) == 2
        top = out["hits"][0]
        assert top["idx"] == 2 and top["distance"] < 1e-5
        assert top["name"] == "PATCH00002" and top["voice"] == 2

        raw = bank_bytes(G[1])  # query by bank: patch 1 in voice slot 0
        st, out = rpc("POST", "/v1/search",
                      {"syx_base64": base64.b64encode(raw).decode(),
                       "voice": 0, "k": 1})
        assert st == 200 and out["hits"][0]["idx"] == 1

        st, err = rpc("POST", "/v1/search", {"X": [], "adj": [],
                                             "metric": "dot"})
        assert st == 400
    finally:
        httpd.shutdown()
        httpd.server_close()

    bare = make_server(path)  # no index: the route must 400, not crash
    threading.Thread(target=bare.serve_forever, daemon=True).start()
    try:
        host, port = bare.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=600)
        conn.request("POST", "/v1/search",
                     json.dumps({"X": G.X[:1].tolist(),
                                 "adj": G.adj[:1].tolist()}),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        assert "search index" in json.loads(r.read())["error"]
        conn.close()
    finally:
        bare.shutdown()
        bare.server_close()

    np.savez(tmp_path / "bad.npz", mu=np.zeros((4, 8), np.float32),
             names=np.asarray(["x"] * 4), bank=np.asarray(["y"] * 4),
             voice=np.zeros(4, np.int32), alg=np.zeros(4, np.int32))
    with pytest.raises(ValueError, match="latent width"):
        make_server(path, index_path=tmp_path / "bad.npz")


def test_bundle_loads_without_model_code(bundle, tmp_path):
    """The deployment story: a fresh process with ONLY jax (no dxvae_tpu
    import) can deserialize and run a bundle's decode artifact."""
    import subprocess
    import sys

    model, path, _ = bundle
    code = f"""
import jax; jax.config.update('jax_platforms', 'cpu')
import json
import numpy as np
from jax import export
with np.load({str(path)!r}) as f:
    manifest = json.loads(bytes(f['manifest']).decode())
    art = export.deserialize(bytes(f['decode/4']))
z = np.zeros((4, manifest['cfg']['size_z']), np.float32)
X, P, adj = art.call(z)
assert X.shape == (4, 7, 27) and adj.shape == (4, 7, 7)
print('SERVED_OK')
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SERVED_OK" in r.stdout
    # and the bundle refuses a future format version
    import json as _json

    with np.load(path) as f:
        blobs = {k: f[k] for k in f.files}
    man = _json.loads(bytes(blobs["manifest"]).decode())
    man["bundle_version"] = BUNDLE_VERSION + 1
    blobs["manifest"] = np.frombuffer(_json.dumps(man).encode(), np.uint8)
    newer = tmp_path / "newer.npz"
    np.savez(newer, **blobs)
    with pytest.raises(ValueError, match="newer"):
        ServedDXVAE.load(newer)


# ---------------------------------------------------------------------------
# cross-request micro-batching (serving_http.MicroBatcher)
# ---------------------------------------------------------------------------

def test_micro_batcher_merges_and_slices():
    """Concurrent submits inside one window merge into ONE underlying call,
    and every caller gets exactly its own rows back."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from dxvae_tpu.serving_http import MicroBatcher

    calls = []

    def fn(x):
        calls.append(len(x))
        return x * 2.0

    mb = MicroBatcher(fn, lambda out, a, b: out[a:b],
                      threading.Lock(), window_s=0.3, max_batch=None)
    barrier = threading.Barrier(4)

    def client(i):
        barrier.wait()
        x = np.full((i + 1, 3), float(i), np.float32)
        return mb.submit(x)

    with ThreadPoolExecutor(max_workers=4) as ex:
        outs = list(ex.map(client, range(4)))
    for i, out in enumerate(outs):
        np.testing.assert_array_equal(out, np.full((i + 1, 3), 2.0 * i))
    assert mb.n_requests == 4
    assert mb.n_calls < 4            # merging actually happened
    assert sum(calls) == 1 + 2 + 3 + 4


def test_micro_batcher_chunks_at_max_batch_and_propagates_errors():
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from dxvae_tpu.serving_http import MicroBatcher

    calls = []

    def fn(x):
        calls.append(len(x))
        if np.any(x < 0):
            raise ValueError("poisoned batch")
        return x + 1.0

    mb = MicroBatcher(fn, lambda out, a, b: out[a:b],
                      threading.Lock(), window_s=0.3, max_batch=2)
    barrier = threading.Barrier(3)

    def client(i):
        barrier.wait()
        return mb.submit(np.full((1, 2), float(i), np.float32))

    with ThreadPoolExecutor(max_workers=3) as ex:
        outs = list(ex.map(client, range(3)))
    for i, out in enumerate(outs):
        np.testing.assert_array_equal(out, np.full((1, 2), i + 1.0))
    assert all(c <= 2 for c in calls)    # the bucket cap was respected

    # a failing merged call raises in EVERY waiting client (not a timeout)
    barrier = threading.Barrier(2)

    def bad(i):
        barrier.wait()
        return mb.submit(np.full((1, 2), -1.0, np.float32))

    with ThreadPoolExecutor(max_workers=2) as ex:
        futs = [ex.submit(bad, i) for i in range(2)]
        for f in futs:
            with pytest.raises(ValueError, match="poisoned"):
                f.result(timeout=30)


def test_http_micro_batching_end_to_end(bundle):
    """serve --http --batch-window-ms: concurrent single-patch /v1/decode
    requests merge into fewer artifact calls and still return exactly the
    direct model's decode."""
    import http.client
    import json
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from dxvae_tpu.serving_http import make_server

    model, path, _ = bundle
    # a generous window: on the loaded 1-core test VM the 4 client threads
    # need real time to connect+POST before the leader's window closes
    httpd = make_server(path, batch_window_ms=1000.0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        host, port = httpd.server_address[:2]
        rng = np.random.default_rng(0)
        zs = rng.standard_normal((4, 1, 16)).astype(np.float32)

        def decode(i):
            conn = http.client.HTTPConnection(host, port, timeout=600)
            try:
                conn.request("POST", "/v1/decode",
                             json.dumps({"z": zs[i].tolist()}),
                             {"Content-Type": "application/json"})
                r = conn.getresponse()
                return r.status, json.loads(r.read())
            finally:
                conn.close()

        decode(0)  # warm the artifact cache so the timed window is honest
        before = httpd.batchers["decode"].n_calls
        with ThreadPoolExecutor(max_workers=4) as ex:
            results = list(ex.map(decode, range(4)))
        assert all(st == 200 for st, _ in results)
        merged_calls = httpd.batchers["decode"].n_calls - before
        assert merged_calls < 4, "no cross-request merging happened"
        # /healthz exposes the merge counters for observability
        conn = http.client.HTTPConnection(host, port, timeout=60)
        try:
            conn.request("GET", "/healthz")
            h = json.loads(conn.getresponse().read())
        finally:
            conn.close()
        dec = h["micro_batching"]["decode"]
        assert dec["requests"] >= 5 and dec["calls"] < dec["requests"]
        assert dec["window_ms"] == 1000.0
        G = model.decode(zs.reshape(4, 16))
        for i, (_, out) in enumerate(results):
            np.testing.assert_array_equal(
                np.asarray(out["params"]), np.asarray(G.params[i:i + 1]))
            np.testing.assert_array_equal(
                np.asarray(out["adj"]), np.asarray(G.adj[i:i + 1]))
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_micro_batching_rejects_bad_shapes_alone(bundle):
    """Per-request shape validation runs BEFORE submit(): a malformed body
    arriving inside the window gets its own 400 while concurrently merged
    valid requests still succeed (no poisoned np.concatenate)."""
    import http.client
    import json
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from dxvae_tpu.serving_http import make_server

    model, path, _ = bundle
    httpd = make_server(path, batch_window_ms=500.0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        host, port = httpd.server_address[:2]

        def post(body):
            conn = http.client.HTTPConnection(host, port, timeout=600)
            try:
                conn.request("POST", "/v1/decode", json.dumps(body),
                             {"Content-Type": "application/json"})
                r = conn.getresponse()
                return r.status, json.loads(r.read())
            finally:
                conn.close()

        good = {"z": np.zeros((1, 16), np.float32).tolist()}
        post(good)  # warm
        bads = [{"z": [[0.0] * 15]},   # wrong latent width
                {"z": [0.0] * 16},     # 1-D
                {"z": []}]             # empty batch
        with ThreadPoolExecutor(max_workers=4) as ex:
            futs = [ex.submit(post, good)] + [ex.submit(post, b)
                                              for b in bads]
            results = [f.result(timeout=120) for f in futs]
        assert results[0][0] == 200
        for st, body in results[1:]:
            assert st == 400 and "shape" in body["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_npz_wire_format(bundle):
    """Binary .npz bodies on the tensor endpoints: response is an .npz of
    the same keys as the JSON form and matches the direct model exactly;
    non-tensor routes and unreadable bodies get JSON 400s."""
    import http.client
    import io
    import json
    import threading

    from dxvae_tpu.serving_http import make_server

    model, path, _ = bundle
    httpd = make_server(path)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        host, port = httpd.server_address[:2]

        def post(route, body, ctype="application/x-npz"):
            conn = http.client.HTTPConnection(host, port, timeout=600)
            try:
                conn.request("POST", route, body, {"Content-Type": ctype})
                r = conn.getresponse()
                return r.status, r.getheader("Content-Type"), r.read()
            finally:
                conn.close()

        z = np.random.default_rng(3).standard_normal((5, 16)).astype(np.float32)
        buf = io.BytesIO()
        np.savez(buf, z=z)
        st, ct, raw = post("/v1/decode", buf.getvalue())
        assert st == 200 and ct == "application/x-npz"
        with np.load(io.BytesIO(raw)) as f:
            out = {k: f[k] for k in f.files}
        assert set(out) == {"X", "params", "adj"}
        G = model.decode(z)
        np.testing.assert_array_equal(out["params"], np.asarray(G.params))
        np.testing.assert_array_equal(out["adj"], np.asarray(G.adj))

        # encode over npz too, float64 input coerced like the JSON path
        buf = io.BytesIO()
        np.savez(buf, X=np.asarray(G.X, np.float64),
                 adj=np.asarray(G.adj, np.float64))
        st, ct, raw = post("/v1/encode", buf.getvalue())
        assert st == 200 and ct == "application/x-npz"
        with np.load(io.BytesIO(raw)) as f:
            mu_d, _ = model.encode(G)
            np.testing.assert_array_equal(f["mu"], np.asarray(mu_d))

        # npz on a non-tensor route -> 400, JSON error
        st, ct, raw = post("/v1/generate", buf.getvalue())
        assert st == 400 and ct == "application/json"
        assert "tensor endpoints" in json.loads(raw)["error"]

        # garbage bytes -> 400, not a crash
        st, _, raw = post("/v1/decode", b"\x00not-a-zip")
        assert st == 400 and "npz" in json.loads(raw)["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_soak_harness_micro_run(bundle):
    """scripts/soak_serving.py end to end at micro scale: mixed-endpoint
    closed-loop load finishes cleanly with zero server-side errors and a
    well-formed percentile report."""
    from scripts._lib import load_sibling

    _, path, _ = bundle
    soak = load_sibling("soak_serving")
    rep = soak.run_soak(path, seconds=2.0, clients=3, wire="npz",
                        batch_window_ms=50.0)
    assert rep["errors"] == {"4xx": 0, "5xx": 0, "transport": 0}
    assert rep["requests_ok"] >= 1
    assert set(rep["endpoints"]) == {"/v1/decode", "/v1/roundtrip",
                                     "/v1/encode", "/v1/generate"}
    done = [e for e in rep["endpoints"].values() if e["n"]]
    assert done and all(e["p50_ms"] > 0 for e in done)
    assert "micro_batching" in rep  # window was on -> counters reported


# ---------------------------------------------------------------------------
# frontend hardening: body caps, stalled clients, the call watchdog
# (serving_http.DeviceExecutor / ErrorLedger), adaptive windows
# ---------------------------------------------------------------------------

def test_device_executor_watchdog_and_ledger():
    """A thunk that outlives its timeout raises TimeoutError in the caller
    (the 503 path) and lands in the ledger twice: once when the watchdog
    fires, once when the abandoned call eventually completes.  Cold names
    get cold_timeout_s; warm names the caller's timeout."""
    import time

    from dxvae_tpu.serving_http import DeviceExecutor, ErrorLedger

    ledger = ErrorLedger()
    ex = DeviceExecutor(ledger, cold_timeout_s=0.2)
    try:
        assert ex.call("ok", lambda: 41 + 1, timeout_s=5.0) == 42
        t0 = time.perf_counter()
        with pytest.raises(TimeoutError, match="still running"):
            ex.call("slow", lambda: time.sleep(0.5) or "late",
                    timeout_s=0.02)  # cold -> escalated to 0.2
        assert 0.15 <= time.perf_counter() - t0 < 0.45
        time.sleep(0.7)  # let the abandoned call finish on the worker
        snap = ledger.snapshot()
        kinds = [e["kind"] for e in snap["recent"]]
        assert "call_timeout" in kinds and "late_completion" in kinds
        # errors propagate as themselves, not timeouts
        def boom():
            raise RuntimeError("device exploded")
        with pytest.raises(RuntimeError, match="exploded"):
            ex.call("boom", boom, timeout_s=5.0)
        # "slow" completed once (late), so it is warm: tight timeout applies
        t0 = time.perf_counter()
        with pytest.raises(TimeoutError):
            ex.call("slow", lambda: time.sleep(0.5), timeout_s=0.02)
        assert time.perf_counter() - t0 < 0.15
        time.sleep(0.7)
    finally:
        ex.shutdown()


def test_micro_batcher_splits_merges_along_bucket_boundaries():
    """A merged batch is split to minimize dispatched bucket rows plus a
    fixed per-call overhead (MicroBatcher.OVERHEAD_ROWS) over the exported
    bucket table: 9 singles over (1,8,32) -> 8+1, not one 32-padded call;
    8 singles stay ONE call; a few singles prefer one half-empty bucket-8
    call over per-request dispatches; and a request beyond the largest
    bucket is isolated so only its sender sees the overflow error."""
    import threading

    from dxvae_tpu.serving_http import MicroBatcher

    mb = MicroBatcher(lambda x: x, lambda out, a, b: out[a:b],
                      threading.Lock(), buckets=(1, 8, 32))

    def sizes(ns):
        chunks = mb._chunks([{"n": n} for n in ns])
        return [sum(it["n"] for it in c) for c in chunks]

    assert sizes([1] * 9) == [8, 1]        # 9 padded rows, not 32
    assert sizes([1] * 8) == [8]           # tie on rows -> one call
    assert sizes([5, 9]) == [14]           # 32 padded rows < 8+32 split
    assert sizes([1] * 3) == [3]           # 8-bucket, one call
    assert sizes([40]) == [40]             # oversize isolated (errors alone)
    assert sizes([40, 1]) == [40, 1]
    assert sizes([8, 8, 8, 8]) == [32]     # exact large bucket, one call
    assert sizes([8, 8, 8, 8, 1]) == [32, 1]


def test_micro_batcher_adaptive_window():
    """adaptive=True: a lone request pays ~none of the window (the endpoint
    is cold); once the endpoint is hot, concurrent requests still merge."""
    import threading
    import time
    from concurrent.futures import ThreadPoolExecutor

    from dxvae_tpu.serving_http import MicroBatcher

    mb = MicroBatcher(lambda x: x * 2.0, lambda out, a, b: out[a:b],
                      threading.Lock(), window_s=0.5, adaptive=True)
    x = np.ones((1, 2), np.float32)
    t0 = time.perf_counter()
    np.testing.assert_array_equal(mb.submit(x), x * 2.0)
    assert time.perf_counter() - t0 < 0.25, \
        "cold adaptive window must not sleep out the full window"
    assert mb.stats()["adaptive"] is True

    # heat the endpoint: now a leader waits, and concurrent submits merge
    mb._hot_until = time.monotonic() + 30.0
    before = mb.n_calls
    barrier = threading.Barrier(2)

    def client(i):
        barrier.wait()
        return mb.submit(np.full((1, 2), float(i), np.float32))

    with ThreadPoolExecutor(max_workers=2) as ex:
        outs = list(ex.map(client, range(2)))
    for i, out in enumerate(outs):
        np.testing.assert_array_equal(out, np.full((1, 2), 2.0 * i))
    assert mb.n_calls - before == 1, "hot window stopped merging"
    assert mb.stats()["window_hot"] is True


def test_http_oversize_body_is_413(bundle):
    """A request claiming a body over max_body_mb is refused (413) BEFORE
    the body is read, lands in the healthz error ledger, and the server
    keeps serving."""
    import http.client
    import json
    import threading

    from dxvae_tpu.serving_http import make_server

    _, path, _ = bundle
    httpd = make_server(path, max_body_mb=0.001)  # ~1 KB cap
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        host, port = httpd.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=60)
        conn.putrequest("POST", "/v1/decode")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", str(1 << 30))  # 1 GB claim
        conn.endheaders()
        r = conn.getresponse()
        body = json.loads(r.read())
        assert r.status == 413 and "exceeds" in body["error"]
        conn.close()

        # the server is still healthy and records the event
        conn = http.client.HTTPConnection(host, port, timeout=60)
        conn.request("GET", "/healthz")
        h = json.loads(conn.getresponse().read())
        conn.close()
        assert h["ok"] and h["errors"]["count"] >= 1
        assert any(e["kind"] == "oversize_body" for e in h["errors"]["recent"])

        # a small request still works
        conn = http.client.HTTPConnection(host, port, timeout=600)
        conn.request("POST", "/v1/decode",
                     json.dumps({"z": np.zeros((1, 16)).tolist()}),
                     {"Content-Type": "application/json"})
        assert conn.getresponse().status == 200
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_stalled_client_frees_its_thread(bundle):
    """A client that sends headers then goes silent mid-body is dropped by
    the read timeout (freeing the handler thread) instead of pinning it
    forever; normal clients are unaffected and the stall is ledgered."""
    import http.client
    import json
    import socket
    import threading
    import time

    from dxvae_tpu.serving_http import make_server

    _, path, _ = bundle
    httpd = make_server(path, read_timeout_s=0.5)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        host, port = httpd.server_address[:2]
        # raw socket: claim a 1000-byte body, send 8 bytes, stall
        s = socket.create_connection((host, port), timeout=30)
        s.sendall(b"POST /v1/decode HTTP/1.1\r\n"
                  b"Host: x\r\nContent-Type: application/json\r\n"
                  b"Content-Length: 1000\r\n\r\n" + b'{"z": [[')
        t0 = time.perf_counter()
        got = s.recv(4096)  # server must hang up on us, promptly
        assert time.perf_counter() - t0 < 5.0
        assert got == b"" or b"HTTP/1.1" in got
        s.close()

        # normal request still served; the stall shows on the ledger
        conn = http.client.HTTPConnection(host, port, timeout=600)
        conn.request("POST", "/v1/decode",
                     json.dumps({"z": np.zeros((1, 16)).tolist()}),
                     {"Content-Type": "application/json"})
        assert conn.getresponse().status == 200
        conn.close()
        conn = http.client.HTTPConnection(host, port, timeout=60)
        conn.request("GET", "/healthz")
        h = json.loads(conn.getresponse().read())
        conn.close()
        assert any(e["kind"] == "client_stall" for e in h["errors"]["recent"])
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_call_watchdog_503(bundle):
    """An artifact call that hangs past call_timeout_s turns into a 503 for
    its client plus an error-ledger entry — instead of a silently pinned
    handler (the r3 soak saw 16 s device stalls reach clients raw)."""
    import http.client
    import json
    import threading
    import time

    from dxvae_tpu.serving_http import make_server

    _, path, _ = bundle
    httpd = make_server(path, call_timeout_s=0.3)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        host, port = httpd.server_address[:2]

        def decode():
            conn = http.client.HTTPConnection(host, port, timeout=600)
            try:
                conn.request("POST", "/v1/decode",
                             json.dumps({"z": np.zeros((1, 16)).tolist()}),
                             {"Content-Type": "application/json"})
                r = conn.getresponse()
                return r.status, json.loads(r.read())
            finally:
                conn.close()

        st, _ = decode()   # warms the "decode" name on the executor
        assert st == 200

        real = httpd.model.decode
        httpd.model.decode = lambda z: (time.sleep(1.5), real(z))[1]
        st, body = decode()
        assert st == 503 and "still running" in body["error"]
        httpd.model.decode = real

        conn = http.client.HTTPConnection(host, port, timeout=60)
        conn.request("GET", "/healthz")
        h = json.loads(conn.getresponse().read())
        conn.close()
        assert any(e["kind"] == "call_timeout" for e in h["errors"]["recent"])
        time.sleep(1.5)  # the abandoned call drains off the device thread
        st, _ = decode()  # and the server recovers
        assert st == 200
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_make_server_warmup_precompiles_buckets(bundle):
    """warmup=True pre-executes every exported function at every bucket, so
    the executor is warm (tight watchdog timeouts apply immediately) and
    micro-batch followers skip the cold-bucket grace."""
    from dxvae_tpu.serving_http import make_server

    _, path, manifest = bundle
    httpd = make_server(path, batch_window_ms=5.0, warmup=True)
    try:
        want = {f"warmup:{name}/{b}"
                for name, bs in manifest["functions"].items() for b in bs}
        assert want <= httpd.exec._warm_names
        assert all(mb._warm for mb in httpd.batchers.values())
    finally:
        httpd.server_close()


def test_serve_cli_rejects_http_only_flags(bundle):
    """--warmup/--call-timeout-s/--adaptive-window are HTTP-server knobs;
    one-shot mode rejects them, and --adaptive-window needs a window."""
    from dxvae_tpu.cli import main

    _, path, _ = bundle
    with pytest.raises(SystemExit, match="--warmup"):
        main(["serve", "--bundle", str(path), "--op", "generate", "--warmup"])
    with pytest.raises(SystemExit, match="--call-timeout-s"):
        main(["serve", "--bundle", str(path), "--call-timeout-s", "5"])
    with pytest.raises(SystemExit, match="needs --batch-window-ms"):
        main(["serve", "--bundle", str(path), "--http", ":0",
              "--adaptive-window"])


def test_soak_harness_fault_injection_micro(bundle):
    """scripts/soak_serving.py --inject-faults at micro scale: oversize
    bodies 413, stalled senders are dropped by the read timeout, the device
    stall trips the watchdog 503 path, and no handler threads leak."""
    from scripts._lib import load_sibling

    _, path, _ = bundle
    soak = load_sibling("soak_serving")
    rep = soak.run_soak(path, seconds=4.0, clients=3, wire="npz",
                        batch_window_ms=20.0, call_timeout_s=0.5,
                        inject_faults=True)
    assert rep["requests_ok"] >= 1          # real traffic kept flowing
    f = rep["faults"]
    assert f["oversize_413"] >= 1 and f["oversize_other"] == 0
    assert f["stall_dropped"] >= 1 and f["stall_other"] == 0
    assert rep["ledger"]["count"] >= 2
    assert rep["threads_leaked"] <= 1
