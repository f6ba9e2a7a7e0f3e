"""AOT serving bundles (beyond-reference; the reference deploys nothing —
its only artifact is a torch state_dict, model.py:388).

``jax.export`` lowers the jitted inference functions to StableHLO at fixed
batch buckets with the weights baked in as constants, and serializes the
result into one ``.npz`` bundle.  Loading needs jax only — not the model
code and not the checkpoint: the artifact IS the model.  Bundles are
lowered for several platforms at once (cpu + tpu by default), so one
artifact serves a TPU fleet and still smoke-tests on a CPU host.

Static shapes are the TPU contract: a request of any batch size ``b`` is
zero-padded up to the smallest exported bucket >= b and the outputs are
sliced back (classic bucketed serving).  Exported functions:

- ``encode``:   (X (B,7,27) f32, adj (B,7,7) f32) -> (mu, std), each (B, Z)
- ``decode``:   (z (B,Z) f32) -> (X (B,7,27) f32, params (B,7,21) i32,
                adj (B,7,7) f32); deterministic given z (model.py:214-253)
- ``roundtrip``: (X, adj) -> decode(posterior mean) — the headline
                serving workload, one fused program

Bundle layout (npz): ``manifest`` = JSON (uint8) with the model config and
bucket table; ``<fn>/<B>`` = the serialized StableHLO artifact (uint8).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from dxvae_tpu import __version__
from dxvae_tpu.graph import GraphBatch
from dxvae_tpu.models.dxvae import decode as _decode
from dxvae_tpu.models.dxvae import encode as _encode

BUNDLE_VERSION = 1
DEFAULT_PLATFORMS = ("cpu", "tpu")


def export_bundle(model, path, batch_sizes=(32, 1024),
                  functions=("encode", "decode", "roundtrip"),
                  platforms=DEFAULT_PLATFORMS, include_prior=True) -> dict:
    """Export ``model``'s inference surface as a self-contained serving
    bundle at the given batch buckets.  Returns the manifest.

    If the model has a fitted prior (``fit_prior``/``load_prior``) and
    ``include_prior`` is true, its GMM parameters ride along (a few hundred
    KB) so ``ServedDXVAE.generate`` can sample the fitted density at serve
    time — z sampling is plain NumPy, so generation needs no extra export."""
    cfg = model.cfg
    params = model.params  # baked into every artifact as constants

    def encode_fn(X, adj):
        return _encode(params, X, adj, cfg)[:2]

    def decode_fn(z):
        return _decode(params, z, cfg)

    def roundtrip_fn(X, adj):
        mu, _, _ = _encode(params, X, adj, cfg)
        return _decode(params, mu, cfg)

    fns = {"encode": encode_fn, "decode": decode_fn, "roundtrip": roundtrip_fn}
    unknown = set(functions) - set(fns)
    if unknown:
        raise ValueError(f"unknown functions {sorted(unknown)}; "
                         f"choose from {sorted(fns)}")

    def arg_specs(name, b):
        f32 = jnp.float32
        X = jax.ShapeDtypeStruct((b, cfg.n_nodes, cfg.size_x), f32)
        adj = jax.ShapeDtypeStruct((b, cfg.n_nodes, cfg.n_nodes), f32)
        z = jax.ShapeDtypeStruct((b, cfg.size_z), f32)
        return (z,) if name == "decode" else (X, adj)

    buckets = sorted(set(int(b) for b in batch_sizes))
    if not buckets or buckets[0] < 1:
        raise ValueError(f"batch_sizes must be positive ints: {batch_sizes}")
    blobs, manifest_fns = {}, {}
    for name in functions:
        for b in buckets:
            exp = jax_export.export(jax.jit(fns[name]),
                                    platforms=tuple(platforms))(
                *arg_specs(name, b))
            blobs[f"{name}/{b}"] = np.frombuffer(exp.serialize(), np.uint8)
        manifest_fns[name] = buckets
    manifest = {
        "bundle_version": BUNDLE_VERSION,
        "dxvae_tpu_version": __version__,
        "platforms": list(platforms),
        "functions": manifest_fns,
        "cfg": {"n_nodes": cfg.n_nodes, "n_params": cfg.n_params,
                "size_x": cfg.size_x, "size_x0": cfg.size_x0,
                "size_h": cfg.size_h, "size_z": cfg.size_z,
                "strict_parity": cfg.strict_parity, "unroll": cfg.unroll,
                "compute_dtype": cfg.compute_dtype,
                "quantize_decode": cfg.quantize_decode},
    }
    if include_prior and getattr(model, "prior", None) is not None:
        for k, v in zip(("log_weights", "means", "chol"), model.prior):
            blobs[f"prior/{k}"] = np.asarray(v)
        manifest["has_prior"] = True
    blobs["manifest"] = np.frombuffer(
        json.dumps(manifest).encode(), np.uint8)
    tmp = Path(path).with_suffix(".tmp.npz")
    np.savez(tmp, **blobs)
    tmp.replace(path)  # atomic publish, like utils/checkpoint.py
    return manifest


def load_search_index(path) -> dict:
    """Load a latent search index (CLI ``search --save-index``) back into a
    dict of arrays, validating the schema — the one loader shared by the CLI
    ``--index-file`` path and the HTTP server's ``--search-index``."""
    with np.load(path) as z:
        index = {k: z[k] for k in z.files}
    missing = {"mu", "names", "bank", "voice", "alg"} - set(index)
    if missing:
        raise ValueError(f"{path}: not a search index — missing keys "
                         f"{sorted(missing)} (build one with "
                         "`search --save-index`)")
    return index


def knn_hits(mu_corpus, mu_query, k: int = 5, metric: str = "l2"):
    """k nearest corpus rows to a query in latent space: ``[(index,
    distance)]``, nearest first (shared by the CLI search and the HTTP
    /v1/search endpoint)."""
    mu_c = np.asarray(mu_corpus, np.float64)
    mu_q = np.asarray(mu_query, np.float64).ravel()
    if metric == "cosine":
        d = 1.0 - (mu_c @ mu_q) / (
            np.linalg.norm(mu_c, axis=1) * np.linalg.norm(mu_q) + 1e-30)
    elif metric == "l2":
        d = np.linalg.norm(mu_c - mu_q, axis=1)
    else:
        raise ValueError(f"unknown metric {metric!r}: 'l2' or 'cosine'")
    order = np.argsort(d, kind="stable")[:k]
    return [(int(i), float(d[i])) for i in order]


def bank_bytes(G: GraphBatch, checksum: str = "parity") -> bytes:
    """One framed 32-voice .syx bank for a batch of patches, padding short
    batches by repeating the last patch (the `serve --out` / `interpolate`
    CLI convention); >32 patches raise (a DX7 bank holds exactly 32)."""
    from dxvae_tpu.data.sysex import params_to_syx_bytes

    P = np.asarray(G.params, np.int64)
    if 0 < len(P) < 32:
        P = np.concatenate([P, np.repeat(P[-1:], 32 - len(P), axis=0)])
    return params_to_syx_bytes(P, checksum=checksum)


class ServedDXVAE:
    """Inference against an exported bundle — no model code, no checkpoint.

    Methods mirror the DXVAE inference surface and accept any batch size:
    inputs are zero-padded to the smallest exported bucket that fits and
    outputs sliced back.  Artifacts deserialize lazily (first call per
    function/bucket) and are cached."""

    def __init__(self, blobs: dict, manifest: dict):
        self._blobs = blobs
        self.manifest = manifest
        self._compiled = {}

    @classmethod
    def load(cls, path) -> "ServedDXVAE":
        with np.load(path) as f:
            blobs = {k: f[k] for k in f.files}
        manifest = json.loads(bytes(blobs.pop("manifest")).decode())
        if manifest["bundle_version"] > BUNDLE_VERSION:
            raise ValueError(
                f"bundle version {manifest['bundle_version']} is newer than "
                f"this library supports ({BUNDLE_VERSION})")
        return cls(blobs, manifest)

    def _call(self, name: str, n: int, *args):
        buckets = self.manifest["functions"].get(name)
        if buckets is None:
            raise ValueError(f"bundle has no {name!r} export "
                             f"(has: {sorted(self.manifest['functions'])})")
        fit = [b for b in buckets if b >= n]
        if not fit:
            raise ValueError(
                f"batch {n} exceeds the largest exported bucket {buckets[-1]}"
                f" — re-export with a larger batch size")
        b = fit[0]
        key = (name, b)
        if key not in self._compiled:
            self._compiled[key] = jax_export.deserialize(
                bytes(self._blobs[f"{name}/{b}"]))
        pad = [np.concatenate(
            [a, np.zeros((b - n,) + a.shape[1:], a.dtype)]) if n < b else a
            for a in (np.asarray(a, np.float32) for a in args)]
        out = self._compiled[key].call(*pad)
        return tuple(np.asarray(o)[:n] for o in out)

    def encode(self, G):
        """GraphBatch (or (X, adj)) -> (mu, std)."""
        X, adj = (G.X, G.adj) if isinstance(G, GraphBatch) else G
        return self._call("encode", len(X), X, adj)

    def decode(self, z) -> GraphBatch:
        z = np.asarray(z, np.float32)
        X, P, adj = self._call("decode", len(z), z)
        return GraphBatch(X=X, params=P.astype(np.int32), adj=adj)

    def encode_decode(self, G) -> GraphBatch:
        X, adj = (G.X, G.adj) if isinstance(G, GraphBatch) else G
        Xo, P, adjo = self._call("roundtrip", len(X), X, adj)
        return GraphBatch(X=Xo, params=P.astype(np.int32), adj=adjo)

    def generate(self, n: int, seed: int = 0, prior: str | None = None,
                 temperature: float = 1.0, valid_only: bool = False,
                 max_rounds: int = 64) -> GraphBatch:
        """Prior-sample ``n`` patches.  z sampling is plain NumPy on the host
        (only the decode runs the exported artifact): ``prior='fitted'`` uses
        the bundled GMM (defaults to it when the bundle has one),
        ``'standard'`` is N(0, I); ``temperature`` / ``valid_only`` as in
        DXVAE.generate (valid_only rounds decode at the bucket size that
        fits ``max(n, 64)``, so rejection costs no extra compilations)."""
        if valid_only:
            from dxvae_tpu.data.algorithms import rejection_sample_valid

            # each round decodes at a full bucket: the decode pads up to one
            # anyway, so snapping m to the executed bucket size makes every
            # decoded row a candidate (no sliced-away waste); n beyond the
            # largest bucket keeps m=n so decode() raises its overflow error
            caps = self.manifest["functions"].get("decode", [64])
            want = max(int(n), 64)
            fit = [b for b in caps if b >= want]
            m = fit[0] if fit else caps[-1]
            if int(n) > caps[-1]:
                m = int(n)
            return rejection_sample_valid(
                n, m,
                lambda r: self.generate(m, seed=seed + 7919 * r, prior=prior,
                                        temperature=temperature),
                max_rounds,
                hint="try the bundled fitted prior with temperature < 1, "
                     "or raise max_rounds")
        if prior is None:
            prior = "fitted" if self.manifest.get("has_prior") else "standard"
        rng = np.random.default_rng(seed)
        Z = self.manifest["cfg"]["size_z"]
        if prior == "fitted":
            if not self.manifest.get("has_prior"):
                raise ValueError("bundle has no fitted prior: re-export from "
                                 "a model after fit_prior()/load_prior()")
            lw = self._blobs["prior/log_weights"]
            means = self._blobs["prior/means"]
            chol = self._blobs["prior/chol"]
            comps = rng.choice(len(lw), size=n, p=np.exp(lw) / np.exp(lw).sum())
            eps = rng.standard_normal((n, Z)).astype(np.float32)
            z = means[comps] + temperature * np.einsum(
                "nij,nj->ni", chol[comps], eps)
        elif prior == "standard":
            z = temperature * rng.standard_normal((n, Z)).astype(np.float32)
        else:
            raise ValueError(f"unknown prior {prior!r}: 'standard' or 'fitted'")
        return self.decode(z.astype(np.float32))
