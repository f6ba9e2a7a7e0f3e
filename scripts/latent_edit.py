"""Latent attribute editing: does the latent space carry linear controls?

Classic VAE affordance the reference never tests (its latent is only ever
sampled or round-tripped, model.py:255-268): find the latent direction for
an interpretable patch attribute as the difference of posterior-mean
centroids between high- and low-attribute patches, move encodings along it,
decode, and MEASURE whether the edit works:

- **target response**: the attribute's mean decoded value at each step
  alpha (in units of the corpus's std along the direction) — a working
  direction moves it monotonically;
- **off-target churn**: fraction of the OTHER params that changed vs the
  alpha=0 reconstruction — a disentangled direction moves little else;
- **topology retention**: fraction keeping the alpha=0 adjacency (edits
  should re-voice a patch, not rewire it).

Attributes (from the decoded integer params, data/sysex.py layout):
``feedback`` = params[:,0,13] (global feedback depth 0-7, the key "grit"
control on a DX7), ``op_level`` = params[:,1:,0].mean (mean operator output
level 0-99, overall loudness/brightness).

Usage (TPU, ~1 min warm):
    python scripts/latent_edit.py --checkpoint checkpoints/dx_h1024.npz
CPU micro (tests): tiny checkpoint + --no-unroll --n 8.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dxvae_tpu.utils.profiling import enable_persistent_cache

enable_persistent_cache()

ATTRS = {
    "feedback": lambda P: P[:, 0, 13].astype(np.float64),
    "op_level": lambda P: P[:, 1:, 0].mean(axis=1).astype(np.float64),
}


def direction(mu, vals, quantile=0.25):
    """Unit latent direction from low->high attribute: difference of
    posterior-mean centroids of the top and bottom ``quantile`` of the
    corpus.  Returns (unit_direction, std_of_mu_projection)."""
    lo, hi = np.quantile(vals, [quantile, 1.0 - quantile])
    d = mu[vals >= hi].mean(axis=0) - mu[vals <= lo].mean(axis=0)
    n = float(np.linalg.norm(d))
    if n == 0.0:  # degenerate (constant attribute): no direction exists
        raise ValueError("attribute is constant across the corpus")
    d = d / n
    return d, float((mu @ d).std())


def edit_report(model, G, attr, alphas=(-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0),
                n=64, quantile=0.25, seed=0, orthogonalize=False,
                export_dir=None, checksum="computed"):
    """Apply the attribute direction at each alpha to ``n`` patches'
    posterior means and score the decodes.  Returns a JSON-able dict.

    ``orthogonalize=True`` Gram-Schmidts the direction against every OTHER
    attribute's direction before use — the standard cure when centroid
    directions are entangled (each edit then cannot move along the other
    measured attributes' axes).

    ``export_dir`` writes each alpha step's first 32 decoded patches as a
    playable 32-voice bank ``{attr}_{alpha:+.1f}.syx`` (padded by repeating
    the last patch if n < 32) so edits can be auditioned in Dexed — the
    measurement above says whether the direction works, the banks say how
    it sounds."""
    P_all = np.asarray(G.params)
    vals = ATTRS[attr](P_all)
    mu, _ = model.encode(G)
    mu = np.asarray(mu, np.float64)
    d, sigma = direction(mu, vals, quantile)
    cos_vs_others = {}
    if orthogonalize:
        for other in ATTRS:
            if other == attr:
                continue
            do, _ = direction(mu, ATTRS[other](P_all), quantile)
            cos_vs_others[other] = round(float(d @ do), 3)
            d = d - (d @ do) * do
        nrm = float(np.linalg.norm(d))
        if nrm < 1e-6:  # direction lies in the others' span: nothing left
            raise ValueError(f"{attr} direction vanishes after removing "
                             f"{sorted(cos_vs_others)}")
        d = d / nrm
        sigma = float((mu @ d).std())

    idx = np.random.default_rng(seed).choice(len(mu), size=min(n, len(mu)),
                                             replace=False)
    base = mu[idx]
    steps = []
    R0 = None
    for a in alphas:
        z = (base + a * sigma * d).astype(np.float32)
        R = model.decode(z)
        Pd = np.asarray(R.params)
        if a == 0.0:
            R0 = R
        steps.append((a, R, Pd))
    if R0 is None:  # alpha grid without 0: anchor churn at the smallest |a|
        R0 = steps[int(np.argmin([abs(a) for a, _, _ in steps]))][1]
    P0 = np.asarray(R0.params)
    A0 = np.asarray(R0.adj)

    # the target attribute's own params are excluded from the churn count
    off_mask = np.ones((7, 21), bool)
    if attr == "feedback":
        off_mask[0, 13] = False
    else:
        off_mask[1:, 0] = False

    exported = []
    if export_dir is not None:
        from dxvae_tpu.graph import GraphBatch
        from dxvae_tpu.serving import bank_bytes

        os.makedirs(export_dir, exist_ok=True)
        for a, R, _ in steps:
            win = GraphBatch(*(np.asarray(f)[:32] for f in R))
            path = os.path.join(export_dir, f"{attr}_{a:+.1f}.syx")
            with open(path, "wb") as fh:
                fh.write(bank_bytes(win, checksum=checksum))
            exported.append(path)

    rows = []
    for a, R, Pd in steps:
        Ad = np.asarray(R.adj)
        rows.append({
            "alpha": a,
            "target_mean": round(float(ATTRS[attr](Pd).mean()), 3),
            "off_target_churn": round(
                float((Pd != P0)[:, off_mask].mean()), 4),
            "topology_retained": round(
                float((Ad == A0).all(axis=(1, 2)).mean()), 4),
        })
    t = [r["target_mean"] for r in rows]
    # same check restricted to the |alpha|<=1 trust region: measured on the
    # flagship, +-2 sigma edits leave the data manifold (topology retention
    # collapses) while +-1 sigma edits move the target and keep structure
    core = [r["target_mean"] for r in rows if abs(r["alpha"]) <= 1.0]
    return {"attr": attr, "n": int(len(idx)), "sigma": round(sigma, 3),
            "corpus_mean": round(float(vals.mean()), 3),
            "steps": rows,
            # strictly increasing target along alpha = a clean direction;
            # quantized decoder outputs make this a high bar (sub-grid steps
            # decode to the same integers), so also report the end-to-end move
            "monotonic": bool(all(x < y for x, y in zip(t, t[1:]))),
            "monotonic_within_1sigma": bool(
                all(x < y for x, y in zip(core, core[1:]))),
            "endpoint_delta": round(t[-1] - t[0], 3),
            "directional": bool(t[-1] > t[0]),
            "orthogonalized": bool(orthogonalize),
            **({"cos_vs_others": cos_vs_others} if cos_vs_others else {}),
            **({"exported": exported} if exported else {})}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="checkpoints/dx_h1024.npz")
    ap.add_argument("--attrs", default="feedback,op_level")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--alphas", default="-2,-1,-0.5,0,0.5,1,2",
                    help="edit magnitudes in units of the corpus sigma")
    ap.add_argument("--orthogonalize", action="store_true",
                    help="remove the other attributes' directions first")
    ap.add_argument("--export-syx", default=None, metavar="DIR",
                    help="also write each alpha step's first 32 edited "
                         "patches as a playable bank DIR/{attr}_{alpha}.syx")
    ap.add_argument("--checksum", default="computed",
                    choices=("computed", "parity"),
                    help="bank checksum mode for --export-syx")
    ap.add_argument("--no-unroll", action="store_true",
                    help="batched-cadence path (fast compile; CPU dev runs)")
    ap.add_argument("--raw-dir", default=None)
    ap.add_argument("--out", default="runs/latent_edit.jsonl")
    args = ap.parse_args(argv)

    from dxvae_tpu.api import DXVAE, DXDataset
    from dxvae_tpu.data.dataset import default_raw_dir
    from dxvae_tpu.utils.checkpoint import infer_sizes

    size_h, size_z = infer_sizes(args.checkpoint)
    model = DXVAE(size_H=size_h, size_Z=size_z, checkpoint=args.checkpoint,
                  unroll=not args.no_unroll)
    ds = DXDataset(args.raw_dir or default_raw_dir(),
                   save_dir="/tmp/dx_edit_cache", include="synprez")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".",
                exist_ok=True)
    reports = []
    alphas = tuple(float(a) for a in args.alphas.split(","))
    for attr in [a.strip() for a in args.attrs.split(",") if a.strip()]:
        if attr not in ATTRS:
            raise SystemExit(f"unknown attr {attr!r} (have {sorted(ATTRS)})")
        rep = edit_report(model, ds.batch, attr, alphas=alphas, n=args.n,
                          orthogonalize=args.orthogonalize,
                          export_dir=args.export_syx, checksum=args.checksum)
        reports.append(rep)
        with open(args.out, "a") as fh:
            fh.write(json.dumps(rep) + "\n")
        print(json.dumps(rep, indent=2))
    return reports


if __name__ == "__main__":
    main()
