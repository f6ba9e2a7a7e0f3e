"""Model evaluation report: reconstruction + generation metrics.

Evaluates a checkpoint on the 1024-patch training set AND on the held-out
Dexed_01 bank (32 voices excluded from the baseline training set) — a proper
generalization measurement the reference never had (its only evaluation was
printing params and listening in Dexed, main.py:24-47).

Usage: python scripts/evaluate.py [--checkpoint checkpoints/dx_1024_long.npz]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dxvae_tpu.utils.profiling import enable_persistent_cache

enable_persistent_cache()  # ~7 distinct unrolled programs compile per run (CLAUDE.md)

from dxvae_tpu.api import DXVAE, DXDataset
from dxvae_tpu.data.dataset import default_raw_dir
from dxvae_tpu.graph import GraphBatch


def reconstruction_metrics(G: GraphBatch, R: GraphBatch) -> dict:
    out = {
        "alg_acc": float((G.params[:, 0, 18] == R.params[:, 0, 18]).mean()),
        "edge_acc": float((G.adj == R.adj).mean()),
        "topology_exact": float((G.adj == R.adj).all(axis=(1, 2)).mean()),
        # elementwise accuracy (renamed from round-3's "param_exact": the
        # value is unchanged, but '_exact' suggested per-patch-all-exact,
        # which is a much lower number)
        "param_acc": float((G.params == R.params).mean()),
        "params_exact": float((G.params == R.params).all(axis=(1, 2)).mean()),
        "mean_abs_X_err": float(np.abs(G.X - R.X).mean()),
        "env_param_acc": float((G.params[:, 1:, 1:9] == R.params[:, 1:, 1:9]).mean()),
        "freq_coarse_acc": float((G.params[:, 1:, 9] == R.params[:, 1:, 9]).mean()),
    }
    out.update(orbit_aligned_metrics(G, R))
    return out


def orbit_aligned_metrics(G: GraphBatch, R: GraphBatch) -> dict:
    """Acoustic reconstruction accuracy: the DX7's operators are
    interchangeable hardware, so a reconstruction that permutes a patch's
    operators along a topology automorphism synthesizes identical audio yet
    scores ~0 under positionwise comparison.  Per patch, take the BEST param
    match over all valid presentations of the truth
    (data.algorithms.automorphisms of its stored algorithm); equals plain
    param_acc for the 13/32 algorithms with a trivial group.  The reference
    evaluates nothing at all (main.py prints params); positionwise accuracy
    under-credits any model on the 19 symmetric algorithms."""
    from dxvae_tpu.data.algorithms import automorphisms

    T = np.asarray(G.params)
    Rp = np.asarray(R.params)
    best = (T == Rp).mean(axis=(1, 2))
    exact = (T == Rp).all(axis=(1, 2))
    for a in np.unique(np.asarray(T[:, 0, 18])):
        autos = automorphisms(int(a))
        if len(autos) == 1:
            continue
        rows = np.flatnonzero(T[:, 0, 18] == a)
        per = T[rows][:, autos]                      # (n, n_auto, 7, P)
        hit = per == Rp[rows][:, None]
        best[rows] = np.maximum(best[rows], hit.mean(axis=(2, 3)).max(axis=1))
        exact[rows] |= hit.all(axis=(2, 3)).any(axis=1)
    return {"param_acc_orbit_aligned": float(best.mean()),
            "params_exact_orbit_aligned": float(exact.mean())}


def held_out_split(full: DXDataset, train: DXDataset):
    """Voices of ``full`` absent from ``train`` byte-for-byte (with the
    default datasets: the Dexed_01 bank the synprez subset excludes), or
    ``None`` when nothing is held out.  Single source of the split for this
    script and scripts/ab_orbit.py."""
    train_keys = {bytes(p.tobytes()) for p in train.batch.params}
    held_idx = [i for i, p in enumerate(full.batch.params)
                if bytes(p.tobytes()) not in train_keys]
    return full[np.asarray(held_idx)] if held_idx else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="checkpoints/dx_1024_xl.npz")
    ap.add_argument("--json", action="store_true", help="machine-readable output")
    ap.add_argument("--raw-dir", default=None, help="bank directory (default: $DXVAE_RAW_DIR or the reference mount)")
    args = ap.parse_args()

    raw_dir = args.raw_dir or default_raw_dir()
    full = DXDataset(raw_dir, save_dir="/tmp/dx_eval_cache")
    train = DXDataset(raw_dir, save_dir="/tmp/dx_eval_cache",
                      include="synprez")
    held = held_out_split(full, train)

    from dxvae_tpu.utils.checkpoint import infer_sizes

    size_h, size_z = infer_sizes(args.checkpoint)
    model = DXVAE(size_H=size_h, size_Z=size_z, checkpoint=args.checkpoint)
    report = {"checkpoint": args.checkpoint}
    R_train = model.encode_decode(train.batch)
    report["train"] = reconstruction_metrics(train.batch, R_train)
    R_held = None
    if held is not None and len(held):
        R_held = model.encode_decode(held)
        report["held_out"] = reconstruction_metrics(held, R_held)
        report["held_out"]["n"] = len(held)

    # teacher-forced ELBO (eval mode: posterior mean, reference-default loss
    # weights 2/5/0.01) on train and held-out — the likelihood-side view of
    # generalization that reconstruction accuracies alone miss
    from dxvae_tpu.parallel.train import make_eval_step

    ev = make_eval_step(model.cfg)

    def _elbo(G):
        m = ev(model.params, np.asarray(G.X, np.float32),
               np.asarray(G.params, np.int32), np.asarray(G.adj, np.float32))
        return {k: round(float(v), 4) for k, v in m.items()}

    report["elbo"] = {"train": _elbo(train.batch)}
    if held is not None and len(held):
        report["elbo"]["held_out"] = _elbo(held)

    # latent retrieval: does posterior-mean space organize by algorithm?
    # precision@5 = fraction of each patch's 5 nearest neighbours (self
    # excluded) sharing its algorithm, vs the label-frequency chance rate —
    # the quality metric behind the CLI `search` workflow
    mu_all, _ = model.encode(train.batch)
    mu_all = np.asarray(mu_all, np.float64)
    algs = np.asarray(train.batch.params[:, 0, 18])
    # gram identity: same (N, N) distances without the (N, N, Z) float64
    # broadcast transient (~1-2 GB at N=1024)
    g2 = (mu_all**2).sum(-1)
    d2 = g2[:, None] + g2[None] - 2.0 * (mu_all @ mu_all.T)
    np.fill_diagonal(d2, np.inf)
    nn5 = np.argsort(d2, axis=1, kind="stable")[:, :5]
    freq = np.bincount(algs, minlength=32).astype(np.float64) / len(algs)
    report["latent_retrieval"] = {
        "alg_precision_at_5": round(float((algs[nn5] == algs[:, None]).mean()), 4),
        "chance_rate": round(float((freq**2).sum()), 4),
    }

    # encoder invariance under operator permutation — the symmetry the
    # --augment-orbit training option optimizes toward (acoustically
    # identical presentations should share a latent); reuses the
    # already-computed posterior means / reconstructions
    report["symmetry"] = _symmetry_metrics(model, train.batch,
                                           mu=mu_all, R=R_train)
    if held is not None and len(held):
        report["symmetry_held_out"] = _symmetry_metrics(model, held, R=R_held)

    # same prior samples with and without topology projection, so the
    # projected row isolates the projection's effect (not sampling noise)
    import jax

    z = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (512, model.cfg.size_z)))
    gen = model.decode(z)
    gen_proj = model.decode(z, project_topology=True)
    # conditional arm: same z, topology teacher-forced to alg i%32 — 16
    # samples per algorithm, coverage 32/32 by construction
    gen_cond = model.decode(z, alg=np.arange(len(z)) % 32)
    # self-conditioned arm: same z, routing SAMPLED from the decoder's own
    # algorithm head at that z, then teacher-forced (the fourth mode — valid
    # by construction like alg=, model-consistent unlike uniform alg=k,
    # diverse unlike argmax projection)
    gen_sampled = model.decode(z, topology="sampled")
    # ex-post fitted prior arm: z from a GMM fitted to the aggregate
    # posterior of the training set instead of N(0,I) (docs/PERF.md)
    model.fit_prior(train.batch)
    gen_fit = model.generate(len(z), prior="fitted")
    # best measured sampling mode: fitted prior at T=0.5 (docs/PERF.md
    # "Sampling temperature" — low T concentrates within components, so
    # validity rises while mixture coverage is untouched)
    gen_fit_t = model.generate(len(z), prior="fitted", temperature=0.5)
    # composed: fitted prior z (T=0.5) + self-conditioned routing
    gen_fit_sampled = model.generate(len(z), prior="fitted", temperature=0.5,
                                     topology="sampled")
    report["generation"] = _generation_metrics(gen)
    report["generation_projected"] = _generation_metrics(gen_proj)
    report["generation_conditional"] = _generation_metrics(gen_cond)
    report["generation_sampled_topology"] = _generation_metrics(gen_sampled)
    report["generation_fitted_prior"] = _generation_metrics(gen_fit)
    report["generation_fitted_prior_t05"] = _generation_metrics(gen_fit_t)
    report["generation_fitted_t05_sampled"] = _generation_metrics(gen_fit_sampled)
    # novelty guard for the fitted prior (it samples near training latents by
    # construction): exact-copy rate and nearest-neighbour param distance vs
    # the training set, reported for the free arm as the baseline
    for section, G in (("generation", gen), ("generation_fitted_prior", gen_fit),
                       ("generation_fitted_prior_t05", gen_fit_t),
                       ("generation_sampled_topology", gen_sampled),
                       ("generation_fitted_t05_sampled", gen_fit_sampled)):
        report[section].update(_novelty(G.params, np.asarray(train.batch.params)))
    # self-consistency: re-encode each arm's samples and decode the posterior
    # mean — how much of the sample's topology/params does the model itself
    # recognize and retain?  (on-manifold-ness of the generation modes)
    for section, G in (("generation", gen), ("generation_projected", gen_proj),
                       ("generation_conditional", gen_cond),
                       ("generation_sampled_topology", gen_sampled),
                       ("generation_fitted_prior", gen_fit),
                       ("generation_fitted_prior_t05", gen_fit_t),
                       ("generation_fitted_t05_sampled", gen_fit_sampled)):
        R = model.encode_decode(G)
        report[section]["roundtrip_topology_retained"] = float(
            (G.adj == R.adj).all(axis=(1, 2)).mean())
        report[section]["roundtrip_alg_retained"] = float(
            (G.params[:, 0, 18] == R.params[:, 0, 18]).mean())
        report[section]["roundtrip_param_acc"] = float(
            (G.params == R.params).mean())

    if args.json:
        print(json.dumps(report, indent=2))
    else:
        for section, metrics in report.items():
            if isinstance(metrics, dict):
                print(f"[{section}]")
                for k, v in metrics.items():
                    print(f"  {k}: {v:.4f}" if isinstance(v, float) else f"  {k}: {v}")
            else:
                print(f"{section}: {metrics}")


def _symmetry_metrics(model, G, seed=0, mu=None, R=None) -> dict:
    """Encoder invariance under operator permutation: pair each patch that
    has a non-trivial automorphism orbit with ONE random permuted copy
    (acoustically identical, different node order) and measure how the model
    treats the pair.  Perfectly symmetry-aware: latent_cos_mean = 1,
    pair_dist_over_interpatch = 0, and permuted presentations reconstruct as
    accurately as originals.  Measured (dx_1024): the encoder is invariant
    essentially by construction (cos = 1.0, pair distance ~0 relative to
    inter-patch distances — the gated-sum aggregation is order-free), so any
    asymmetry shows up on the DECODE side (param_acc_originals vs
    param_acc_permuted), which is what --augment-orbit training targets.
    The reference processes nodes in a fixed index order and never sees this
    symmetry (model.py:200-253)."""
    from dxvae_tpu.data.algorithms import orbit_augment

    Gp, src = orbit_augment(G, max_per_patch=1, seed=seed,
                            include_original=False, return_index=True)
    if not len(Gp):
        return {"n_pairs": 0}
    if mu is None:
        mu, _ = model.encode(G)
    mu0 = np.asarray(mu, np.float64)
    mu1_n, _ = model.encode(Gp)
    mu1 = np.asarray(mu1_n, np.float64)
    a = mu0[src]
    cos = (a * mu1).sum(-1) / (np.linalg.norm(a, axis=-1)
                               * np.linalg.norm(mu1, axis=-1) + 1e-12)
    pair_d = np.linalg.norm(a - mu1, axis=-1)
    # scale reference: typical latent distance between DIFFERENT patches
    # (None when the batch has no distinct pair to compare against)
    rng = np.random.default_rng(seed)
    i = rng.integers(0, len(mu0), 4096)
    j = rng.integers(0, len(mu0), 4096)
    ref_d = np.linalg.norm(mu0[i[i != j]] - mu0[j[i != j]], axis=-1)
    scale = float(np.median(ref_d)) if len(ref_d) else 0.0
    ratio = round(float(np.median(pair_d) / scale), 4) if scale > 0 else None
    # do permuted presentations reconstruct as well as their originals?
    R0 = model.encode_decode(G) if R is None else R
    R1 = model.encode_decode(Gp)
    acc_orig = float((np.asarray(G.params)[src] == np.asarray(R0.params)[src]).mean())
    acc_perm = float((np.asarray(Gp.params) == np.asarray(R1.params)).mean())
    return {
        "n_pairs": int(len(Gp)),
        "latent_cos_mean": round(float(cos.mean()), 4),
        "pair_dist_over_interpatch": ratio,
        "param_acc_originals": round(acc_orig, 4),
        "param_acc_permuted": round(acc_perm, 4),
    }


def _novelty(gen_params, train_params) -> dict:
    """Exact-copy rate + mean nearest-neighbour fraction of differing params
    vs the training set (0 = a byte-for-byte training patch)."""
    g = gen_params.reshape(len(gen_params), -1)
    t = train_params.reshape(len(train_params), -1)
    nn = (g[:, None, :] != t[None, :, :]).mean(axis=2).min(axis=1)
    return {
        "exact_copy_rate": float((nn == 0.0).mean()),
        "mean_nn_param_disagreement": float(nn.mean()),
    }


def _valid_topology_rate(adj) -> float:
    from dxvae_tpu.data.algorithms import ALGO_ADJ

    table = ALGO_ADJ.astype(adj.dtype)  # (32,7,7)
    match = (adj[:, None] == table[None]).all(axis=(2, 3)).any(axis=1)
    return float(match.mean())


def _generation_metrics(gen) -> dict:
    algs = gen.params[:, 0, 18]
    return {
        "alg_coverage": int(len(np.unique(algs))),
        # operator nodes only: node 0 (global) has no SELF step in the decode
        # cadence and no algorithm has adj[0,0]=1, so including it would
        # deflate the rate by 6/7.  Renamed from round-1's "self_loop_rate"
        # (which averaged the full diagonal, ~6/7 of this value) so earlier
        # recorded numbers are not silently incommensurate
        "op_self_loop_rate": float(gen.adj[:, range(1, 7), range(1, 7)].mean()),
        "mean_edges": float(gen.adj.sum(axis=(1, 2)).mean()),
        # fraction of samples whose generated topology matches some real DX7
        # algorithm exactly (ignoring which one the alg param claims)
        "valid_topology_rate": _valid_topology_rate(gen.adj),
        # diversity: distinct exact topologies across the 512 samples
        "unique_topologies": int(len({a.tobytes() for a in
                                      gen.adj.astype(np.uint8)})),
    }


if __name__ == "__main__":
    main()
