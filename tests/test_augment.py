"""Operator-permutation (algorithm-automorphism) data augmentation.

Beyond-reference capability: ``data/algorithms.automorphisms`` enumerates the
graph automorphisms of each DX7 routing, ``orbit_augment`` expands a batch
with operator-permuted — acoustically identical — copies.  The reference has
no augmentation of any kind (its corpus handling is dxdata.py:320-323).
"""

import itertools

import numpy as np
import pytest

from dxvae_tpu.data.algorithms import (ALGO_ADJ, N_ALGORITHMS, automorphisms,
                                       orbit_augment)
from dxvae_tpu.graph import GraphBatch


def test_automorphisms_are_exactly_the_invariant_permutations():
    # brute-force recomputation over all 720 operator permutations, every
    # algorithm: automorphisms() must return precisely the invariant set
    for alg in range(N_ALGORITHMS):
        adj = ALGO_ADJ[alg]
        expect = [
            (0,) + p
            for p in itertools.permutations(range(1, 7))
            if np.array_equal(adj[np.ix_((0,) + p, (0,) + p)], adj)
        ]
        got = automorphisms(alg)
        assert got.tolist() == [list(p) for p in expect]
        # identity first; every row a permutation of 0..6 fixing node 0
        assert got[0].tolist() == [0, 1, 2, 3, 4, 5, 6]
        assert (np.sort(got, axis=1) == np.arange(7)).all()
        assert (got[:, 0] == 0).all()


def test_automorphism_groups_known_sizes_and_closure():
    # algorithm 32 (index 31): five interchangeable parallel carriers -> 5!
    assert len(automorphisms(31)) == 120
    # algorithm 31 (index 30): four interchangeable carriers -> 4!
    assert len(automorphisms(30)) == 24
    # a chain algorithm has no symmetry
    assert len(automorphisms(0)) == 1
    # group closure: composing any two automorphisms is an automorphism
    for alg in (4, 18, 22, 30):
        autos = {tuple(p) for p in automorphisms(alg).tolist()}
        for p in list(autos)[:6]:
            for q in list(autos)[:6]:
                comp = tuple(np.asarray(p)[np.asarray(q)].tolist())
                assert comp in autos


def _batch_for(algs):
    rng = np.random.default_rng(7)
    B = len(algs)
    X = rng.random((B, 7, 27)).astype(np.float32)
    P = rng.integers(0, 99, (B, 7, 21)).astype(np.int32)
    P[:, 0, 18] = algs
    adj = ALGO_ADJ[np.asarray(algs)].astype(np.float32)
    return GraphBatch(X=X, params=P, adj=adj)


def test_orbit_augment_preserves_topology_and_operator_multiset():
    algs = [31, 30, 23, 4, 0, 31]
    G = _batch_for(algs)
    aug = orbit_augment(G, max_per_patch=3, seed=0)
    # originals ride in front, byte-identical
    np.testing.assert_array_equal(aug.X[: len(G)], G.X)
    np.testing.assert_array_equal(aug.params[: len(G)], G.params)
    np.testing.assert_array_equal(aug.adj[: len(G)], G.adj)
    # cap respected: algs 31/30/23 have >=3 non-identity autos, alg 4 has 1,
    # alg 0 none
    assert len(aug) == len(G) + 3 + 3 + 3 + 1 + 0 + 3
    for i in range(len(G), len(aug)):
        # every copy's topology is EXACTLY a valid algorithm (automorphism)
        match = (aug.adj[i] == ALGO_ADJ.astype(np.float32)).all(axis=(1, 2))
        assert match.any()
        alg = int(np.flatnonzero(match)[0])
        # ... and its source patch exists in the originals: same global row,
        # same multiset of operator rows (a permutation, not a perturbation)
        src = [j for j in range(len(G))
               if np.array_equal(G.adj[j], aug.adj[i])
               and np.array_equal(G.X[j, 0], aug.X[i, 0])
               and np.array_equal(np.sort(G.X[j, 1:], axis=0),
                                  np.sort(aug.X[i, 1:], axis=0))
               and np.array_equal(np.sort(G.params[j, 1:], axis=0),
                                  np.sort(aug.params[i, 1:], axis=0))]
        assert src, f"augmented row {i} (alg {alg}) matches no original"
        # alg param byte survives the permutation (row 0 is never permuted)
        assert int(aug.params[i, 0, 18]) == int(G.params[src[0], 0, 18])


def test_orbit_augment_full_orbit_and_determinism():
    G = _batch_for([30])  # 23 non-identity automorphisms
    full = orbit_augment(G, max_per_patch=None, seed=1)
    assert len(full) == 1 + 23
    # all copies distinct presentations (distinct permutations of random rows)
    flat = full.X.reshape(len(full), -1)
    assert len(np.unique(flat, axis=0)) == len(full)
    a = orbit_augment(G, max_per_patch=5, seed=3)
    b = orbit_augment(G, max_per_patch=5, seed=3)
    np.testing.assert_array_equal(a.X, b.X)
    np.testing.assert_array_equal(a.params, b.params)


def test_orbit_augment_edge_cases():
    # invalid topology contributes no copies
    G = _batch_for([31])
    bad = GraphBatch(X=G.X, params=G.params,
                     adj=np.ones_like(G.adj))  # not a DX7 routing
    aug = orbit_augment(bad, seed=0)
    assert len(aug) == 1
    np.testing.assert_array_equal(aug.adj, bad.adj)
    # include_original=False emits copies only
    only = orbit_augment(G, max_per_patch=2, seed=0, include_original=False)
    assert len(only) == 2
    # cap 0 = no copies; negative cap raises
    assert len(orbit_augment(G, max_per_patch=0, seed=0)) == 1
    with pytest.raises(ValueError):
        orbit_augment(G, max_per_patch=-1)


def test_orbit_augment_return_index_pairs_copies_with_sources():
    algs = [31, 0, 30, 31]
    G = _batch_for(algs)
    aug, src = orbit_augment(G, max_per_patch=2, seed=5, return_index=True)
    assert src.shape == (len(aug),) and src.dtype == np.int64
    # originals map to themselves
    np.testing.assert_array_equal(src[: len(G)], np.arange(len(G)))
    for i in range(len(G), len(aug)):
        j = int(src[i])
        # each copy is EXACTLY a node permutation of its claimed source
        assert np.array_equal(aug.adj[i], G.adj[j])
        assert np.array_equal(aug.X[i, 0], G.X[j, 0])
        assert np.array_equal(np.sort(aug.X[i, 1:], axis=0),
                              np.sort(G.X[j, 1:], axis=0))
        assert np.array_equal(np.sort(aug.params[i, 1:], axis=0),
                              np.sort(G.params[j, 1:], axis=0))
    # chain alg 0 contributes no copies; both alg-32 patches contribute 2
    assert sorted(src[len(G):].tolist()) == [0, 0, 2, 2, 3, 3]
    # copies-only mode still indexes into the ORIGINAL batch
    only, src2 = orbit_augment(G, max_per_patch=1, seed=5,
                               include_original=False, return_index=True)
    assert len(only) == len(src2) == 3
    assert set(src2.tolist()) == {0, 2, 3}
    # empty-output path keeps the contract
    bad = GraphBatch(X=G.X, params=G.params, adj=np.ones_like(G.adj))
    none, src3 = orbit_augment(bad, include_original=False, return_index=True)
    assert len(none) == 0 and src3.shape == (0,)


def test_cli_augment_orbit_wiring(monkeypatch, capsys):
    """`train-new --augment-orbit CAP` expands the batch before training and
    resolves through TrainConfig (flag > --config > default off)."""
    import dxvae_tpu.cli as cli

    G0 = _batch_for([31, 0])
    seen = {}
    monkeypatch.setattr(cli, "_load_graphs", lambda args: G0)
    monkeypatch.setattr(cli, "train_new",
                        lambda G, *a, **kw: seen.update(n=len(G)))
    cli.main(["train-new", "--augment-orbit", "2", "--checkpoint", "x.npz"])
    assert seen["n"] == 4  # alg 32 capped at 2 copies, chain alg 0 at 0
    assert "orbit augmentation: 2 -> 4 patches" in capsys.readouterr().out
    cli.main(["train-new", "--checkpoint", "x.npz"])  # default: off
    assert seen["n"] == 2
    cli.main(["train-new", "--augment-orbit", "--checkpoint", "x.npz"])
    assert seen["n"] == 2 + 119 + 0  # bare flag = full orbit


def test_cli_canonicalize_orbit_wiring(monkeypatch, capsys):
    """`train-new --canonicalize-orbit` trains on the canonical presentation
    (same row count, canonicalize_orbit applied) and refuses to combine with
    --augment-orbit (augment-then-canonicalize = pure duplicates)."""
    from dxvae_tpu.data.algorithms import canonicalize_orbit

    import dxvae_tpu.cli as cli

    G0 = _batch_for([31, 30, 0])
    seen = {}
    monkeypatch.setattr(cli, "_load_graphs", lambda args: G0)
    monkeypatch.setattr(cli, "train_new",
                        lambda G, *a, **kw: seen.update(G=G))
    cli.main(["train-new", "--canonicalize-orbit", "--checkpoint", "x.npz"])
    assert "orbit canonicalization" in capsys.readouterr().out
    C = canonicalize_orbit(G0)
    np.testing.assert_array_equal(seen["G"].params, C.params)
    np.testing.assert_array_equal(seen["G"].X, C.X)
    np.testing.assert_array_equal(seen["G"].adj, G0.adj)
    cli.main(["train-new", "--checkpoint", "x.npz"])  # default: off
    np.testing.assert_array_equal(seen["G"].params, G0.params)
    with pytest.raises(SystemExit, match="mutually exclusive"):
        cli.main(["train-new", "--canonicalize-orbit", "--augment-orbit",
                  "2", "--checkpoint", "x.npz"])


def test_evaluate_symmetry_metrics():
    """scripts/evaluate.py's encoder-invariance metric: finite, in range,
    and correctly counts one pair per non-trivial-orbit patch."""
    import importlib.util
    import pathlib

    from dxvae_tpu.api import DXVAE

    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "eval_script", root / "scripts" / "evaluate.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    model = DXVAE(size_H=32, size_Z=8, unroll=False)
    G = _batch_for([31, 0, 30, 4, 23, 31, 0, 18])
    m = mod._symmetry_metrics(model, G)
    assert m["n_pairs"] == 6  # the two chain (alg-0) patches have no orbit
    assert -1.0 <= m["latent_cos_mean"] <= 1.0
    assert m["pair_dist_over_interpatch"] >= 0.0
    for k in ("param_acc_originals", "param_acc_permuted"):
        assert 0.0 <= m[k] <= 1.0
    # all-trivial-orbit batch: the degenerate path reports zero pairs
    assert mod._symmetry_metrics(model, _batch_for([0, 0]))["n_pairs"] == 0


def test_canonicalize_orbit_properties():
    """canonicalize_orbit: idempotent, presentation-invariant (every member
    of a patch's orbit maps to the SAME canonical form), row-preserving, and
    a pure node permutation of its input."""
    from dxvae_tpu.data.algorithms import canonicalize_orbit

    G = _batch_for([31, 0, 30, 4, 23, 31, 18])
    C = canonicalize_orbit(G)
    assert len(C) == len(G)
    np.testing.assert_array_equal(C.adj, G.adj)
    for i in range(len(G)):
        # node multiset preserved; global node fixed
        np.testing.assert_array_equal(C.params[i, 0], G.params[i, 0])
        np.testing.assert_array_equal(np.sort(C.params[i, 1:], axis=0),
                                      np.sort(G.params[i, 1:], axis=0))
        np.testing.assert_array_equal(np.sort(C.X[i, 1:], axis=0),
                                      np.sort(G.X[i, 1:], axis=0))
    # idempotent
    C2 = canonicalize_orbit(C)
    np.testing.assert_array_equal(C2.params, C.params)
    np.testing.assert_array_equal(C2.X, C.X)
    # EVERY presentation of a patch canonicalizes identically: run the full
    # orbit of each patch through and compare to its source's canonical form
    aug, src = orbit_augment(G, max_per_patch=None, seed=0,
                             include_original=False, return_index=True)
    CA = canonicalize_orbit(aug)
    np.testing.assert_array_equal(CA.params, C.params[src])
    np.testing.assert_array_equal(CA.X, C.X[src])
    # trivial-orbit patches (chain alg 0) pass through byte-identical
    np.testing.assert_array_equal(C.params[1], G.params[1])
    np.testing.assert_array_equal(C.X[1], G.X[1])


def test_orbit_aligned_reconstruction_metrics():
    """evaluate.py's acoustic accuracy: an operator-permuted reconstruction
    scores 1.0 orbit-aligned (identical audio) while positionwise accuracy
    drops; genuinely wrong params are NOT credited."""
    import importlib.util
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "eval_metrics", root / "scripts" / "evaluate.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    G = _batch_for([31, 0, 30, 4, 23, 31])
    aug, src = orbit_augment(G, max_per_patch=1, seed=3,
                             include_original=False, return_index=True)
    # reconstruction = a valid permuted presentation of each symmetric patch
    R = GraphBatch(X=G.X.copy(), params=G.params.copy(), adj=G.adj.copy())
    R.params[src] = aug.params
    R.X[src] = aug.X
    m = mod.orbit_aligned_metrics(G, R)
    assert m["param_acc_orbit_aligned"] == 1.0
    assert m["params_exact_orbit_aligned"] == 1.0
    plain = float((G.params == R.params).mean())
    assert plain < 1.0  # positionwise metric under-credits the same patches
    # identity reconstruction: both views agree at 1.0
    ident = mod.orbit_aligned_metrics(G, G)
    assert ident == {"param_acc_orbit_aligned": 1.0,
                     "params_exact_orbit_aligned": 1.0}
    # a real error stays an error in every presentation
    W = GraphBatch(X=R.X, params=R.params.copy(), adj=R.adj)
    W.params[:, 1:, 0] += 1
    w = mod.orbit_aligned_metrics(G, W)
    assert w["param_acc_orbit_aligned"] < 1.0
    assert w["params_exact_orbit_aligned"] == 0.0
    # and reconstruction_metrics carries the new keys
    full = mod.reconstruction_metrics(G, R)
    assert full["param_acc_orbit_aligned"] == 1.0
    assert full["param_acc"] == plain


def test_ab_orbit_script_micro_run(tmp_path):
    """scripts/ab_orbit.py end to end at micro scale: both arms train on a
    step-matched budget, every run appends a JSON line with the evaluation
    columns, and the aggregate covers both arms."""
    import json

    from scripts._lib import load_sibling

    mod = load_sibling("ab_orbit")

    out = tmp_path / "ab.jsonl"
    mod.main(["--size-h", "32", "--size-z", "8", "--no-unroll",
              "--total-steps", "2", "--batch", "512", "--seeds", "1",
              "--arms", "baseline,orbit", "--out", str(out)])
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert [r["arm"] for r in rows] == ["baseline", "orbit"]
    assert rows[1]["n_train"] > rows[0]["n_train"] == 1024
    for r in rows:
        for col in ("final_loss", "held_out.param_acc", "held_out_elbo",
                    "symmetry.param_acc_permuted"):
            assert np.isfinite(r[col]), col
    # step-matched: both arms realized EXACTLY the step budget (the larger
    # orbit arm takes a partial first epoch rather than extra steps)
    assert rows[0]["steps"] == rows[1]["steps"] == 2
    agg = mod.aggregate(rows)
    assert set(agg) == {"baseline", "orbit"}
    assert agg["baseline"]["n_runs"] == agg["orbit"]["n_runs"] == 1


def test_orbit_augment_on_real_corpus_trains():
    """Integration: augmenting the real 1024-patch corpus yields a batch the
    model trains on (finite loss), and the expansion factor matches the
    corpus's algorithm histogram."""
    from dxvae_tpu.api import DXDataset, DXVAE

    ds = DXDataset("/root/reference/DX_data", include="synprez")
    G = orbit_augment(ds.batch, max_per_patch=2, seed=0)
    counts = np.array([min(2, len(automorphisms(int(a))) - 1)
                       for a in ds.batch.params[:, 0, 18]])
    assert len(G) == len(ds) + counts.sum()
    model = DXVAE(size_H=32, size_Z=8, unroll=False)
    loss, *_ = model.forward(G[np.arange(0, len(G), max(1, len(G) // 16))])
    assert np.isfinite(float(loss))


# --------------------------------------------------------------------------- #
# within-quantization-bin jitter (data/augment.py)
# --------------------------------------------------------------------------- #

def _requantize(X, P):
    """Integer grid points implied by X, per the quantizer grids
    (models/quantize.py) — the jitter invariant is that these match P on
    every jittered dim."""
    from dxvae_tpu.data.augment import _FRQ, _LIN_OP, _LIN_X0

    Q = np.asarray(P).copy()
    X = np.asarray(X, np.float64)
    for sl, s in _LIN_X0:
        Q[:, 0, sl] = np.clip(np.round(X[:, 0, sl] * s), 0, s)
    for sl, s in _LIN_OP:
        Q[:, 1:, sl] = np.clip(np.round(X[:, 1:, sl] * s), 0, s)
    ratio = np.asarray(P)[:, 1:, 18] == 0
    for d, s_log, s_lin in _FRQ:
        q_log = np.clip(np.round(np.exp(X[:, 1:, d] * np.log(s_log + 1.0)) - 1.0), 0, s_log)
        q_lin = np.clip(np.round(X[:, 1:, d] * s_lin), 0, s_lin)
        Q[:, 1:, d] = np.where(ratio, q_log, q_lin)
    return Q


def test_jitter_within_bin_preserves_quantization():
    # the real corpus: every patch, full-bin jitter, several draws — the
    # jittered X must re-quantize to the exact same integer parameters
    from dxvae_tpu.data.augment import jitter_within_bin
    from dxvae_tpu.data.dataset import DXDataset

    ds = DXDataset("/root/reference/DX_data", save_dir="/tmp/dx_test_cache",
                   include="synprez")
    G = ds.batch
    X = np.asarray(G.X)
    P = np.asarray(G.params)
    assert (_requantize(X, P) == _requantize(X, P)).all()
    rng = np.random.default_rng(0)
    for amount in (1.0, 0.5):
        Xj = jitter_within_bin(X, P, rng, amount=amount)
        assert Xj.shape == X.shape and Xj.dtype == np.float32
        np.testing.assert_array_equal(_requantize(Xj, P), _requantize(X, P))
        # jitter actually moves the scalar dims (full corpus, full bin)
        assert np.abs(Xj - X).max() > 1e-3
    # categorical / boolean / padding dims are untouched
    Xj = jitter_within_bin(X, P, rng)
    np.testing.assert_array_equal(Xj[:, 0, 15:], X[:, 0, 15:])   # oks/lks/lfw/pad
    np.testing.assert_array_equal(Xj[:, 1:, 18:], X[:, 1:, 18:])  # mode/lc/rc


def test_jitter_amount_validation_and_determinism():
    from dxvae_tpu.data.augment import jitter_within_bin

    X = np.zeros((2, 7, 27), np.float32)
    P = np.zeros((2, 7, 21), np.int64)
    with pytest.raises(ValueError):
        jitter_within_bin(X, P, np.random.default_rng(0), amount=0.0)
    with pytest.raises(ValueError):
        jitter_within_bin(X, P, np.random.default_rng(0), amount=1.5)
    a = jitter_within_bin(X, P, np.random.default_rng(7))
    b = jitter_within_bin(X, P, np.random.default_rng(7))
    np.testing.assert_array_equal(a, b)
