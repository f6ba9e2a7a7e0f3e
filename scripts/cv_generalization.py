"""Leave-banks-out cross-validation: a trustworthy generalization number.

Every generalization figure so far rests on ONE held-out bank (Dexed_01,
32 patches — ±3.1 pts per patch of topology-exact), so scaling-study claims
like "held-out reconstruction is corpus-limited" carry wide error bars.
This harness cross-validates at *bank* granularity over the 32 SynprezFM
banks: fold f holds out every bank with index ≡ f (mod --folds), trains the
dx_1024_best recipe on the rest, and scores the held-out fold.  Pooling the
per-fold reconstructions scores EVERY training-corpus patch exactly once as
held-out data — a 1024-patch generalization estimate instead of 32.

Banks are the right split unit: voices within a bank share authorship and
often differ by a few parameters, so a random patch-level split leaks
near-duplicates across the boundary and overstates generalization.

Also reports the fixed Dexed_01 bank under every fold's model, anchoring the
cross-collection number (same sound-designer ecosystem, different authors)
to the cross-bank one.  The reference has no evaluation at all (main.py
prints params and relies on listening), let alone a cross-validated one.

Usage (TPU, full scale — 8 folds x ~500 s):
    python scripts/cv_generalization.py
CPU micro (tests): --size-h 32 --size-z 8 --no-unroll --epochs 1 --folds 2
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dxvae_tpu.utils.profiling import enable_persistent_cache

enable_persistent_cache()

from dxvae_tpu.data.dataset import DXDataset, default_raw_dir
from dxvae_tpu.graph import GraphBatch
from dxvae_tpu.models import DXVAEConfig, LossWeights


def fold_banks(n_banks: int, folds: int):
    """Deterministic interleaved partition: bank b is held out in fold
    b % folds (contiguous blocks would confound with SynprezFM's numbering)."""
    return [[b for b in range(n_banks) if b % folds == f] for f in range(folds)]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--folds", type=int, default=8,
                    help="bank-level folds (8 -> 4 of 32 banks held out per "
                         "fold, 128 patches; training set stays 7/8 of full)")
    ap.add_argument("--epochs", type=int, default=5000,
                    help="per-fold epochs (default = the dx_1024_best recipe)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--peak-lr", type=float, default=1e-3)
    ap.add_argument("--w-kld", type=float, default=0.002)
    ap.add_argument("--size-h", type=int, default=512)
    ap.add_argument("--size-z", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--weight-decay", type=float, default=0.01,
                    help="AdamW decoupled weight decay (0.01 = the torch-"
                         "parity default every prior run inherited)")
    ap.add_argument("--dropout", type=float, default=0.0,
                    help="dropout rate on the four decoder MLP heads during "
                         "training (DXVAEConfig.head_dropout)")
    ap.add_argument("--jitter", type=float, default=0.0,
                    help="within-quantization-bin feature jitter amount in "
                         "(0,1]: per-batch host-side augmentation of X "
                         "(data/augment.py); 0 disables")
    ap.add_argument("--fold-start", type=int, default=0,
                    help="first fold to run (resume an interrupted sweep; "
                         "pooling needs all folds present in --out)")
    ap.add_argument("--fold-end", type=int, default=None,
                    help="run folds [fold-start, fold-end) only: a screening "
                         "subset for recipe-lever A/Bs (pooled row reports "
                         "complete=false; compare against the SAME folds of "
                         "the baseline ledger, never the full-pool number)")
    ap.add_argument("--no-unroll", action="store_true",
                    help="batched-cadence path (fast compile; CPU dev runs)")
    ap.add_argument("--raw-dir", default=None)
    ap.add_argument("--out", default="runs/cv_generalization.jsonl",
                    help="JSON-lines results (one line per finished fold + a "
                         "pooled aggregate; appended, so interrupted sweeps "
                         "keep finished folds)")
    args = ap.parse_args(argv)

    cfg = DXVAEConfig(size_h=args.size_h, size_z=args.size_z,
                      unroll=not args.no_unroll, head_dropout=args.dropout)
    weights = LossWeights(w_env=3.0, w_frq=6.0, w_kld=args.w_kld)

    from scripts._lib import load_sibling

    ev = load_sibling("evaluate")      # single source of metrics + split
    ab = load_sibling("ab_orbit")      # single source of the training recipe

    raw_dir = args.raw_dir or default_raw_dir()
    full = DXDataset(raw_dir, save_dir="/tmp/dx_cv_cache")
    train_ds = DXDataset(raw_dir, save_dir="/tmp/dx_cv_cache",
                         include="synprez")
    dexed = ev.held_out_split(full, train_ds)
    G = train_ds.batch
    n = len(G)
    if n % 32:
        raise SystemExit(f"corpus size {n} is not bank-aligned (32 voices/bank)")
    n_banks = n // 32
    bank_of = np.arange(n) // 32
    folds = fold_banks(n_banks, args.folds)

    from dxvae_tpu.api import DXVAE
    from dxvae_tpu.parallel.train import make_eval_step

    # DELIBERATE: held_elbo is scored under the reference-default weights
    # (2/5/0.01) — the same convention as evaluate.py's "elbo" block — so
    # fold ELBOs are comparable across checkpoints/recipes.  It is NOT the
    # training objective (w_env=3, w_frq=6, w_kld=args.w_kld); train_best's
    # val_elbo, which drives checkpoint selection, uses the recipe weights.
    eval_step = make_eval_step(cfg)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".",
                exist_ok=True)

    rows = []
    fold_end = args.folds if args.fold_end is None else min(args.fold_end,
                                                            args.folds)
    for f in range(args.fold_start, fold_end):
        held_mask = np.isin(bank_of, folds[f])
        tr, held = G[~held_mask], G[held_mask]
        iters = len(tr) // args.batch
        if iters == 0:
            raise SystemExit(f"--batch {args.batch} exceeds the "
                             f"{len(tr)}-patch fold training set")
        params, steps, loss, wall = ab.train_one(
            cfg, weights, tr, args.epochs * iters, args.batch,
            args.peak_lr, args.seed,
            weight_decay=args.weight_decay, jitter=args.jitter)

        model = DXVAE(size_H=args.size_h, size_Z=args.size_z,
                      unroll=not args.no_unroll)
        model.params = params
        R_held = model.encode_decode(held)
        row = {"fold": f, "held_banks": folds[f], "n_train": int(len(tr)),
               "n_held": int(len(held)), "steps": steps,
               "final_loss": round(loss, 4), "wall_s": round(wall, 1),
               "weight_decay": args.weight_decay, "dropout": args.dropout,
               "jitter": args.jitter}
        row.update({f"held.{k}": v for k, v in
                    ev.reconstruction_metrics(held, R_held).items()})
        m = eval_step(model.params, np.asarray(held.X, np.float32),
                      np.asarray(held.params, np.int32),
                      np.asarray(held.adj, np.float32))
        row["held_elbo"] = round(float(m["loss"]), 4)
        if dexed is not None and len(dexed):
            row.update({f"dexed.{k}": v for k, v in
                        ev.reconstruction_metrics(
                            dexed, model.encode_decode(dexed)).items()})
        # stash the fold's reconstruction for exact pooling (arrays -> lists
        # is wasteful; keep in memory, persist only metrics)
        rows.append((row, held_mask, R_held))
        with open(args.out, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    # pooled: every patch's held-out reconstruction, scored in one pass —
    # only when this run produced every fold (a resumed partial run pools
    # what it has and says so)
    covered = np.zeros(n, bool)
    pX = np.zeros_like(np.asarray(G.X))
    pP = np.zeros_like(np.asarray(G.params))
    pA = np.zeros_like(np.asarray(G.adj))
    for _, mask, R_held in rows:
        covered |= mask
        pX[mask] = np.asarray(R_held.X)
        pP[mask] = np.asarray(R_held.params)
        pA[mask] = np.asarray(R_held.adj)
    pooled_R = GraphBatch(X=pX[covered], params=pP[covered], adj=pA[covered])
    pooled = {"fold": "pooled", "n_held": int(covered.sum()),
              "complete": bool(covered.all())}
    pooled.update({f"held.{k}": v for k, v in
                   ev.reconstruction_metrics(G[covered], pooled_R).items()})
    for col in ("held_elbo", "dexed.topology_exact", "dexed.param_acc"):
        vals = [r[col] for r, _, _ in rows if col in r]
        if vals:
            pooled[f"{col}.mean"] = round(float(np.mean(vals)), 4)
            pooled[f"{col}.std"] = round(float(np.std(vals)), 4)
    with open(args.out, "a") as fh:
        fh.write(json.dumps(pooled) + "\n")
    print(json.dumps(pooled, indent=2))
    return pooled


if __name__ == "__main__":
    main()
