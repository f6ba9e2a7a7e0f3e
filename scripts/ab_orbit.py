"""Step-matched A/B: does operator-permutation orbit augmentation help?

Trains {baseline, orbit-augmented, orbit-canonicalized} arms from identical
inits on the SAME total optimizer-step budget (the augmented arm sees each
unique patch proportionally fewer times but in permuted presentations; the
canonical arm sees exactly one deterministic presentation per patch),
across N seeds,
then evaluates every run with the exact metrics of scripts/evaluate.py:
held-out reconstruction, held-out ELBO, and the permutation-symmetry pair
metrics.  Emits one JSON line per run plus a mean/std aggregate per arm.

Context (scripts/evaluate.py `_symmetry_metrics`): the encoder is already
permutation-invariant by construction, so all presentations of a patch share
one latent; augmentation therefore hands the decoder a one-to-many target.
Whether that regularizes (better held-out accuracy / more symmetric decode)
or just blurs reconstruction is exactly what this A/B measures.  The
reference has no equivalent experiment (its training loop is model.py:270-367,
fixed data).

Usage (TPU, full scale, ~minutes per arm):
    python scripts/ab_orbit.py --seeds 3
CPU small scale (1-core VM, ~1 h total):
    ... ab_orbit.py --size-h 128 --size-z 32 --total-steps 3000 --seeds 2
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

import jax
import optax

from dxvae_tpu.data.algorithms import canonicalize_orbit, orbit_augment
from dxvae_tpu.data.dataset import DXDataset, default_raw_dir
from dxvae_tpu.models import DXVAEConfig, LossWeights
from dxvae_tpu.parallel.train import init_train_state, make_train_step
from dxvae_tpu.utils.checkpoint import save_checkpoint


def train_one(cfg, weights, batch, total_steps, batch_size, peak_lr, seed,
              weight_decay=0.01, jitter=0.0):
    """Cosine-schedule AdamW run (the train_best.py recipe) on a fixed
    GraphBatch; returns (params, realized_steps, final_loss, wall_s).

    ``weight_decay``: AdamW decoupled decay (0.01 = the torch-parity default
    inherited by every prior run).  ``jitter`` > 0 applies host-side
    within-quantization-bin feature jitter to each batch's X (amount = the
    fraction of the bin used; data/augment.py) — acoustically identical
    inputs, fresh every epoch."""
    from dxvae_tpu.data.augment import jitter_within_bin

    X = np.asarray(batch.X, np.float32)
    P = np.asarray(batch.params, np.int32)
    A = np.asarray(batch.adj, np.float32)
    n = len(X)
    iters = n // batch_size
    if iters == 0:
        raise SystemExit(f"--batch {batch_size} exceeds the {n}-patch arm dataset")
    # never exceed the budget: whole epochs while they fit, else a partial
    # epoch — a larger (augmented) arm must not quietly get extra steps in a
    # step-matched comparison
    steps = max(1, (total_steps // iters) * iters if iters <= total_steps
                else total_steps)
    warmup = min(200, max(1, steps // 10))
    sched = optax.warmup_cosine_decay_schedule(0.0, peak_lr, warmup, steps,
                                               peak_lr * 1e-2)
    opt = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    state = init_train_state(jax.random.PRNGKey(seed), opt, cfg)
    step = make_train_step(opt, cfg, weights)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    last = None
    done = 0
    while done < steps:
        perm = rng.permutation(n)
        for i in range(min(iters, steps - done)):
            idx = perm[i * batch_size : (i + 1) * batch_size]
            bx = X[idx]
            if jitter > 0.0:
                bx = jitter_within_bin(bx, P[idx], rng, amount=jitter)
            key, sub = jax.random.split(key)
            state, last = step(state, bx, P[idx], A[idx], sub)
            done += 1
    loss = float(last["loss"])  # sync point: includes all device work
    return state.params, steps, loss, time.time() - t0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-h", type=int, default=512)
    ap.add_argument("--size-z", type=int, default=128)
    ap.add_argument("--total-steps", type=int, default=12000,
                    help="optimizer-step budget per run (matched across arms; "
                         "realized steps = budget rounded down to whole "
                         "epochs, or a partial first epoch when one epoch "
                         "already exceeds the budget — never more)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--peak-lr", type=float, default=1e-3)
    ap.add_argument("--w-kld", type=float, default=0.002)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--seed-start", type=int, default=0,
                    help="first seed (resume an interrupted sweep / append "
                         "extra seeds without redoing finished ones)")
    ap.add_argument("--cap", type=int, default=2,
                    help="orbit copies per patch in the augmented arm "
                         "(-1 = full orbit)")
    ap.add_argument("--arms", default="baseline,orbit,canonical",
                    help="comma list from {baseline, orbit, canonical}: "
                         "orbit = expanded with permuted copies (one-to-many "
                         "decoder targets), canonical = every patch collapsed "
                         "to its orbit's canonical presentation (one-to-one)")
    ap.add_argument("--no-unroll", action="store_true",
                    help="batched-cadence path (fast compile; CPU dev runs)")
    ap.add_argument("--raw-dir", default=None)
    ap.add_argument("--out", default="runs/ab_orbit.jsonl",
                    help="JSON-lines results file (appended per finished run, "
                         "so an interrupted sweep keeps its completed runs)")
    ap.add_argument("--keep-checkpoints", action="store_true",
                    help="save each run's weights next to --out")
    args = ap.parse_args(argv)

    cfg = DXVAEConfig(size_h=args.size_h, size_z=args.size_z,
                      unroll=not args.no_unroll)
    weights = LossWeights(w_env=3.0, w_frq=6.0, w_kld=args.w_kld)

    # evaluate.py is the single source of the metric + split definitions
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "dxvae_eval", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "evaluate.py"))
    ev = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ev)

    raw_dir = args.raw_dir or default_raw_dir()
    full = DXDataset(raw_dir, save_dir="/tmp/dx_ab_cache")
    train_ds = DXDataset(raw_dir, save_dir="/tmp/dx_ab_cache", include="synprez")
    held = ev.held_out_split(full, train_ds)

    from dxvae_tpu.api import DXVAE
    from dxvae_tpu.parallel.train import make_eval_step

    eval_step = make_eval_step(cfg)
    arms = [a.strip() for a in args.arms.split(",") if a.strip()]
    unknown = set(arms) - {"baseline", "orbit", "canonical"}
    if unknown:
        raise SystemExit(f"unknown arms: {sorted(unknown)}")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    results = []
    for seed in range(args.seed_start, args.seed_start + args.seeds):
        for arm in arms:
            if arm == "orbit":
                cap = None if args.cap < 0 else args.cap
                data = orbit_augment(train_ds.batch, max_per_patch=cap,
                                     seed=seed)
            elif arm == "canonical":
                data = canonicalize_orbit(train_ds.batch)
            else:
                data = train_ds.batch
            params, steps, loss, wall = train_one(
                cfg, weights, data, args.total_steps, args.batch,
                args.peak_lr, seed)

            model = DXVAE(size_H=args.size_h, size_Z=args.size_z,
                          unroll=not args.no_unroll)
            model.params = params
            rec = {}
            if held is not None and len(held):
                rec["held_out"] = ev.reconstruction_metrics(
                    held, model.encode_decode(held))
                m = eval_step(model.params,
                              np.asarray(held.X, np.float32),
                              np.asarray(held.params, np.int32),
                              np.asarray(held.adj, np.float32))
                rec["held_out_elbo"] = round(float(m["loss"]), 4)
            R_train = model.encode_decode(train_ds.batch)
            rec["train"] = ev.reconstruction_metrics(train_ds.batch, R_train)
            rec["symmetry"] = ev._symmetry_metrics(model, train_ds.batch,
                                                   R=R_train)
            row = {"arm": arm, "seed": seed, "n_train": int(len(data)),
                   "steps": steps, "final_loss": round(loss, 4),
                   "wall_s": round(wall, 1), **_flatten(rec)}
            if args.keep_checkpoints:
                ck = os.path.join(os.path.dirname(os.path.abspath(args.out)),
                                  f"ab_{arm}_s{seed}.npz")
                save_checkpoint(ck, params, params_only=True)
                row["checkpoint"] = ck
            results.append(row)
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(json.dumps(row), flush=True)

    print(json.dumps(aggregate(results), indent=2))


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(_flatten(v, f"{prefix}{k}."))
        else:
            out[f"{prefix}{k}"] = v
    return out


def aggregate(rows):
    """mean +/- std per arm for the headline columns."""
    cols = ["final_loss", "held_out_elbo", "held_out.param_acc",
            "held_out.param_acc_orbit_aligned", "held_out.edge_acc",
            "train.param_acc", "train.param_acc_orbit_aligned",
            "symmetry.param_acc_permuted", "symmetry.param_acc_originals"]
    agg = {}
    for arm in sorted({r["arm"] for r in rows}):
        sub = [r for r in rows if r["arm"] == arm]
        agg[arm] = {"n_runs": len(sub)}
        for c in cols:
            vals = [r[c] for r in sub if c in r]
            if vals:
                agg[arm][c] = {"mean": round(float(np.mean(vals)), 4),
                               "std": round(float(np.std(vals)), 4)}
    return agg


if __name__ == "__main__":
    main()
