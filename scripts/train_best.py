"""Beyond-reference training: cosine LR schedule + larger batch on the
1024-patch baseline set, using the raw jitted train step directly.

Also supports model-size scaling studies, e.g. the 44M-parameter variant:
    python scripts/train_best.py --size-h 1024 --size-z 256 --epochs 2000 \
        --peak-lr 5e-4 --checkpoint /tmp/dx_h1024.npz
(Finding: at this dataset size held-out reconstruction is data-limited —
the 44M model matches the 12M model's generalization.)"""
import argparse
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, optax

from dxvae_tpu.data.dataset import DXDataset, default_raw_dir
from dxvae_tpu.models import DXVAEConfig, LossWeights, param_count
from dxvae_tpu.parallel.train import TrainState, init_train_state, make_train_step
from dxvae_tpu.utils.checkpoint import save_checkpoint
from dxvae_tpu.utils.profiling import enable_persistent_cache

enable_persistent_cache()
ap = argparse.ArgumentParser()
ap.add_argument("--epochs", type=int, default=5000)
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--peak-lr", type=float, default=1e-3)
ap.add_argument("--size-h", type=int, default=512)
ap.add_argument("--size-z", type=int, default=128)
ap.add_argument("--checkpoint", default="checkpoints/dx_1024_best.npz")
ap.add_argument("--w-kld", type=float, default=0.002,
                help="KL weight: 0.002 (default) optimizes reconstruction; "
                     "higher values (e.g. 0.01) tighten the posterior toward "
                     "the prior for better prior-sample generation")
ap.add_argument("--anneal-frac", type=float, default=0.0,
                help="KL warmup: ramp w_kld linearly from 0 to --w-kld over "
                     "this fraction of total steps (0 = constant weight). "
                     "Measured: --anneal-frac 0.2 --w-kld 0.01 is the best "
                     "recipe for fitted-prior generation (docs/PERF.md)")
ap.add_argument("--raw-dir", default=None,
                help="bank directory (default: $DXVAE_RAW_DIR or the reference mount)")
ap.add_argument("--augment-orbit", type=int, default=None, nargs="?", const=-1,
                metavar="CAP",
                help="expand the training set with operator-permuted copies "
                     "along each patch's algorithm automorphisms "
                     "(data/algorithms.orbit_augment); CAP caps copies per "
                     "patch, bare flag = full orbit (CAP=2 measured best — "
                     "docs/PERF.md orbit A/B).  For step-matched A/Bs "
                     "scale --epochs down by the expansion factor")
ap.add_argument("--canonicalize-orbit", action="store_true",
                help="collapse every patch to the canonical presentation of "
                     "its automorphism orbit before training (one decoder "
                     "target per latent; mutually exclusive with "
                     "--augment-orbit)")
ap.add_argument("--val-banks", type=int, default=0, metavar="K",
                help="hold out K banks (interleaved over the corpus) as a "
                     "validation split, score val ELBO every --val-every "
                     "epochs, and keep the best-val checkpoint alongside "
                     "the final one (<checkpoint>.best.npz).  Motivated by "
                     "the measured over-training effect: longer schedules "
                     "sharpen reconstruction but DEGRADE prior sampling "
                     "(docs/PERF.md scaling study), and single-bank "
                     "held-out numbers are noise-dominated (CV section) — "
                     "val ELBO on >=2 banks is the principled stopping "
                     "signal")
ap.add_argument("--val-every", type=int, default=500,
                help="epochs between val-ELBO evaluations (with --val-banks)")
ap.add_argument("--no-unroll", action="store_true",
                help="batched-cadence path (fast compile; CPU dev runs)")
ap.add_argument("--weight-decay", type=float, default=0.01,
                help="AdamW decoupled weight decay (0.01 = the torch-parity "
                     "default; measured a dead lever on the CV gate, "
                     "docs/PERF.md 'Recipe levers')")
ap.add_argument("--dropout", type=float, default=0.0,
                help="decoder-head dropout rate (DXVAEConfig.head_dropout); "
                     "0.1 + --jitter 1.0 is the measured-best generalization "
                     "recipe (docs/PERF.md 'Recipe levers')")
ap.add_argument("--jitter", type=float, default=0.0,
                help="within-quantization-bin feature jitter amount in "
                     "(0,1]: per-batch host-side augmentation of X "
                     "(data/augment.py); acoustically identical inputs")
args = ap.parse_args()
if args.canonicalize_orbit and args.augment_orbit is not None:
    raise SystemExit("--canonicalize-orbit and --augment-orbit are mutually "
                     "exclusive (canonicalizing augmented copies collapses "
                     "them to duplicates)")

EPOCHS, BATCH, PEAK_LR = args.epochs, args.batch, args.peak_lr
cfg = DXVAEConfig(size_h=args.size_h, size_z=args.size_z,
                  unroll=not args.no_unroll, head_dropout=args.dropout)
weights = LossWeights(w_env=3.0, w_frq=6.0, w_kld=args.w_kld)

ds = DXDataset(args.raw_dir or default_raw_dir(), save_dir="/tmp/dx_best_cache", include="synprez")
batch = ds.batch
VX = VP = VA = None
if args.val_banks:
    n_banks = len(batch.X) // 32
    if not 2 <= args.val_banks < n_banks:
        raise SystemExit(f"--val-banks must be in [2, {n_banks}) "
                         "(single-bank val ELBO is noise-dominated, "
                         "docs/PERF.md CV section)")
    # interleaved bank pick (contiguous blocks confound with the corpus's
    # bank numbering — same rationale as cv_generalization.fold_banks)
    if args.val_every < 1:
        raise SystemExit(f"--val-every must be >= 1, got {args.val_every}")
    stride = max(1, n_banks // args.val_banks)
    val_banks = list(range(0, n_banks, stride))[: args.val_banks]
    vmask = np.isin(np.arange(len(batch.X)) // 32, val_banks)
    val, batch = batch[vmask], batch[~vmask]
    print(f"validation split: banks {val_banks} ({len(val.X)} patches held "
          f"out of {len(vmask)})")
else:
    val = None
if args.augment_orbit is not None:
    from dxvae_tpu.data.algorithms import orbit_augment
    n_base = len(batch.X)  # train split only — val banks are never augmented
    batch = orbit_augment(
        batch,
        max_per_patch=None if args.augment_orbit < 0 else args.augment_orbit)
    print(f"orbit augmentation: {n_base} -> {len(batch.X)} patches")
elif args.canonicalize_orbit:
    from dxvae_tpu.data.algorithms import canonicalize_orbit
    batch = canonicalize_orbit(batch)
    if val is not None:
        # objective consistency: the decoder is trained on canonical
        # presentations only, so val ELBO on non-canonical patches would
        # mix generalization with orbit-presentation mismatch
        val = canonicalize_orbit(val)
    print(f"orbit canonicalization: {len(batch.X)} patches -> canonical "
          "presentation")
if val is not None:
    VX = np.asarray(val.X, np.float32)
    VP = np.asarray(val.params, np.int32)
    VA = np.asarray(val.adj, np.float32)
X = np.asarray(batch.X, np.float32)
P = np.asarray(batch.params, np.int32)
A = np.asarray(batch.adj, np.float32)
n = len(X)
iters = n // BATCH
if iters == 0:
    raise SystemExit(f"--batch {BATCH} exceeds the {n}-patch dataset: zero steps per epoch")
total_steps = EPOCHS * iters

warmup = min(200, max(1, total_steps // 10))
sched = optax.warmup_cosine_decay_schedule(0.0, PEAK_LR, warmup, total_steps, PEAK_LR * 1e-2)
opt = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                  weight_decay=args.weight_decay)
state = init_train_state(jax.random.PRNGKey(0), opt, cfg)
print("params:", param_count(state.params))
step = make_train_step(opt, cfg, weights)

anneal_steps = int(total_steps * args.anneal_frac)
if VX is not None:
    from dxvae_tpu.parallel.train import make_eval_step

    eval_step = make_eval_step(cfg, weights)
    best_val, best_epoch = float("inf"), -1
    best_path = (args.checkpoint[:-4] if args.checkpoint.endswith(".npz")
                 else args.checkpoint) + ".best.npz"
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(1)
t0 = time.time()
last = None
gstep = 0
if args.jitter > 0.0:
    from dxvae_tpu.data.augment import jitter_within_bin
for epoch in range(EPOCHS):
    perm = rng.permutation(n)
    for i in range(iters):
        idx = perm[i * BATCH : (i + 1) * BATCH]
        key, sub = jax.random.split(key)
        bx = X[idx]
        if args.jitter > 0.0:
            # fresh within-bin presentation every epoch (host-side; the
            # quantizer maps any within-bin X to the same integer targets)
            bx = jitter_within_bin(bx, P[idx], rng, amount=args.jitter)
        if anneal_steps:
            # traced scalar: the schedule costs zero retraces
            w = np.float32(args.w_kld * min(1.0, gstep / anneal_steps))
            state, m = step(state, bx, P[idx], A[idx], sub, w)
        else:
            state, m = step(state, bx, P[idx], A[idx], sub)
        last = m
        gstep += 1
    if epoch % 500 == 0 or epoch == EPOCHS - 1:
        print(f"epoch {epoch}: loss {float(last['loss']):.4f} "
              f"(wall {time.time()-t0:.0f}s)", flush=True)
        # periodic checkpoint on the same cadence: the tunnel can stall/reap
        # multi-hour runs, and losing 5000 epochs to a crash at 4999 is the
        # failure mode api.DXVAE.train's save_every exists for
        save_checkpoint(args.checkpoint, state.params, params_only=True)
    if VX is not None and (epoch % args.val_every == 0 or epoch == EPOCHS - 1):
        v = float(eval_step(state.params, VX, VP, VA)["loss"])
        mark = ""
        if v < best_val:
            best_val, best_epoch = v, epoch
            save_checkpoint(best_path, state.params, params_only=True)
            mark = "  (new best -> saved)"
        print(f"epoch {epoch}: val_elbo {v:.4f}{mark}", flush=True)
save_checkpoint(args.checkpoint, state.params, params_only=True)
print(f"done in {time.time()-t0:.0f}s; final loss {float(last['loss']):.4f}")
if VX is not None:
    print(f"best val_elbo {best_val:.4f} at epoch {best_epoch} "
          f"(kept in {best_path}; final weights in {args.checkpoint})")
