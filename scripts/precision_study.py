"""Mixed-precision training convergence study (docs/PERF.md).

Trains the same model with identical seeds and batch order in each compute
mode and reports final training loss + wall time:

* float32          — reference-parity numerics
* bfloat16         — everything in the recurrence bf16 (fastest, known gap)
* bfloat16_mixed   — bf16 weights/matmuls, f32 activation islands
                     (VERDICT r1 #5: close the bf16 gap at >= 1.5x f32 speed)

Usage: python scripts/precision_study.py [--epochs 500 --batch 128]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax

from dxvae_tpu.data.dataset import DXDataset
from dxvae_tpu.models import DXVAEConfig, LossWeights
from dxvae_tpu.parallel.train import init_train_state, make_optimizer, make_train_step
from dxvae_tpu.utils.profiling import enable_persistent_cache

enable_persistent_cache()

ap = argparse.ArgumentParser()
ap.add_argument("--epochs", type=int, default=500)
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--lr", type=float, default=1e-3)
ap.add_argument("--modes", nargs="+",
                default=["float32", "bfloat16", "bfloat16_mixed"])
ap.add_argument("--raw-dir", default=None,
                help="bank directory (default: $DXVAE_RAW_DIR or the reference mount)")
args = ap.parse_args()

from dxvae_tpu.data.dataset import default_raw_dir
ds = DXDataset(args.raw_dir or default_raw_dir(), save_dir="/tmp/dx_prec_cache", include="synprez")
X = np.asarray(ds.batch.X, np.float32)
P = np.asarray(ds.batch.params, np.int32)
A = np.asarray(ds.batch.adj, np.float32)
n = len(ds)
iters = n // args.batch
if iters == 0:
    raise SystemExit(f"--batch {args.batch} exceeds the {n}-patch dataset: zero steps per epoch")

results = {}
for mode in args.modes:
    cfg = DXVAEConfig(unroll=True, compute_dtype=mode)
    opt = make_optimizer(args.lr)
    state = init_train_state(jax.random.PRNGKey(0), opt, cfg)
    step = make_train_step(opt, cfg, LossWeights())
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    # compile outside the clock
    perm0 = rng.permutation(n)
    state, m = step(state, X[perm0[: args.batch]], P[perm0[: args.batch]],
                    A[perm0[: args.batch]], key)
    float(m["loss"])
    # reset and train for real
    rng = np.random.default_rng(0)
    state = init_train_state(jax.random.PRNGKey(0), opt, cfg)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    last = None
    for epoch in range(args.epochs):
        perm = rng.permutation(n)
        for i in range(iters):
            idx = perm[i * args.batch : (i + 1) * args.batch]
            key, sub = jax.random.split(key)
            state, last = step(state, X[idx], P[idx], A[idx], sub)
    final = float(last["loss"])  # syncs
    wall = time.time() - t0
    results[mode] = {"final_loss": round(final, 4), "wall_s": round(wall, 1)}
    print(f"{mode:16s} final loss {final:.4f}  wall {wall:.1f}s", flush=True)

f32 = results.get("float32")
if f32:
    for mode, r in results.items():
        r["loss_vs_f32"] = round(r["final_loss"] / f32["final_loss"], 3)
        r["speedup_vs_f32"] = round(f32["wall_s"] / r["wall_s"], 2)
print(json.dumps(results))
