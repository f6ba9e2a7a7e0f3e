"""A/B: flow-matching latent prior vs the shipped GMM-32 ex-post prior.

The GMM ex-post prior (models/prior.py) is the largest generation-quality
win so far: fitting the aggregate posterior lifts valid-topology from ~11%
to ~43% on the 44M flagship (docs/PERF.md "Ex-post fitted prior").  A GMM is
a crude density model; this experiment asks whether a *continuous normalizing
flow* fitted to the same cloud samples better patches.

Method: rectified flow / flow matching (Liu et al. 2022, Lipman et al. 2022)
— train a small MLP velocity field v(z_t, t) on straight-line paths
z_t = (1-t)·eps + t·x between N(0,I) noise and whitened posterior samples,
regressing the constant target (x - eps); sample by Euler-integrating the ODE
from noise.  TPU-native: the whole training run is one jitted `lax.scan`
(the cloud rides in as a traced argument), sampling is a second scan.

Arms share ONE posterior cloud per seed (identical encode + draws), so the
comparison isolates the density model: standard N(0,I) anchor, GMM-32 fitted
on the cloud, flow fitted on the cloud.  Metrics are evaluate.py's
generation + novelty set (valid-topology, coverage, uniques, exact copies,
nn param disagreement) plus roundtrip self-consistency and a held-out-cloud
MSE for the flow (overfit guard).

Usage (TPU, ~minutes):
    python scripts/ab_flow_prior.py --checkpoint checkpoints/dx_h1024.npz
CPU micro (tests): --size-h 32 ... handled by passing a tiny checkpoint.
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
import jax.numpy as jnp
import optax


# --------------------------------------------------------------------------
# flow model: params as a plain pytree, no framework
# --------------------------------------------------------------------------

def _init_mlp(key, z_dim, hidden, depth, t_feats):
    """He-init MLP params: [z | fourier(t)] -> hidden^depth -> z."""
    sizes = [z_dim + 2 * t_feats] + [hidden] * depth + [z_dim]
    params = []
    for a, b in zip(sizes[:-1], sizes[1:]):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (a, b), jnp.float32) * jnp.sqrt(2.0 / a)
        params.append({"w": w, "b": jnp.zeros((b,), jnp.float32)})
    # zero-init the output layer: v≡0 at step 0 keeps early Euler samples at
    # the noise scale instead of exploding along an untrained field
    params[-1]["w"] = jnp.zeros_like(params[-1]["w"])
    return params


def _t_embed(t, n_feats):
    """Fourier time features: (B,) -> (B, 2*n_feats), log-spaced frequencies."""
    # log-spaced 1..1024: beyond ~2^10 the f32 sin of freq*2pi*t is aliasing
    # noise, so cap the band instead of doubling per feature
    freqs = 2.0 ** jnp.linspace(0.0, 10.0, n_feats, dtype=jnp.float32)
    ang = t[:, None] * freqs[None] * (2.0 * jnp.pi)
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _velocity(params, z, t, n_feats):
    h = jnp.concatenate([z, _t_embed(t, n_feats)], axis=-1)
    for layer in params[:-1]:
        h = jax.nn.silu(h @ layer["w"] + layer["b"])
    return h @ params[-1]["w"] + params[-1]["b"]


def fit_flow(cloud, key, steps=6000, batch=1024, lr=1e-3, hidden=512,
             depth=3, t_feats=32, val_frac=0.0625):
    """Fit a rectified-flow velocity field to latent samples (N, Z).

    Whitens the cloud (same rationale as fit_gmm: f32 conditioning), holds
    out ``val_frac`` of it, and runs the whole optimization as one jitted
    ``lax.scan``.  Returns (flow_params_dict, diagnostics)."""
    cloud = jnp.asarray(cloud, jnp.float32)
    n, z_dim = cloud.shape
    shift, scale = cloud.mean(0), cloud.std(0) + 1e-6
    zw = (cloud - shift) / scale
    k_perm, k_init, k_run = jax.random.split(key, 3)
    perm = jax.random.permutation(k_perm, n)
    n_val = max(1, int(n * val_frac))
    val, train = zw[perm[:n_val]], zw[perm[n_val:]]

    params0 = _init_mlp(k_init, z_dim, hidden, depth, t_feats)
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.01)
    opt = optax.adam(sched)

    def loss_fn(params, x, eps, t):
        z_t = (1.0 - t[:, None]) * eps + t[:, None] * x
        v = _velocity(params, z_t, t, t_feats)
        return jnp.mean((v - (x - eps)) ** 2)

    @jax.jit
    def run(params, train, val, key):
        opt_state = opt.init(params)

        def step(carry, sub):
            params, opt_state = carry
            k_idx, k_eps, k_t = jax.random.split(sub, 3)
            idx = jax.random.randint(k_idx, (batch,), 0, train.shape[0])
            x = train[idx]
            eps = jax.random.normal(k_eps, x.shape, jnp.float32)
            t = jax.random.uniform(k_t, (batch,), jnp.float32)
            loss, grads = jax.value_and_grad(loss_fn)(params, x, eps, t)
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        subs = jax.random.split(key, steps)
        (params, _), losses = jax.lax.scan(step, (params, opt_state), subs)

        # held-out flow-matching MSE (fixed eps/t grid for low variance)
        k_eps, k_t = jax.random.split(jax.random.PRNGKey(0))
        eps = jax.random.normal(k_eps, val.shape, jnp.float32)
        t = jax.random.uniform(k_t, (val.shape[0],), jnp.float32)
        return params, losses, loss_fn(params, val, eps, t)

    t0 = time.time()
    params, losses, val_mse = run(params0, train, val, k_run)
    diag = {"train_mse_first": round(float(losses[:50].mean()), 4),
            "train_mse_last": round(float(losses[-50:].mean()), 4),
            "val_mse": round(float(val_mse), 4),
            "fit_wall_s": round(time.time() - t0, 1)}
    return {"params": params, "shift": shift, "scale": scale,
            "t_feats": t_feats}, diag


def sample_flow(flow, key, n, ode_steps=64, temperature=1.0):
    """Euler-integrate the learned ODE from T-scaled noise: (n, Z) latents
    in the ORIGINAL (un-whitened) latent space."""
    z_dim = flow["shift"].shape[0]
    z0 = temperature * jax.random.normal(key, (n, z_dim), jnp.float32)
    dt = 1.0 / ode_steps

    @jax.jit
    def run(z):
        def step(z, i):
            t = jnp.full((n,), i * dt, jnp.float32)
            return z + dt * _velocity(flow["params"], z, t,
                                      flow["t_feats"]), None
        z, _ = jax.lax.scan(step, z, jnp.arange(ode_steps))
        return z

    return flow["shift"] + flow["scale"] * run(z0)


# --------------------------------------------------------------------------
# experiment driver
# --------------------------------------------------------------------------

def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="checkpoints/dx_h1024.npz")
    ap.add_argument("--n", type=int, default=512, help="samples per arm")
    ap.add_argument("--spp", type=int, default=8,
                    help="posterior draws per patch for the shared cloud")
    ap.add_argument("--flow-steps", type=int, default=6000)
    ap.add_argument("--flow-batch", type=int, default=1024)
    ap.add_argument("--flow-hidden", type=int, default=512)
    ap.add_argument("--flow-depth", type=int, default=3)
    ap.add_argument("--ode-steps", type=int, default=64)
    ap.add_argument("--gmm-k", type=int, default=32)
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--seed-start", type=int, default=0)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--no-unroll", action="store_true",
                    help="batched-cadence path (fast compile; CPU dev runs)")
    ap.add_argument("--arms", default="standard,gmm,flow")
    ap.add_argument("--raw-dir", default=None)
    ap.add_argument("--out", default="runs/ab_flow_prior.jsonl")
    args = ap.parse_args(argv)

    from scripts._lib import load_sibling

    ev = load_sibling("evaluate")
    from dxvae_tpu.api import DXVAE, DXDataset
    from dxvae_tpu.data.dataset import default_raw_dir
    from dxvae_tpu.models.prior import fit_gmm, sample_gmm
    from dxvae_tpu.utils.checkpoint import infer_sizes

    size_h, size_z = infer_sizes(args.checkpoint)
    model = DXVAE(size_H=size_h, size_Z=size_z, checkpoint=args.checkpoint,
                  unroll=not args.no_unroll)
    train = DXDataset(args.raw_dir or default_raw_dir(),
                      save_dir="/tmp/dx_flow_cache", include="synprez")
    mu, std = model.encode(train.batch)
    mu, std = jnp.asarray(mu), jnp.asarray(std)
    train_params = np.asarray(train.batch.params)

    arms = [a.strip() for a in args.arms.split(",") if a.strip()]
    unknown = set(arms) - {"standard", "gmm", "flow"}
    if unknown:
        raise SystemExit(f"unknown arms: {sorted(unknown)}")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".",
                exist_ok=True)

    rows = []
    for seed in range(args.seed_start, args.seed_start + args.seeds):
        # ONE shared cloud per seed: every density model sees identical data
        k_cloud, k_fit, k_sample = jax.random.split(
            jax.random.PRNGKey(1000 + seed), 3)
        eps = jax.random.normal(k_cloud, (mu.shape[0], args.spp, mu.shape[1]),
                                mu.dtype)
        cloud = (mu[:, None, :] + std[:, None, :] * eps).reshape(-1, mu.shape[1])

        for arm in arms:
            diag = {}
            t0 = time.time()
            if arm == "standard":
                z = args.temperature * jax.random.normal(
                    k_sample, (args.n, size_z), jnp.float32)
            elif arm == "gmm":
                prior = fit_gmm(cloud, n_components=args.gmm_k, n_iters=60,
                                key=k_fit)
                z = sample_gmm(prior, k_sample, args.n,
                               temperature=args.temperature)
            else:
                flow, diag = fit_flow(
                    cloud, k_fit, steps=args.flow_steps,
                    batch=args.flow_batch, lr=1e-3,
                    hidden=args.flow_hidden, depth=args.flow_depth)
                z = sample_flow(flow, k_sample, args.n,
                                ode_steps=args.ode_steps,
                                temperature=args.temperature)
            gen = model.decode(np.asarray(z))
            row = {"arm": arm, "seed": seed, "n": args.n,
                   "temperature": args.temperature,
                   "wall_s": round(time.time() - t0, 1), **diag}
            row.update(ev._generation_metrics(gen))
            row.update(ev._novelty(gen.params, train_params))
            R = model.encode_decode(gen)
            row["roundtrip_topology_retained"] = float(
                (gen.adj == R.adj).all(axis=(1, 2)).mean())
            rows.append(row)
            with open(args.out, "a") as fh:
                fh.write(json.dumps(row) + "\n")
            print(json.dumps(row), flush=True)

    agg = aggregate(rows)
    print(json.dumps(agg, indent=2))
    return rows, agg


def aggregate(rows):
    cols = ["valid_topology_rate", "alg_coverage", "unique_topologies",
            "exact_copy_rate", "mean_nn_param_disagreement",
            "roundtrip_topology_retained", "val_mse"]
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
