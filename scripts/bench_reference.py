"""Measure the reference's OWN throughput by executing it verbatim.

The reference publishes no performance numbers (SURVEY.md §6), so the only
way to make "beats the reference" quantitative is to run the reference code
itself — /root/reference/model.py unmodified under the tests/refshim dgl/mido
shims (the same harness the parity tests use) — and time it on hardware that
is actually available (torch CPU; the reference auto-selects cuda/cpu,
model.py:13, and no GPU exists in this image).

For an apples-to-apples *framework* comparison the script also times this
framework on the SAME CPU (JAX CPU backend, identical batch, f32, default
config), separating the framework win from the TPU hardware win.  TPU
numbers come from bench.py / scripts/bench_train.py and are cited, not
re-measured here.

Usage: python scripts/bench_reference.py [--batch 32] [--steps 5]
Writes a markdown-ready table to stdout and one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax

jax.config.update("jax_platforms", "cpu")  # CPU-vs-CPU comparison (CLAUDE.md)

import numpy as np
import torch


def time_reference(batch, steps, gen_batch):
    """Train-step + encode_decode throughput of /root/reference/model.py."""
    from refshim import loader
    from refshim import shim_dgl as sdgl

    loader.install("src_dst")
    ref_model_mod = loader.load_reference("model")

    from dxvae_tpu.data.dataset import DXDataset, default_raw_dir

    b = DXDataset(default_raw_dir(), save_dir="/tmp/dx_refexec_cache")[:batch]
    batch = len(b.X)  # the dataset may be smaller than requested (1056 patches)

    def make_graphs(n):
        G = []
        for i in range(n):
            src, dst = np.nonzero(b.adj[i % batch] > 0.5)
            g = sdgl.graph((src.tolist(), dst.tolist()))
            g.ndata["X"] = torch.from_numpy(b.X[i % batch].astype(np.float32))
            g.ndata["params"] = torch.from_numpy(b.params[i % batch].astype(np.float32))
            G.append(g)
        return G

    ref = ref_model_mod.DXVAE()
    opt = torch.optim.AdamW(ref.parameters(), lr=1e-3)

    # --- training step (forward + backward + AdamW), reference recipe batch
    G = make_graphs(batch)
    for _ in range(2):  # warmup (allocator, autograd graph)
        opt.zero_grad()
        loss = ref.forward(G)[0]
        loss.backward()
        opt.step()
    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss = ref.forward(G)[0]
        loss.backward()
        opt.step()
    train_s = (time.perf_counter() - t0) / steps

    # --- inference roundtrip (encode + full autoregressive decode)
    Gg = make_graphs(gen_batch)
    with torch.no_grad():
        ref.encode_decode(Gg)  # warmup
        t0 = time.perf_counter()
        ref.encode_decode(Gg)
        infer_s = time.perf_counter() - t0
    return train_s, batch / train_s, infer_s, gen_batch / infer_s


def time_ours_cpu(batch, steps, gen_batch):
    """Same measurements for this framework on the same CPU (f32, defaults)."""
    import jax.numpy as jnp

    from dxvae_tpu.data.dataset import DXDataset, default_raw_dir
    from dxvae_tpu.models import DXVAEConfig, decode, encode, init_params
    from dxvae_tpu.parallel.train import init_train_state, make_optimizer, make_train_step

    cfg = DXVAEConfig()
    b = DXDataset(default_raw_dir(), save_dir="/tmp/dx_refexec_cache")[:batch]
    batch = len(b.X)  # clamp to the available patches, same as time_reference
    X = jnp.asarray(b.X)
    P = jnp.asarray(b.params, jnp.float32)
    A = jnp.asarray(b.adj)

    opt = make_optimizer(1e-3)
    state = init_train_state(jax.random.PRNGKey(0), opt, cfg)
    step = make_train_step(opt, cfg)
    key = jax.random.PRNGKey(1)
    state, m = step(state, X, P, A, key)  # compile + warmup
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, X, P, A, key)
    jax.block_until_ready(m["loss"])
    train_s = (time.perf_counter() - t0) / steps

    @jax.jit
    def roundtrip(params, X, A):
        mu, _, _ = encode(params, X, A, cfg)
        return decode(params, mu, cfg)

    Xg, Ag = X[:gen_batch], A[:gen_batch]
    if gen_batch > batch:
        reps = -(-gen_batch // batch)
        Xg = jnp.tile(X, (reps, 1, 1))[:gen_batch]
        Ag = jnp.tile(A, (reps, 1, 1))[:gen_batch]
    out = roundtrip(state.params, Xg, Ag)  # compile + warmup
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = roundtrip(state.params, Xg, Ag)
    jax.block_until_ready(out)
    infer_s = time.perf_counter() - t0
    return train_s, batch / train_s, infer_s, gen_batch / infer_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32, help="training batch (reference recipe default)")
    ap.add_argument("--gen-batch", type=int, default=32, help="inference roundtrip batch")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--raw-dir", default=None,
                    help="bank directory (default: $DXVAE_RAW_DIR or the reference mount)")
    args = ap.parse_args()

    import os

    if args.raw_dir:
        os.environ["DXVAE_RAW_DIR"] = args.raw_dir

    n_cpus = os.cpu_count() or 1

    from dxvae_tpu.data.dataset import default_raw_dir
    from dxvae_tpu.data.dataset import DXDataset as _DS

    n_avail = len(_DS(default_raw_dir(), save_dir="/tmp/dx_refexec_cache"))
    if args.batch > n_avail:
        print(f"note: --batch clamped to the {n_avail}-patch dataset", file=sys.stderr)
        args.batch = n_avail

    rt_s, rt_pps, ri_s, ri_pps = time_reference(args.batch, args.steps, args.gen_batch)
    ot_s, ot_pps, oi_s, oi_pps = time_ours_cpu(args.batch, args.steps, args.gen_batch)

    print(f"\nhost: {n_cpus} CPU core(s) visible to both frameworks "
          f"(torch threads: {torch.get_num_threads()}); like-for-like = same host, "
          "default threading on both sides")
    print(f"| measurement (batch {args.batch}, f32) | reference (torch CPU) | "
          f"this framework (JAX CPU) | speedup |")
    print("|---|---|---|---|")
    print(f"| train step (fwd+bwd+AdamW) | {rt_s*1e3:.0f} ms = {rt_pps:,.0f} patches/s "
          f"| {ot_s*1e3:.1f} ms = {ot_pps:,.0f} patches/s | {ot_pps/rt_pps:.1f}x |")
    print(f"| encode+decode roundtrip (batch {args.gen_batch}) | {ri_s*1e3:.0f} ms = "
          f"{ri_pps:,.0f} patches/s | {oi_s*1e3:.1f} ms = {oi_pps:,.0f} patches/s "
          f"| {oi_pps/ri_pps:.1f}x |")
    print(json.dumps({
        "host_cpus": n_cpus,
        "batch": args.batch,
        "ref_train_pps": round(rt_pps, 1),
        "ours_cpu_train_pps": round(ot_pps, 1),
        "train_speedup_cpu": round(ot_pps / rt_pps, 1),
        "ref_roundtrip_pps": round(ri_pps, 1),
        "ours_cpu_roundtrip_pps": round(oi_pps, 1),
        "roundtrip_speedup_cpu": round(oi_pps / ri_pps, 1),
    }))


if __name__ == "__main__":
    main()
