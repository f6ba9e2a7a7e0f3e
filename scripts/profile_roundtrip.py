"""Capture an XProf/TensorBoard trace of the encode+decode round trip.

Writes a trace directory consumable by TensorBoard's profile plugin / xprof.

Usage: python scripts/profile_roundtrip.py [--batch 1024 --logdir runs/trace]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dxvae_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()  # unrolled-program compiles take minutes cold (CLAUDE.md)
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--logdir", default="runs/trace")
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--raw-dir", default=None, help="bank directory (default: $DXVAE_RAW_DIR or the reference mount)")
    args = ap.parse_args()

    from dxvae_tpu.data.dataset import DXDataset, default_raw_dir
    from dxvae_tpu.models import DXVAEConfig, decode, encode, init_params
    from dxvae_tpu.utils.profiling import trace

    cfg = DXVAEConfig(compute_dtype=args.dtype)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ds = DXDataset(args.raw_dir or default_raw_dir(), save_dir="/tmp/dx_prof_cache", include="synprez")
    b = ds.batch.tile_to(args.batch)
    X = jnp.asarray(b.X)
    adj = jnp.asarray(b.adj)

    @jax.jit
    def roundtrip(params, X, adj):
        mu, _, _ = encode(params, X, adj, cfg)
        _, P, _ = decode(params, mu, cfg)
        return P.sum()

    float(roundtrip(params, X, adj))  # compile outside the trace
    with trace(args.logdir):
        for _ in range(3):
            float(roundtrip(params, X, adj))
    files = glob.glob(f"{args.logdir}/**/*", recursive=True)
    print(f"trace written: {args.logdir} ({len(files)} files)")


if __name__ == "__main__":
    main()
