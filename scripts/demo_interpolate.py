"""Batched latent interpolation demo (BASELINE.json config 5).

Encodes two patches, walks the latent segment between them in N steps, and
decodes every step in ONE batched call — the autoregressive decoder is fully
vectorized over the batch, so a whole interpolation sweep costs one device
round trip.  Writes the sweep as 32-voice .syx banks.

Usage: python scripts/demo_interpolate.py [--a 12 --b 700 --steps 32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dxvae_tpu.api import DXVAE, DXDataset, graph_to_syx
from dxvae_tpu.graph import GraphBatch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", type=int, default=12)
    ap.add_argument("--b", type=int, default=700)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--checkpoint", default="checkpoints/dx_1024.npz")
    ap.add_argument("--out", default="generated/interp.syx")
    ap.add_argument("--raw-dir", default=None, help="bank directory (default: $DXVAE_RAW_DIR or the reference mount)")
    args = ap.parse_args()

    from dxvae_tpu.data.dataset import default_raw_dir
    ds = DXDataset(args.raw_dir or default_raw_dir(), save_dir="/tmp/dx_demo_cache", include="synprez")
    model = DXVAE(checkpoint=args.checkpoint)

    ends = ds[np.array([args.a, args.b])]
    mu, _ = model.encode(ends)
    mu = np.asarray(mu)

    t = np.linspace(0.0, 1.0, args.steps, dtype=np.float32)[:, None]
    z = (1.0 - t) * mu[0] + t * mu[1]  # (steps, Z)
    G = model.decode(z)

    # write banks of 32 (pad the last by repeating the final patch)
    n_banks = -(-args.steps // 32)
    for k in range(n_banks):
        win = slice(k * 32, (k + 1) * 32)

        def pad32(a):
            a = a[win]
            if len(a) < 32:
                a = np.concatenate([a, np.repeat(a[-1:], 32 - len(a), axis=0)])
            return a

        out = args.out if n_banks == 1 else args.out.replace(".syx", f"_{k}.syx")
        graph_to_syx(GraphBatch(pad32(G.X), pad32(G.params), pad32(G.adj)), out)
        print(f"wrote {out}")

    # summarize how the topology morphs along the path
    algs = G.params[:, 0, 18]
    print("algorithm along path:", algs.tolist())
    print("edge count along path:", G.adj.sum(axis=(1, 2)).astype(int).tolist())


if __name__ == "__main__":
    main()
