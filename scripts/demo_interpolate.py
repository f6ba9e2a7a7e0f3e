"""Batched latent interpolation demo (BASELINE.json config 5).

Thin wrapper over the CLI workflow (``python -m dxvae_tpu interpolate``):
encodes two patches, walks the latent segment between them in N steps, and
decodes every step in ONE batched call — the autoregressive decoder is fully
vectorized over the batch, so a whole interpolation sweep costs one device
round trip.  Writes the sweep as 32-voice .syx banks.

Usage: python scripts/demo_interpolate.py [--a 12 --b 700 --steps 32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dxvae_tpu.api import DXDataset
from dxvae_tpu.cli import interpolate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", type=int, default=12)
    ap.add_argument("--b", type=int, default=700)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--checkpoint", default="checkpoints/dx_1024.npz")
    ap.add_argument("--out", default="generated/interp.syx")
    ap.add_argument("--project-topology", action="store_true")
    ap.add_argument("--raw-dir", default=None,
                    help="bank directory (default: $DXVAE_RAW_DIR or the reference mount)")
    args = ap.parse_args()

    from dxvae_tpu.data.dataset import default_raw_dir
    from dxvae_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()  # unrolled-decode first compile takes minutes
    ds = DXDataset(args.raw_dir or default_raw_dir(),
                   save_dir="/tmp/dx_demo_cache", include="synprez")
    interpolate(ds.batch, args.a, args.b, args.steps, args.checkpoint,
                out=args.out, project_topology=args.project_topology)


if __name__ == "__main__":
    main()
