"""Reproduce the reference's hinted training recipe (main.py:61-64):
epochs=50, batch=32, lr=1e-3, w_env=3, w_frq=6, w_kld=0.002 on the
1024-patch SynprezFM set — producing this framework's dx_1024 checkpoint,
a per-step metrics CSV, and a generated bank from the trained weights."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dxvae_tpu.api import DXVAE, DXDataset, graph_to_syx
from dxvae_tpu.data.dataset import default_raw_dir

t0 = time.time()
ds = DXDataset(default_raw_dir(), save_dir="/tmp/dx_train_cache", include="synprez")
assert len(ds) == 1024
model = DXVAE(seed=0)
model.train(
    ds.batch,
    epochs=50,
    size_batch=32,
    lr=1e-3,
    checkpoint="checkpoints/dx_1024.npz",
    w_env=3.0,
    w_frq=6.0,
    w_kld=0.002,
    metrics_csv="runs/dx_1024_metrics.csv",
    shuffle_seed=0,
    save_every=10,
)
print(f"training wall: {time.time()-t0:.1f}s", file=sys.stderr)

G = model.generate(32)
graph_to_syx(G, "generated/gen_patch.syx")
print("wrote generated/gen_patch.syx", file=sys.stderr)
