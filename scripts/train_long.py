"""Extended training: resume from dx_1024 weights and run 200 more epochs of
the reference recipe, producing the dx_1024_long checkpoint + curve."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dxvae_tpu.api import DXVAE, DXDataset, graph_to_syx
from dxvae_tpu.data.dataset import default_raw_dir

t0 = time.time()
ds = DXDataset(default_raw_dir(), save_dir="/tmp/dx_train_cache", include="synprez")
model = DXVAE(checkpoint="checkpoints/dx_1024.npz", seed=1)
model.train(
    ds.batch, epochs=200, size_batch=32, lr=1e-3,
    checkpoint="/tmp/dx_1024_long_state.npz",
    w_env=3.0, w_frq=6.0, w_kld=0.002,
    metrics_csv="runs/dx_1024_long_metrics.csv",
    shuffle_seed=1, save_every=50, extra_epoch=False,
)
model.save("checkpoints/dx_1024_long.npz")
print(f"training wall: {time.time()-t0:.1f}s", file=sys.stderr)
G = model.generate(32)
graph_to_syx(G, "generated/gen_patch_long.syx")
