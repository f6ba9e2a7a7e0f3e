"""4096-patch bank generation, data-parallel (BASELINE.json config 5).

Samples 4096 latents from the prior and decodes them in sharded batches over
the device mesh (single-chip: one big vectorized batch; multi-chip: the batch
dimension shards over the 'data' axis).  Writes 128 32-voice .syx banks.

Usage: python scripts/generate_4096.py [--n 4096 --out-dir generated/banks]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dxvae_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()  # unrolled-program compiles take minutes cold (CLAUDE.md)
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--checkpoint", default="checkpoints/dx_1024.npz")
    ap.add_argument("--out-dir", default="generated/banks")
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from dxvae_tpu.data.sysex import params_to_syx_file
    from dxvae_tpu.models import DXVAEConfig, decode, init_params
    from dxvae_tpu.parallel.mesh import batch_sharding, make_mesh
    from dxvae_tpu.utils.checkpoint import load_checkpoint

    cfg = DXVAEConfig(compute_dtype=args.dtype)
    params = init_params(jax.random.PRNGKey(0), cfg)
    if os.path.exists(args.checkpoint):
        params = load_checkpoint(args.checkpoint, params)
    else:
        print(f"note: {args.checkpoint} missing; using fresh weights", file=sys.stderr)

    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    z = jax.device_put(
        np.asarray(jax.random.normal(jax.random.PRNGKey(args.seed), (args.n, cfg.size_z))),
        sharding,
    )

    dec = jax.jit(lambda p, z: decode(p, z, cfg))
    # warm up AND read back: compile outside the timed region, and fence the
    # warmup's device execution — without the readback it would still be
    # running when t0 starts (block_until_ready does not block on the
    # tunnel, CLAUDE.md) and the timed region would include both decodes
    np.asarray(dec(params, z)[1])
    t0 = time.time()
    X, P, adj = dec(params, z)
    P = np.asarray(P).astype(np.int32)  # host readback = the sync fence
    dt = time.time() - t0
    print(f"decoded {args.n} patches in {dt:.2f}s "
          f"({args.n/dt:.0f} patches/sec steady-state incl. the ~29 ms fixed "
          f"host-transfer cost) on {len(mesh.devices.flat)} device(s)")

    os.makedirs(args.out_dir, exist_ok=True)
    n_banks = -(-args.n // 32)  # pad the final short bank (bank_bytes rule)
    for k in range(n_banks):
        chunk = P[k * 32 : (k + 1) * 32]
        if len(chunk) < 32:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], 32 - len(chunk), axis=0)])
        params_to_syx_file(chunk, f"{args.out_dir}/bank_{k:03d}.syx")
    print(f"wrote {n_banks} banks to {args.out_dir}/")
    algs, counts = np.unique(P[:, 0, 18], return_counts=True)
    print(f"algorithm coverage: {len(algs)}/32 distinct")


if __name__ == "__main__":
    main()
