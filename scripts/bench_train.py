"""Training-step throughput benchmark (secondary metric; the headline
encode+decode benchmark is bench.py).

Reports training patches/sec for the jitted AdamW step at a given batch size,
using the same two-K chained methodology as bench.py.
"""
import argparse, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    from dxvae_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()  # unrolled-program compiles take minutes cold (CLAUDE.md)
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "bfloat16_mixed"])
    ap.add_argument("--k-lo", type=int, default=2)
    ap.add_argument("--k-hi", type=int, default=10)
    ap.add_argument("--scan", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the cadence on the backward pass "
                         "(DXVAEConfig.remat): trades recompute FLOPs for "
                         "activation memory — the max-batch headroom lever")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--raw-dir", default=None, help="bank directory (default: $DXVAE_RAW_DIR or the reference mount)")
    args = ap.parse_args()

    import jax, jax.numpy as jnp, optax
    from dxvae_tpu.data.dataset import DXDataset, default_raw_dir
    from dxvae_tpu.models import DXVAEConfig, LossWeights, forward, init_params
    from dxvae_tpu.parallel.train import init_train_state, make_optimizer

    cfg = DXVAEConfig(compute_dtype=args.dtype, unroll=not args.scan,
                      remat=args.remat)
    n = args.batch
    b = DXDataset(args.raw_dir or default_raw_dir(), save_dir="/tmp/dx_tb_cache",
                  include="synprez").batch.tile_to(n)
    X, P, A = jnp.asarray(b.X), jnp.asarray(b.params), jnp.asarray(b.adj)

    opt = make_optimizer(1e-3)
    state = init_train_state(jax.random.PRNGKey(0), opt, cfg)

    # traced trip count (bench.py methodology, CLAUDE.md): ONE compiled
    # program serves every K — the unrolled train step is a minutes-long
    # compile, so closing over k would pay it once per K value
    @jax.jit
    def run(state, key, k):
        def body(i, carry):
            st, key = carry
            key, sub = jax.random.split(key)
            def loss_fn(p):
                t, _ = forward(p, X, P, A, key=sub, training=True,
                               weights=LossWeights(), cfg=cfg)
                return t
            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            upd, opt_state = opt.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, upd)
            return st._replace(params=params, opt_state=opt_state,
                               step=st.step + 1), key
        st, _ = jax.lax.fori_loop(0, k, body, (state, key))
        # the loop carry threads the FULL update through every iteration, so
        # no gradient can be dead-code-eliminated; one scalar read syncs
        return st.params["h_to_mu"]["b"].sum()

    key = jax.random.PRNGKey(1)
    klo, khi = jnp.int32(args.k_lo), jnp.int32(args.k_hi)
    float(run(state, key, klo)); float(run(state, key, khi))  # warm (one compile)
    ests = []
    for _ in range(args.repeats):
        t0 = time.perf_counter(); float(run(state, key, klo)); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(state, key, khi)); th = time.perf_counter() - t0
        ests.append((th - tl) / (args.k_hi - args.k_lo))
    ests.sort()
    per = ests[len(ests) // 2]
    if per <= 0 or ests[-1] > 2 * max(ests[0], 1e-9):
        print(f"# WARNING: two-K estimates noise-dominated "
              f"({[f'{e*1e3:.2f}ms' for e in ests]}); raise --k-hi or --repeats",
              file=sys.stderr)
    print(f"train step: {per*1e3:.2f} ms @ batch {n} ({n/per:.0f} patches/sec) "
          f"dtype {args.dtype}{' remat' if args.remat else ''}")


if __name__ == "__main__":
    main()
