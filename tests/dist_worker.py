"""One process of the multi-process training test (tests/test_distributed.py).

Not a test module — launched N times as a subprocess, each instance owning 4
virtual CPU devices; together they form one global 4N-device jax runtime over
a local gloo coordinator and run the REAL DXVAE.train loop SPMD.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root


def main() -> int:
    coord, nproc, pid, workdir, raw_dir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5])
    n_model = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    mode = sys.argv[7] if len(sys.argv) > 7 else "train"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from dxvae_tpu.parallel.distributed import init_distributed, is_primary, process_count

    init_distributed(coord, nproc, pid)
    init_distributed(coord, nproc, pid)  # documented contract: re-entry no-ops
    assert process_count() == nproc
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert len(jax.local_devices()) == 4

    from dxvae_tpu.api import DXVAE
    from dxvae_tpu.data.dataset import DXDataset

    G = DXDataset(raw_dir, save_dir=f"{workdir}/cache{pid}",
                  include="synprez").batch[:64]

    model = DXVAE(size_H=32, size_Z=16, seed=3, unroll=False)

    if mode == "full":
        # uninterrupted reference run for the kill+resume A/B: 6 epochs,
        # final full state published for the resumed run to match
        model.train(G, epochs=6, size_batch=32, lr=1e-3, n_model=n_model,
                    checkpoint=f"{workdir}/full.npz", extra_epoch=False,
                    shuffle_seed=7)
        if is_primary():
            print("PRIMARY_DONE", flush=True)
        return 0

    if mode == "killrun":
        # hard mid-run kill (VERDICT r3 #5): a watcher thread SIGKILLs this
        # process the moment the first per-epoch checkpoint is published —
        # both ranks die mid-epoch with work in flight, exactly like a
        # preempted pod host.  The atomic npz publish guarantees whatever
        # boundary the file holds is a complete, loadable TrainState.
        import os
        import signal
        import threading
        import time as _t

        ck = f"{workdir}/dist.npz"

        def _assassin():
            while not os.path.exists(ck):
                _t.sleep(0.001)
            os.kill(os.getpid(), signal.SIGKILL)

        threading.Thread(target=_assassin, daemon=True).start()
        model.train(G, epochs=6, size_batch=32, lr=1e-3, n_model=n_model,
                    checkpoint=ck, save_every=1, extra_epoch=False,
                    shuffle_seed=7)
        print("SURVIVED", flush=True)  # parent treats this as a test bug
        return 0

    if mode == "resume":
        # fresh process (fresh key stream), same model seed + train args:
        # resume= restores the TrainState and fast-forwards the shuffle/key
        # streams, so the remaining epochs replay the uninterrupted run's
        model.train(G, epochs=6, size_batch=32, lr=1e-3, n_model=n_model,
                    resume=f"{workdir}/dist.npz",
                    checkpoint=f"{workdir}/resumed.npz", extra_epoch=False,
                    shuffle_seed=7)
        if is_primary():
            print("PRIMARY_DONE", flush=True)
        return 0

    if mode == "diverge":
        # multi-process divergence abort (api.py failure detection): an
        # absurd LR overflows the weights, the (replicated) loss goes
        # non-finite on every rank; every rank must raise — no collective
        # deadlock — and the PRIMARY must publish the diverged-state
        # snapshot via the gather-before-raise path.  (NaN INPUT cannot be
        # used here: jax's multihost device_put consistency check trips on
        # NaN != NaN before training starts.)
        import glob

        try:
            model.train(G, epochs=10, size_batch=32, lr=1e18,
                        n_model=n_model, checkpoint=f"{workdir}/dist.npz",
                        save_every=1000, extra_epoch=False, shuffle_seed=7)
        except FloatingPointError as e:
            assert "non-finite" in str(e), e
            if is_primary():
                assert glob.glob(f"{workdir}/dist.npz.diverged_epoch*.npz"), \
                    "primary did not publish the diverged-state snapshot"
            print("DIVERGED_OK", flush=True)
            return 0
        raise AssertionError("divergence abort did not fire")

    if n_model == 1:
        # mesh-span guard: size_batch=34 auto-shrinks n_data to 2 of 8 global
        # devices, which would strand the other host's devices — every rank
        # must get the same loud ValueError instead of a collective deadlock
        try:
            model.train(G, epochs=1, size_batch=34, extra_epoch=False)
        except ValueError as e:
            assert "span all" in str(e), e
        else:
            raise AssertionError("mesh-span guard did not fire")
    model.train(
        G, epochs=2, size_batch=32, lr=1e-3, n_model=n_model,
        checkpoint=f"{workdir}/dist.npz",       # written by the primary only
        metrics_csv=f"{workdir}/dist.csv",      # likewise
        extra_epoch=False, shuffle_seed=7,
    )
    if n_model > 1:
        # the post-train binding must be fully replicated so every host can
        # read the weights (model.save / forward after a TP pod run)
        import numpy as np
        leaf = jax.tree.leaves(model.params)[0]
        assert leaf.sharding.is_fully_replicated, leaf.sharding
        assert np.isfinite(np.asarray(leaf)).all()
    if is_primary():
        print("PRIMARY_DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
