"""int8 quantized decode A/B: decision fidelity + AOT serving throughput.

The serving-quantization experiment (VERDICT r3 #7 / r4 #9): decode-side
matmuls in int8 (per-output-channel weight scales, dynamic per-row activation
scales, int32 MXU accumulation — ops/matmul.QuantizedWeight) behind the
non-parity ``DXVAEConfig.quantize_decode`` flag.  Two questions:

1. **Fidelity** — on a trained checkpoint, do the quantized decode's
   *decisions* (topology, integer params) match the exact path?  Scored like
   the bf16-decisions experiment (docs/PERF.md): agreement rates on the same
   z batch, plus validity of the generated topologies per arm.
2. **Throughput** — the win condition is the AOT/serving path.  Device-time
   decode A/B runs through bench.py (``--mode decode --quantize-decode
   int8``); this script covers the end-to-end served-artifact call (same
   pad/slice dispatch both arms, readback included identically so the delta
   is the artifact's own cost).

Usage (TPU): python scripts/ab_int8_decode.py [--checkpoint ...] [--out runs/ab_int8.jsonl]
CPU micro (tests): --size-h 32 --no-unroll --n 64 --skip-serving
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="checkpoints/dx_1024_xl.npz")
    ap.add_argument("--n", type=int, default=512, help="z samples for fidelity")
    ap.add_argument("--size-h", type=int, default=None,
                    help="fresh model of this size instead of the checkpoint "
                         "(CPU micro runs)")
    ap.add_argument("--no-unroll", action="store_true")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "bfloat16_mixed"],
                    help="baseline compute dtype (bf16 = the shipped serving "
                         "mode the int8 arm must beat)")
    ap.add_argument("--serving-batch", type=int, default=1024)
    ap.add_argument("--serving-repeats", type=int, default=9)
    ap.add_argument("--skip-serving", action="store_true")
    ap.add_argument("--out", default=None, help="append the JSON report here")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dxvae_tpu.api import DXVAE
    from dxvae_tpu.data.algorithms import match_algorithm

    if args.size_h:
        model = DXVAE(size_H=args.size_h, size_Z=max(8, args.size_h // 4),
                      seed=0, unroll=not args.no_unroll,
                      compute_dtype=args.dtype)
    else:
        from dxvae_tpu.utils.checkpoint import infer_sizes

        size_h, size_z = infer_sizes(args.checkpoint)
        model = DXVAE(size_H=size_h, size_Z=size_z,
                      checkpoint=args.checkpoint,
                      unroll=not args.no_unroll, compute_dtype=args.dtype)

    from dxvae_tpu.models import decode

    cfg = model.cfg
    cfg_q = cfg._replace(quantize_decode="int8")
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.n, cfg.size_z)).astype(np.float32))

    # jit each arm (static cfg via closure): un-jitted decode would dispatch
    # the 33-step cadence op-by-op over the tunnel — minutes instead of ms
    dec = jax.jit(lambda p, zz: decode(p, zz, cfg))
    dec_q = jax.jit(lambda p, zz: decode(p, zz, cfg_q))
    X0, P0, A0 = (np.asarray(a) for a in dec(model.params, z))
    Xq, Pq, Aq = (np.asarray(a) for a in dec_q(model.params, z))

    report = {
        "experiment": "int8_quantized_decode",
        "checkpoint": None if args.size_h else args.checkpoint,
        "n": args.n,
        "baseline_dtype": args.dtype,
        # decision fidelity vs the exact path on identical z
        "adj_agreement": round(float((A0 == Aq).mean()), 4),
        "topology_exact_agreement": round(
            float((A0 == Aq).all(axis=(1, 2)).mean()), 4),
        "param_agreement": round(float((P0 == Pq).mean()), 4),
        "alg_agreement": round(float((P0[:, 0, 18] == Pq[:, 0, 18]).mean()), 4),
        "x_mae": round(float(np.abs(X0 - Xq).mean()), 5),
        # does quantization change the QUALITY of what is generated, not just
        # which sample lands where?  valid-topology rate per arm
        "valid_rate_exact": round(float((match_algorithm(A0) >= 0).mean()), 4),
        "valid_rate_int8": round(float((match_algorithm(Aq) >= 0).mean()), 4),
    }

    if not args.skip_serving:
        from dxvae_tpu.serving import ServedDXVAE, export_bundle

        platform = jax.devices()[0].platform
        zb = np.asarray(z[: args.serving_batch] if args.n >= args.serving_batch
                        else np.tile(np.asarray(z),
                                     (args.serving_batch // args.n + 1, 1))[
                            : args.serving_batch], np.float32)
        times = {}
        for label, m_cfg in (("exact", cfg), ("int8", cfg_q)):
            model.cfg = m_cfg
            path = f"/tmp/ab_int8_{label}.npz"
            export_bundle(model, path, batch_sizes=(args.serving_batch,),
                          functions=("decode",), platforms=(platform,))
            srv = ServedDXVAE.load(path)
            srv.decode(zb)  # deserialize + warm
            ts = []
            for _ in range(args.serving_repeats):
                t0 = time.perf_counter()
                out = srv.decode(zb)
                np.asarray(out.params).sum()  # materialize identically both arms
                ts.append(time.perf_counter() - t0)
            ts.sort()
            times[label] = ts[len(ts) // 2]
        model.cfg = cfg
        report["serving_batch"] = args.serving_batch
        report["serving_ms_exact"] = round(times["exact"] * 1e3, 2)
        report["serving_ms_int8"] = round(times["int8"] * 1e3, 2)
        report["serving_speedup"] = round(times["exact"] / times["int8"], 3)

    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "a") as fh:
            fh.write(line + "\n")
    return report


if __name__ == "__main__":
    main()
