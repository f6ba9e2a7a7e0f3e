"""Command-line driver.

Exposes the reference's driver workflows (main.py:12-47) — ``train_new``,
``train_on``, ``decode_test``, ``generate_test``, ``forward_test``, plus bank
export — behind a real argparse CLI (the reference requires editing commented
lines in ``__main__``, main.py:50-77).

    python -m dxvae_tpu.cli train-new --raw-dir DX_data --epochs 50 \
        --w-env 3 --w-frq 6 --w-kld 0.002 --checkpoint checkpoints/dx_1024.npz
    python -m dxvae_tpu.cli generate --n 32 --checkpoint ... --out gen_patch.syx
"""

from __future__ import annotations

import argparse

import numpy as np

from dxvae_tpu.api import DXVAE, DXDataset
from dxvae_tpu.graph import GraphBatch
from dxvae_tpu.utils.config import TrainConfig


def print_data(G: GraphBatch) -> None:
    """Per-graph params + edge list dump (main.py:6-9 contract)."""
    for idx in range(len(G)):
        print(f"#{idx} Params:\n", G.params[idx])
        src, dst = np.nonzero(G.adj[idx] > 0.5)
        # .tolist(): numpy>=2 scalar reprs (np.int64(3)) would break the
        # readable dump contract (main.py:6-9)
        print(f"#{idx} Edges:\n", (src.tolist(), dst.tolist()), "\n")


def _load_graphs(args) -> GraphBatch:
    ds = DXDataset(args.raw_dir, include="synprez" if args.synprez_only else None)
    return ds.batch


def _model_for(chk, seed=0):
    """DXVAE sized to fit ``chk``: model sizes are inferred from the stored
    tensor shapes of an existing .npz, so non-default checkpoints (e.g. the
    44M dx_h1024) load from the CLI without flags."""
    from pathlib import Path

    if chk is not None and Path(chk).suffix == ".npz" and Path(chk).exists():
        from dxvae_tpu.utils.checkpoint import infer_sizes

        size_h, size_z = infer_sizes(chk)
        return DXVAE(size_H=size_h, size_Z=size_z, checkpoint=chk, seed=seed)
    return DXVAE(checkpoint=chk, seed=seed)


def train_new(G, chk, epochs, size_batch, lr, w_env, w_frq, w_kld, seed=0, **kw):
    model = DXVAE(seed=seed)
    # keywords, not positions: train()'s signature has optional params
    # (resume=...) between `checkpoint` and the loss weights
    model.train(G, epochs, size_batch, lr, checkpoint=chk,
                w_env=w_env, w_frq=w_frq, w_kld=w_kld, **kw)
    return model


def train_on(G, chk, epochs, size_batch, lr, w_env, w_frq, w_kld, seed=0, **kw):
    model = _model_for(chk, seed)
    model.train(G, epochs, size_batch, lr, checkpoint=chk,
                w_env=w_env, w_frq=w_frq, w_kld=w_kld, **kw)
    return model


def decode_test(G_en, chk, stochastic=False, printout=True, seed=0):
    model = _model_for(chk, seed)
    G_de = model.encode_decode(G_en, stochastic=stochastic)
    if printout:
        print("[ Encode ]")
        print_data(G_en)
        print("[ Decode ]")
        print_data(G_de)
    return G_de


def generate_test(n=1, chk=None, printout=True, seed=0, project_topology=False,
                  alg=None, fit_from=None, n_components=32, prior_path=None,
                  save_prior_path=None, temperature=1.0, valid_only=False,
                  topology=None, alg_temperature=1.0):
    model = _model_for(chk, seed)
    if prior_path is not None:
        model.load_prior(prior_path)
    elif fit_from is not None:
        model.fit_prior(fit_from, n_components=n_components)
    if save_prior_path is not None:
        model.save_prior(save_prior_path)
        print(f"wrote prior {save_prior_path}")
    fitted = prior_path is not None or fit_from is not None
    G_gen = model.generate(n, project_topology=project_topology, alg=alg,
                           prior="fitted" if fitted else "standard",
                           temperature=temperature, valid_only=valid_only,
                           topology=topology, alg_temperature=alg_temperature)
    if printout:
        print("[ Generate ]")
        print_data(G_gen)
    return G_gen


def interpolate(G, a=0, b=1, steps=32, chk=None, seed=0, out=None,
                project_topology=False, checksum="parity", printout=True):
    """Walk the latent segment between patches ``a`` and ``b`` of ``G`` in
    ``steps`` steps and decode the whole path in ONE batched call — the
    autoregressive decoder is vectorized over the batch, so the sweep costs
    a single device round trip (beyond-reference; BASELINE.json config 5).
    ``out`` writes the path as 32-voice .syx banks, the last padded by
    repeating the final patch."""
    if steps < 2:
        raise ValueError("interpolation needs steps >= 2 (the two endpoints)")
    model = _model_for(chk, seed)
    mu, _ = model.encode(G[np.array([a, b])])
    mu = np.asarray(mu)
    t = np.linspace(0.0, 1.0, steps, dtype=np.float32)[:, None]
    G_path = model.decode((1.0 - t) * mu[0] + t * mu[1],
                          project_topology=project_topology)
    if printout:
        print("algorithm along path:", G_path.params[:, 0, 18].tolist())
        print("edge count along path:",
              G_path.adj.sum(axis=(1, 2)).astype(int).tolist())
    if out:
        from pathlib import Path as _P

        from dxvae_tpu.serving import bank_bytes

        for k in range(-(-steps // 32)):
            win = GraphBatch(*(np.asarray(f)[k * 32:(k + 1) * 32]
                               for f in G_path))
            if steps <= 32:
                path = out
            else:
                p = _P(out)
                path = str(p.with_name(f"{p.stem}_{k}{p.suffix or '.syx'}"))
            # bank_bytes pads a short final chunk by repeating its last patch
            _P(path).write_bytes(bank_bytes(win, checksum=checksum))
            print(f"wrote {path}")
    return G_path


def build_search_index(ds, chk=None, seed=0, model=None) -> dict:
    """Encode the whole corpus ONCE into a reusable latent index: posterior
    means plus display provenance (voice names, source bank, algorithm).
    Persist with ``np.savez`` (CLI ``--save-index``); later searches load it
    instead of re-encoding the library (beyond-reference)."""
    model = model if model is not None else _model_for(chk, seed)
    mu, _ = model.encode(ds.batch)
    prov = [ds.provenance(i) for i in range(len(ds))]
    return {
        "mu": np.asarray(mu, np.float32),
        "names": np.asarray(ds.names),
        "bank": np.asarray([str(f) for f, _ in prov]),
        "voice": np.asarray([v for _, v in prov], np.int32),
        "alg": np.asarray(ds.batch.params[:, 0, 18], np.int32),
        "checkpoint": np.asarray("" if chk is None else str(chk)),
    }


def search_index(index: dict, query: GraphBatch, k=5, chk=None, seed=0,
                 metric="l2", printout=True, model=None):
    """k nearest index entries to a query patch in posterior-mean space.
    The query is encoded with ``chk`` — use the same checkpoint the index
    was built with (a mismatch mixes two latent spaces; warned)."""
    import sys
    from pathlib import Path

    if "checkpoint" in index:  # warn on mismatch in EITHER direction,
        built_with = str(np.asarray(index["checkpoint"]).item() or "")
        if str(chk or "") != built_with:  # fresh-vs-trained included
            print(f"warning: index was built with checkpoint "
                  f"{built_with or 'fresh weights'!r} but the query uses "
                  f"{str(chk) if chk else 'fresh weights'!r} — distances "
                  "mix two latent spaces", file=sys.stderr)
    from dxvae_tpu.serving import knn_hits

    model = model if model is not None else _model_for(chk, seed)
    mu_q, _ = model.encode(query)
    hits = knn_hits(index["mu"], np.asarray(mu_q)[0], k=k, metric=metric)
    if printout:
        names, banks = index["names"], index["bank"]
        for rank, (i, dist) in enumerate(hits):
            print(f"#{rank} idx {i}\t{metric} {dist:.4f}\t'{names[i]}'\t"
                  f"alg {int(index['alg'][i])}\t"
                  f"{Path(str(banks[i])).name}[{int(index['voice'][i])}]")
    return hits


def search(ds, query: GraphBatch, k=5, chk=None, seed=0, metric="l2",
           printout=True):
    """Latent patch search (beyond-reference): encode the corpus and a query
    patch, return the k nearest corpus patches in posterior-mean space.
    Encoding is ~5.6x cheaper than generation (docs/PERF.md "Batch scaling"),
    so indexing a whole library is one cheap batched call.  Returns a list of
    (dataset index, distance) pairs, nearest first."""
    model = _model_for(chk, seed)  # ONE model: corpus and query encodes share it
    return search_index(build_search_index(ds, chk, seed, model=model), query,
                        k=k, chk=chk, seed=seed, metric=metric,
                        printout=printout, model=model)


def forward_test(G, chk=None):
    model = _model_for(chk)
    loss, lx0, lxi, le, kld = model.forward(G)
    print(
        f"loss: {float(loss):.4f}\tx0: {float(lx0):.4f}\txi: {float(lxi):.4f}"
        f"\te: {float(le):.4f}\tkld: {float(kld):.4f}"
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dxvae_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    # single source of knob defaults: the TrainConfig dataclass
    dflt = TrainConfig()

    def common(sp, train=False):
        # defaults of None so "flag given" is distinguishable from "use the
        # TrainConfig default" — a --config file must be able to set these
        sp.add_argument("--raw-dir", default=None,
                        help=f"(default: {dflt.raw_dir})")
        sp.add_argument("--synprez-only", action="store_true",
                        help="restrict to the 1024-patch baseline subset")
        sp.add_argument("--checkpoint", default=None,
                        help=f"(default: {dflt.checkpoint})")
        sp.add_argument("--seed", type=int, default=None,
                        help="PRNG seed (weight init / shuffle / sampling; "
                             f"default {dflt.seed} = reproducible output — "
                             "vary it for different prior samples)")
        if train:
            sp.add_argument("--config", default=None,
                            help="JSON TrainConfig file; flags given on the "
                                 "command line override it")
            sp.add_argument("--epochs", type=int, default=None)
            sp.add_argument("--size-batch", type=int, default=None)
            sp.add_argument("--lr", type=float, default=None)
            sp.add_argument("--w-env", type=float, default=None)
            sp.add_argument("--w-frq", type=float, default=None)
            sp.add_argument("--w-kld", type=float, default=None)
            sp.add_argument("--metrics-csv", default=None)
            sp.add_argument("--resume", default=None, metavar="CKPT",
                            help="full-state continuation: restore params + "
                                 "AdamW moments + step from a train() "
                                 "checkpoint and replay the remaining epochs "
                                 "bit-for-bit (beyond-reference; the default "
                                 "train-on is the reference's weights-only "
                                 "semantics — AdamW restarts)")
            sp.add_argument("--n-data", type=int, default=None,
                            help="data-parallel mesh size (default: auto)")
            sp.add_argument("--n-model", type=int, default=None,
                            help="tensor-parallel mesh size: shards the wide "
                                 "MLP heads over the 'model' axis (default: 1)")
            sp.add_argument("--no-extra-epoch", action="store_true",
                            help="drop the reference's range(epochs+1) off-by-one")
            sp.add_argument("--distributed", action="store_true",
                            help="multi-host: join the jax distributed "
                                 "runtime (auto-detected on TPU pods; one "
                                 "process per host, checkpoints/metrics "
                                 "written by rank 0 only)")
            sp.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                            help="off-pod coordinator address (implies "
                                 "--distributed; also pass --num-processes "
                                 "and --process-id)")
            sp.add_argument("--num-processes", type=int, default=None)
            sp.add_argument("--process-id", type=int, default=None)
            sp.add_argument("--augment-orbit", type=int, default=None,
                            nargs="?", const=-1, metavar="CAP",
                            help="expand the training set with operator-"
                                 "permuted copies along each patch's "
                                 "algorithm automorphisms (acoustically "
                                 "identical, different node order); CAP "
                                 "caps copies per patch, bare flag = full "
                                 "orbit (beyond-reference; CAP=2 measured "
                                 "best — docs/PERF.md orbit A/B)")
            sp.add_argument("--canonicalize-orbit", action="store_true",
                            help="collapse every patch to the canonical "
                                 "presentation of its automorphism orbit "
                                 "before training (one decoder target per "
                                 "latent; the augmentation's complement — "
                                 "mutually exclusive with --augment-orbit)")
            sp.add_argument("--val-banks", type=int, default=None,
                            metavar="K",
                            help="hold out K interleaved banks as a "
                                 "validation split (excluded before any "
                                 "orbit transform): val loss printed every "
                                 "--val-every epochs, best-val weights kept "
                                 "in <checkpoint>.best.npz (beyond-"
                                 "reference; K >= 2 — single-bank val is "
                                 "noise-dominated, docs/PERF.md)")
            sp.add_argument("--val-every", type=int, default=None,
                            dest="val_every_epochs", metavar="N",
                            help="epochs between val evaluations "
                                 "(default 1; with --val-banks)")

    common(sub.add_parser("train-new", help="train from scratch (main.py:12)"), train=True)
    common(sub.add_parser("train-on", help="resume from checkpoint (main.py:18)"), train=True)
    sp = sub.add_parser("decode-test", help="encode->decode round trip (main.py:24)")
    common(sp)
    sp.add_argument("--index", type=int, default=12)
    sp.add_argument("--stochastic", action="store_true")
    sp = sub.add_parser("generate", help="prior-sample patches (main.py:35)")
    common(sp)
    sp.add_argument("--n", type=int, default=1)
    sp.add_argument("--out", default=None, help="write a 32-voice .syx bank here")
    sp.add_argument("--computed-checksum", action="store_true")
    sp.add_argument("--project-topology", action="store_true",
                    help="snap each sampled adjacency to the nearest valid "
                         "DX7 algorithm (hardware-realizable banks)")
    sp.add_argument("--alg", type=int, default=None, metavar="0..31",
                    help="condition generation on a DX7 algorithm: the decode "
                         "teacher-forces that routing while sampling operators")
    sp.add_argument("--fitted-prior", nargs="?", const=32, type=int, default=None,
                    metavar="K",
                    help="sample z from a K-component GMM (default 32) fitted "
                         "to the dataset's aggregate posterior instead of "
                         "N(0,I) — measured ~4x valid-topology rate at zero "
                         "training cost (fits in seconds; needs --raw-dir data)")
    sp.add_argument("--prior", default=None, metavar="PATH",
                    help="load a saved fitted prior (.npz from --save-prior / "
                         "save_prior) instead of fitting — no dataset needed; "
                         "e.g. checkpoints/dx_h1024.prior.npz for the flagship")
    sp.add_argument("--save-prior", default=None, metavar="PATH",
                    help="persist the prior fitted via --fitted-prior for "
                         "later --prior runs")
    sp.add_argument("--temperature", type=float, default=1.0, metavar="T",
                    help="scale sampled z by T (fitted prior: scales the "
                         "offset from the component mean, keeping mixture "
                         "coverage); T<1 trades diversity for on-manifold "
                         "samples — measured tradeoff in docs/PERF.md")
    sp.add_argument("--valid-only", action="store_true",
                    help="rejection-sample until every patch's topology IS a "
                         "valid DX7 algorithm — nothing overwritten (vs "
                         "--project-topology, which snaps it); best combined "
                         "with --prior/--fitted-prior [--temperature 0.5]")
    sp.add_argument("--sampled-topology", action="store_true",
                    help="self-conditioned routing: sample each patch's "
                         "algorithm from the decoder's OWN head at its z, "
                         "then teacher-force that routing — valid topology "
                         "by construction, model-consistent (unlike --alg) "
                         "and diverse (unlike --project-topology)")
    sp.add_argument("--alg-temperature", type=float, default=1.0, metavar="T",
                    help="softmax temperature of the algorithm head for "
                         "--sampled-topology (T<1 sharpens toward the head's "
                         "argmax)")
    sp.add_argument("--quiet", action="store_true")
    sp = sub.add_parser("interpolate",
                        help="decode the latent segment between two dataset "
                             "patches in one batched call; optionally write "
                             "the sweep as .syx banks (beyond-reference)")
    common(sp)
    sp.add_argument("--a", type=int, default=0, help="start patch index")
    sp.add_argument("--b", type=int, default=1, help="end patch index")
    sp.add_argument("--steps", type=int, default=32)
    sp.add_argument("--out", default=None, help="write 32-voice .syx banks here")
    sp.add_argument("--computed-checksum", action="store_true")
    sp.add_argument("--project-topology", action="store_true",
                    help="snap every step to the nearest valid DX7 algorithm")
    sp = sub.add_parser("search",
                        help="latent patch search: k nearest corpus patches "
                             "to a query, in posterior-mean space "
                             "(beyond-reference)")
    common(sp)
    sp.add_argument("--index", type=int, default=0,
                    help="query = this dataset patch (default 0)")
    sp.add_argument("--query-bank", default=None, metavar="PATH",
                    help="query an external 32-voice .syx instead")
    sp.add_argument("--query-voice", type=int, default=0,
                    help="voice within --query-bank (default 0)")
    sp.add_argument("--k", type=int, default=5)
    sp.add_argument("--metric", default="l2", choices=["l2", "cosine"])
    sp.add_argument("--save-index", default=None, metavar="PATH",
                    help="persist the encoded corpus as a reusable latent "
                         "index (npz: posterior means + provenance)")
    sp.add_argument("--index-file", default=None, metavar="PATH",
                    help="search a saved index instead of re-encoding the "
                         "corpus; with --query-bank no dataset is needed")
    sp = sub.add_parser("forward-test", help="single-pass loss printout (main.py:44)")
    common(sp)
    sp.add_argument("--index", type=int, default=15)
    sp = sub.add_parser("print-data", help="dump params/edges (main.py:6)")
    common(sp)
    sp.add_argument("--index", type=int, default=0)
    sp.add_argument("--count", type=int, default=1)
    sp.add_argument("--bank", default=None, metavar="PATH",
                    help="inspect an external 32-voice .syx bank instead of "
                         "the dataset (no --raw-dir needed)")
    sp.add_argument("--verify-checksum", action="store_true",
                    help="with --bank: validate the stored DX7 checksum and "
                         "fail on corruption")
    sp = sub.add_parser(
        "export-serving",
        help="export an AOT serving bundle: StableHLO at fixed batch "
             "buckets, weights baked in — serving needs jax only, not this "
             "package or the checkpoint (dxvae_tpu.serving)")
    common(sp)
    sp.add_argument("--out", required=True, help="bundle path (.npz)")
    sp.add_argument("--batch-sizes", default="32,1024",
                    help="comma-separated buckets; requests pad up to the "
                         "smallest bucket that fits (default: 32,1024)")
    sp.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering targets (default: cpu,tpu)")
    sp.add_argument("--functions", default="encode,decode,roundtrip")
    sp.add_argument("--quantize-decode", default=None, choices=["int8"],
                    help="bake int8-quantized decode-side matmuls into the "
                         "artifact (per-channel weights, dynamic activation "
                         "scales; non-parity — measured fidelity/throughput "
                         "in docs/PERF.md 'int8 quantized decode')")
    sp = sub.add_parser(
        "serve",
        help="run inference against an exported bundle — no checkpoint and "
             "no model build, the artifact IS the model "
             "(dxvae_tpu.serving.ServedDXVAE)")
    sp.add_argument("--bundle", required=True,
                    help="bundle .npz written by export-serving")
    sp.add_argument("--op", default="generate",
                    choices=["generate", "roundtrip"],
                    help="generate = prior-sample patches; roundtrip = "
                         "encode->decode a dataset patch through the artifact")
    sp.add_argument("--n", type=int, default=1, help="patches to generate")
    sp.add_argument("--seed", type=int, default=None)
    sp.add_argument("--prior", default=None, choices=["fitted", "standard"],
                    help="z distribution (default: the bundled fitted prior "
                         "when the bundle has one, else standard N(0,I)) — "
                         "bundles carry their prior, so unlike 'generate' "
                         "this is a mode name, not a path")
    sp.add_argument("--temperature", type=float, default=1.0, metavar="T")
    sp.add_argument("--valid-only", action="store_true",
                    help="rejection-sample valid DX7 topologies (rounds run "
                         "at the bundle's largest decode bucket)")
    sp.add_argument("--out", default=None,
                    help="write a 32-voice .syx bank (padded by repeating "
                         "the last patch when --n < 32)")
    sp.add_argument("--computed-checksum", action="store_true")
    sp.add_argument("--quiet", action="store_true")
    sp.add_argument("--http", default=None, metavar="[HOST]:PORT",
                    help="serve the bundle over HTTP instead of a one-shot "
                         "op: JSON endpoints /healthz /v1/{generate,encode,"
                         "decode,roundtrip,search} (dxvae_tpu.serving_http; "
                         "host defaults to 127.0.0.1)")
    sp.add_argument("--search-index", default=None, metavar="PATH",
                    help="latent index npz (search --save-index) enabling "
                         "/v1/search; must be built with the bundle's "
                         "checkpoint")
    sp.add_argument("--batch-window-ms", type=float, default=None,
                    metavar="MS",
                    help="micro-batch the HTTP tensor endpoints: requests "
                         "arriving within MS of each other merge into one "
                         "artifact call (serving_http.MicroBatcher); a lone "
                         "request pays MS extra latency")
    sp.add_argument("--adaptive-window", action="store_true",
                    help="open the micro-batch window only while the "
                         "endpoint sees same-endpoint concurrency, so lone/"
                         "mixed traffic stops paying --batch-window-ms "
                         "(requires --batch-window-ms)")
    sp.add_argument("--call-timeout-s", type=float, default=None, metavar="S",
                    help="watchdog for HTTP-mode artifact calls: a device "
                         "call still running after S seconds 503s its "
                         "client and lands in the /healthz error ledger "
                         "(first call per function/bucket is allowed longer "
                         "— it compiles; see --warmup)")
    sp.add_argument("--warmup", action="store_true",
                    help="pre-compile every exported function/bucket before "
                         "accepting HTTP traffic (first calls otherwise "
                         "take minutes on cold caches)")
    sp.add_argument("--raw-dir", default=None,
                    help=f"dataset for --op roundtrip (default: {dflt.raw_dir})")
    sp.add_argument("--synprez-only", action="store_true")
    sp.add_argument("--index", type=int, default=12,
                    help="dataset patch for --op roundtrip")
    sp = sub.add_parser(
        "doctor",
        help="environment diagnosis: device reachability (probed in a child "
             "process, so a dead tunnel/driver cannot hang the check), "
             "compile cache, data, dataset-cache writability, native codec, "
             "checkpoints.  Exit 0 = healthy (beyond-reference)")
    sp.add_argument("--raw-dir", default=None)
    sp.add_argument("--probe-timeout", type=float, default=90.0, metavar="S",
                    help="seconds before the device probe is declared dead "
                         "(default 90; a healthy first call takes ~15s)")
    sp.add_argument("--cpu", action="store_true",
                    help="probe the CPU backend instead of the default device")
    sp.add_argument("--json", action="store_true",
                    help="machine-readable single-line report")
    sp = sub.add_parser(
        "convert-checkpoint",
        help="convert between our .npz and the reference's torch .chk "
             "state_dict (direction inferred from the source extension; "
             "model sizes inferred from tensor shapes)",
    )
    sp.add_argument("src")
    sp.add_argument("dst")
    return p


def main(argv=None) -> int:
    # parse BEFORE touching jax: --help / usage errors must work (and exit
    # fast) even when the TPU backend is unreachable
    args = build_parser().parse_args(argv)

    if args.cmd == "doctor":
        # dispatched before ANYTHING touches the jax backend: doctor must
        # report an unreachable device, not hang on it
        from dxvae_tpu.utils.doctor import main_doctor

        return main_doctor(args.raw_dir, args.probe_timeout, args.cpu, args.json)

    if getattr(args, "distributed", False) or getattr(args, "coordinator", None):
        # must happen before anything initializes the backend
        from dxvae_tpu.parallel.distributed import init_distributed

        init_distributed(args.coordinator, args.num_processes, args.process_id)

    from dxvae_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()

    # resolve knobs for EVERY field: CLI flag > --config file > TrainConfig
    # defaults (checkpoint/raw_dir/seed included — a --config file that sets
    # them must take effect, not be silently shadowed by argparse defaults)
    cfg = TrainConfig()
    if getattr(args, "config", None):
        with open(args.config) as f:
            cfg = TrainConfig.from_json(f.read())
    for flag in (
        "raw_dir", "checkpoint", "resume", "seed", "epochs", "size_batch",
        "lr", "w_env", "w_frq", "w_kld", "metrics_csv", "n_data", "n_model",
        "augment_orbit", "val_banks", "val_every_epochs",
    ):
        v = getattr(args, flag, None)
        if v is not None:
            setattr(cfg, flag, v)
    if getattr(args, "no_extra_epoch", False):
        cfg.extra_epoch = False
    if getattr(args, "canonicalize_orbit", False):
        cfg.canonicalize_orbit = True
    if cfg.canonicalize_orbit and cfg.augment_orbit is not None:
        # augmenting then canonicalizing collapses every copy back to one
        # identical row (pure duplicates); the options are complements
        raise SystemExit(
            "--canonicalize-orbit and --augment-orbit are mutually exclusive")
    args.raw_dir = cfg.raw_dir
    args.checkpoint = cfg.checkpoint

    if args.cmd in ("decode-test", "generate", "forward-test", "interpolate",
                    "export-serving", "search"):
        from pathlib import Path as _P

        if not _P(args.checkpoint).exists():
            import sys as _sys

            print(
                f"note: checkpoint {args.checkpoint!r} not found; using fresh weights",
                file=_sys.stderr,
            )
            args.checkpoint = None

    if args.cmd in ("train-new", "train-on"):
        G = _load_graphs(args)
        val = None
        if cfg.val_banks:
            # carve the val split BEFORE any orbit transform: val banks are
            # never augmented (same contract as scripts/train_best.py)
            if len(G) % 32:
                raise SystemExit(
                    f"--val-banks needs a bank-aligned corpus (32 voices "
                    f"per bank); got {len(G)} patches")
            n_banks = len(G) // 32
            if not 2 <= cfg.val_banks < n_banks:
                raise SystemExit(
                    f"--val-banks must be in [2, {n_banks}) — single-bank "
                    "val is noise-dominated (docs/PERF.md CV section)")
            stride = max(1, n_banks // cfg.val_banks)
            vb = list(range(0, n_banks, stride))[: cfg.val_banks]
            mask = np.isin(np.arange(len(G)) // 32, vb)
            val, G = G[mask], G[~mask]
            print(f"validation split: banks {vb} ({len(val)} patches "
                  "held out)")
        if cfg.augment_orbit is not None:
            from dxvae_tpu.data.algorithms import orbit_augment

            n0 = len(G)
            G = orbit_augment(
                G,
                max_per_patch=(None if cfg.augment_orbit < 0
                               else cfg.augment_orbit),
                seed=cfg.seed)
            print(f"orbit augmentation: {n0} -> {len(G)} patches")
        elif cfg.canonicalize_orbit:
            from dxvae_tpu.data.algorithms import canonicalize_orbit

            G = canonicalize_orbit(G)
            if val is not None:
                # objective consistency: the decoder trains on canonical
                # presentations only, so val must be canonical too
                val = canonicalize_orbit(val)
            print(f"orbit canonicalization: {len(G)} patches -> canonical "
                  "presentation")
        fn = train_new if args.cmd == "train-new" else train_on
        fn(
            G, args.checkpoint, cfg.epochs, cfg.size_batch, cfg.lr,
            cfg.w_env, cfg.w_frq, cfg.w_kld, seed=cfg.seed,
            resume=cfg.resume,
            metrics_csv=cfg.metrics_csv, extra_epoch=cfg.extra_epoch,
            # a resumed/continued run extends its CSV history; a fresh one
            # truncates
            metrics_append=(args.cmd == "train-on" or cfg.resume is not None),
            n_data=cfg.n_data, n_model=cfg.n_model, save_every=cfg.save_every_epochs,
            val_split=val, val_every=cfg.val_every_epochs,
        )
    elif args.cmd == "decode-test":
        G = _load_graphs(args)
        decode_test(G.slice(args.index, args.index + 1), args.checkpoint,
                    args.stochastic, seed=cfg.seed)
    elif args.cmd == "generate":
        fit_from = (_load_graphs(args)
                    if args.fitted_prior is not None and args.prior is None
                    else None)
        if args.save_prior is not None and fit_from is None:
            raise SystemExit("--save-prior needs --fitted-prior (a fresh fit); "
                             "--prior loads an already-saved one")
        G_gen = generate_test(args.n, args.checkpoint, printout=not args.quiet,
                              alg=args.alg,
                              seed=cfg.seed,
                              project_topology=args.project_topology,
                              fit_from=fit_from,
                              n_components=(args.fitted_prior
                                            if args.fitted_prior is not None
                                            else 32),
                              prior_path=args.prior,
                              save_prior_path=args.save_prior,
                              temperature=args.temperature,
                              valid_only=args.valid_only,
                              topology=("sampled" if args.sampled_topology
                                        else None),
                              alg_temperature=args.alg_temperature)
        if args.out:
            # bank_bytes pads --n < 32 by repeating the last patch (the same
            # convention as serve --out); at exactly 32 the bytes are
            # identical to graph_to_syx's parity output
            from pathlib import Path as _Path

            from dxvae_tpu.serving import bank_bytes

            _Path(args.out).write_bytes(bank_bytes(
                G_gen,
                checksum="computed" if args.computed_checksum else "parity"))
            print(f"wrote {args.out}")
    elif args.cmd == "interpolate":
        G = _load_graphs(args)
        interpolate(G, args.a, args.b, args.steps, args.checkpoint,
                    seed=cfg.seed, out=args.out,
                    project_topology=args.project_topology,
                    checksum="computed" if args.computed_checksum else "parity")
    elif args.cmd == "search":
        def _ds():
            return DXDataset(args.raw_dir,
                             include="synprez" if args.synprez_only else None)

        ds = model = None
        if args.index_file is not None:
            from dxvae_tpu.serving import load_search_index

            index = load_search_index(args.index_file)
        else:
            ds = _ds()
            model = _model_for(args.checkpoint, cfg.seed)  # shared with the
            index = build_search_index(ds, args.checkpoint, cfg.seed,  # query
                                       model=model)
        if args.save_index is not None:
            import os as _os

            # np.savez appends .npz when missing — normalize FIRST so the
            # printed path (and a later --index-file of it) names the real
            # file; tmp+replace so a crash cannot publish a torn index
            dst = (args.save_index if args.save_index.endswith(".npz")
                   else args.save_index + ".npz")
            tmp = f"{dst}.tmp.{_os.getpid()}.npz"
            np.savez(tmp, **index)
            _os.replace(tmp, dst)
            print(f"wrote index {dst} ({len(index['mu'])} patches)")
        if args.query_bank is not None:
            from dxvae_tpu.data.sysex import read_syx, unpack_voices

            P, X, adjq = unpack_voices(read_syx(args.query_bank))
            q = GraphBatch(X=X, params=P, adj=adjq)[args.query_voice]
        else:
            q = (ds if ds is not None else _ds())[args.index]
        search_index(index, q, k=args.k, chk=args.checkpoint, seed=cfg.seed,
                     metric=args.metric, model=model)
    elif args.cmd == "export-serving":
        from dxvae_tpu.serving import export_bundle

        model = _model_for(args.checkpoint, cfg.seed)
        if args.quantize_decode:
            model.cfg = model.cfg._replace(quantize_decode=args.quantize_decode)
        man = export_bundle(
            model, args.out,
            batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
            functions=tuple(args.functions.split(",")),
            platforms=tuple(args.platforms.split(",")))
        print(f"wrote {args.out}: functions {sorted(man['functions'])} at "
              f"buckets {args.batch_sizes} for {man['platforms']}")
    elif args.cmd == "serve":
        http_only = {"--batch-window-ms": args.batch_window_ms is not None,
                     "--adaptive-window": args.adaptive_window,
                     "--call-timeout-s": args.call_timeout_s is not None,
                     "--warmup": args.warmup}
        bad = [f for f, on in http_only.items() if on]
        if bad and args.http is None:
            raise SystemExit(f"{', '.join(bad)} only appl"
                             f"{'y' if len(bad) > 1 else 'ies'} to --http "
                             "mode (one-shot ops have no server to tune)")
        if args.adaptive_window and args.batch_window_ms is None:
            raise SystemExit("--adaptive-window needs --batch-window-ms "
                             "(there is no window to adapt)")
        if args.http is not None:
            from dxvae_tpu.serving_http import serve_forever

            host, sep, port = args.http.rpartition(":")
            if not sep or not port.isdigit() or int(port) > 65535:
                raise SystemExit(
                    f"--http expects [HOST]:PORT with PORT 0-65535 (e.g. "
                    f"':8000' or '0.0.0.0:8000'), got {args.http!r}")
            serve_forever(args.bundle, host or "127.0.0.1", int(port),
                          index_path=args.search_index,
                          batch_window_ms=args.batch_window_ms,
                          adaptive_window=args.adaptive_window,
                          call_timeout_s=args.call_timeout_s,
                          warmup=args.warmup)
            return 0
        from dxvae_tpu.serving import ServedDXVAE, bank_bytes

        srv = ServedDXVAE.load(args.bundle)
        if args.op == "generate":
            G_gen = srv.generate(args.n, seed=cfg.seed, prior=args.prior,
                                 temperature=args.temperature,
                                 valid_only=args.valid_only)
            if not args.quiet:
                print("[ Generate (served) ]")
                print_data(G_gen)
            if args.out:
                # bundles cap n at their decode buckets, so bank_bytes pads
                # short runs to the 32-voice bank by repeating the last patch
                from pathlib import Path as _Path

                _Path(args.out).write_bytes(bank_bytes(
                    G_gen,
                    checksum="computed" if args.computed_checksum else "parity",
                ))
                print(f"wrote {args.out}")
        else:
            G_en = _load_graphs(args).slice(args.index, args.index + 1)
            G_de = srv.encode_decode(G_en)
            if not args.quiet:
                print("[ Encode ]")
                print_data(G_en)
                print("[ Decode (served) ]")
                print_data(G_de)
            if args.out:  # same padded-bank convention as --op generate
                from pathlib import Path as _Path

                _Path(args.out).write_bytes(bank_bytes(
                    G_de,
                    checksum="computed" if args.computed_checksum else "parity",
                ))
                print(f"wrote {args.out}")
    elif args.cmd == "forward-test":
        G = _load_graphs(args)
        forward_test(G.slice(args.index, args.index + 1), args.checkpoint)
    elif args.cmd == "print-data":
        if args.bank is not None:
            from dxvae_tpu.data.sysex import read_syx, unpack_voices

            P, X, adjb = unpack_voices(
                read_syx(args.bank, verify_checksum=args.verify_checksum))
            G = GraphBatch(X=X, params=P, adj=adjb)
        else:
            G = _load_graphs(args)
        print_data(G.slice(args.index, args.index + args.count))
    elif args.cmd == "convert-checkpoint":
        from dxvae_tpu.utils.checkpoint import convert_checkpoint

        convert_checkpoint(args.src, args.dst)
        print(f"converted {args.src} -> {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
