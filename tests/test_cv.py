"""scripts/cv_generalization.py: leave-banks-out cross-validation harness."""
import json
import pathlib

import numpy as np

from scripts._lib import load_sibling as _load


def test_fold_banks_partition():
    """Every bank held out exactly once; interleaved assignment."""
    cv = _load("cv_generalization")
    folds = cv.fold_banks(32, 8)
    assert len(folds) == 8
    flat = sorted(b for f in folds for b in f)
    assert flat == list(range(32))
    assert folds[0] == [0, 8, 16, 24]


def test_cv_script_micro_run(tmp_path):
    """End to end at micro scale: every fold trains on the complement of its
    held-out banks, each fold appends a JSON line, and the pooled record
    scores every corpus patch exactly once."""
    cv = _load("cv_generalization")
    out = tmp_path / "cv.jsonl"
    # 2 epochs: optax's warmup_cosine needs >=1 post-warmup step
    pooled = cv.main(["--size-h", "32", "--size-z", "8", "--no-unroll",
                      "--epochs", "2", "--batch", "512", "--folds", "2",
                      "--out", str(out)])
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert [r["fold"] for r in rows] == [0, 1, "pooled"]
    for r in rows[:2]:
        assert r["n_train"] == 512 and r["n_held"] == 512
        # disjoint bank split
        for col in ("final_loss", "held_elbo", "held.param_acc",
                    "held.topology_exact", "dexed.param_acc"):
            assert np.isfinite(r[col]), col
    assert set(rows[0]["held_banks"]).isdisjoint(rows[1]["held_banks"])
    assert pooled["complete"] is True and pooled["n_held"] == 1024
    assert np.isfinite(pooled["held.param_acc"])
    assert rows[2]["held.param_acc"] == pooled["held.param_acc"]


def test_train_best_val_banks_micro_run(tmp_path):
    """train_best --val-banks: interleaved bank split excluded from training,
    val ELBO scored on the cadence, best-val checkpoint kept alongside the
    final one (and loadable at the right sizes)."""
    import runpy
    import sys

    ck = tmp_path / "tb.npz"
    argv = ["train_best.py", "--size-h", "32", "--size-z", "8", "--epochs",
            "2", "--batch", "512", "--val-banks", "4", "--val-every", "1",
            "--no-unroll", "--checkpoint", str(ck)]
    old = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(str(pathlib.Path(__file__).resolve().parents[1]
                           / "scripts" / "train_best.py"),
                       run_name="__main__")
    finally:
        sys.argv = old
    best = tmp_path / "tb.best.npz"
    assert ck.exists() and best.exists()
    from dxvae_tpu.utils.checkpoint import infer_sizes

    assert infer_sizes(str(best)) == (32, 8)
