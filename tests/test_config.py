"""TrainConfig: the single source of training-knob defaults (SURVEY.md §5
config system) — JSON round-trip and CLI wiring."""

import json

from dxvae_tpu.utils.config import TrainConfig


def test_json_roundtrip():
    cfg = TrainConfig(epochs=7, lr=3e-4, w_kld=0.002, n_data=2, metrics_csv="m.csv")
    cfg2 = TrainConfig.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_defaults_match_reference_recipe():
    """Defaults mirror the reference kwargs (model.py:374, main.py:12-21)."""
    cfg = TrainConfig()
    assert (cfg.epochs, cfg.size_batch, cfg.lr) == (500, 32, 1e-3)
    assert (cfg.w_env, cfg.w_frq, cfg.w_kld) == (2.0, 5.0, 0.01)
    assert cfg.extra_epoch  # range(epochs + 1) quirk kept by default


def test_cli_defaults_come_from_dataclass(tmp_path, monkeypatch):
    """The CLI resolves knobs as flag > --config file > dataclass defaults."""
    import dxvae_tpu.cli as cli

    captured = {}

    def fake_train_new(G, chk, epochs, size_batch, lr, w_env, w_frq, w_kld, **kw):
        captured.update(epochs=epochs, size_batch=size_batch, lr=lr,
                        w_env=w_env, w_frq=w_frq, w_kld=w_kld, **kw)

    monkeypatch.setattr(cli, "train_new", fake_train_new)
    monkeypatch.setattr(cli, "_load_graphs", lambda args: None)

    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text(TrainConfig(epochs=9, lr=5e-4).to_json())
    cli.main([
        "train-new", "--config", str(cfg_file), "--lr", "2e-4",
        "--checkpoint", str(tmp_path / "c.npz"),
    ])
    assert captured["epochs"] == 9          # from config file
    assert captured["lr"] == 2e-4           # flag overrides file
    assert captured["size_batch"] == 32     # dataclass default
    assert captured["w_kld"] == 0.01


def test_cli_config_file_sets_checkpoint_rawdir_seed(tmp_path, monkeypatch):
    """checkpoint / raw_dir / seed in a --config file must take effect (they
    were previously shadowed by argparse defaults), and flags still win."""
    import dxvae_tpu.cli as cli

    captured = {}

    def fake_train_new(G, chk, epochs, size_batch, lr, w_env, w_frq, w_kld, **kw):
        captured.update(chk=chk, **kw)

    seen_args = {}
    monkeypatch.setattr(cli, "train_new", fake_train_new)
    monkeypatch.setattr(
        cli, "_load_graphs", lambda args: seen_args.update(raw_dir=args.raw_dir)
    )

    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text(TrainConfig(
        epochs=1, checkpoint="from_config.npz", raw_dir="/cfg/raw", seed=7
    ).to_json())

    cli.main(["train-new", "--config", str(cfg_file)])
    assert captured["chk"] == "from_config.npz"
    assert captured["seed"] == 7
    assert seen_args["raw_dir"] == "/cfg/raw"

    cli.main(["train-new", "--config", str(cfg_file),
              "--checkpoint", "flag.npz", "--seed", "3", "--raw-dir", "/flag/raw"])
    assert captured["chk"] == "flag.npz"     # flag overrides file
    assert captured["seed"] == 3
    assert seen_args["raw_dir"] == "/flag/raw"


def test_package_version_matches_pyproject():
    """__version__ is the package's own metadata — keep it pinned to
    pyproject.toml so the two cannot drift again (VERDICT r2 weak #5)."""
    import tomllib
    from pathlib import Path

    import dxvae_tpu

    pyproject = Path(dxvae_tpu.__file__).resolve().parents[1] / "pyproject.toml"
    with open(pyproject, "rb") as f:
        meta = tomllib.load(f)
    assert dxvae_tpu.__version__ == meta["project"]["version"]


def test_metrics_csv_truncate_vs_append(tmp_path):
    """A fresh run truncates an existing metrics CSV; append=True (train-on
    resume) extends it without re-writing the header (ADVICE r2)."""
    import csv

    from dxvae_tpu.utils.metrics import MetricsLogger

    path = tmp_path / "m.csv"
    m = {"loss": 1.0, "x0": 0.0, "xi": 0.0, "e": 0.0, "kld": 0.0}

    log = MetricsLogger(str(path), stdout=False)
    log.batch(0, m, step=1)
    log.finished()
    log = MetricsLogger(str(path), stdout=False)  # fresh run, same path
    log.batch(0, m, step=1)
    log.batch(1, m, step=2)
    log.finished()
    rows = list(csv.DictReader(open(path)))
    assert len(rows) == 2 and rows[0]["step"] == "1"  # truncated, not concatenated

    log = MetricsLogger(str(path), stdout=False, append=True)  # resume
    log.batch(0, m, step=3)
    log.finished()
    rows = list(csv.DictReader(open(path)))
    assert [r["step"] for r in rows] == ["1", "2", "3"]  # extended, one header


def test_cli_val_banks_carves_split(dataset, tmp_path, monkeypatch):
    """--val-banks K: interleaved banks carved out BEFORE training and
    passed as val_split; K<2 and non-bank-aligned corpora are rejected."""
    import numpy as np
    import pytest

    import dxvae_tpu.cli as cli

    captured = {}

    def fake_train_new(G, chk, *a, **kw):
        captured.update(G=G, **kw)

    monkeypatch.setattr(cli, "train_new", fake_train_new)
    G128 = dataset[:128]  # 4 banks
    monkeypatch.setattr(cli, "_load_graphs", lambda args: G128)

    cli.main(["train-new", "--val-banks", "2",
              "--checkpoint", str(tmp_path / "c.npz")])
    assert len(captured["val_split"]) == 64 and len(captured["G"]) == 64
    assert captured["val_every"] == 1
    # interleaved pick: banks 0 and 2 (stride 4//2) -> patches 0..31, 64..95
    np.testing.assert_array_equal(
        np.asarray(captured["val_split"].params),
        np.asarray(G128.params[np.r_[0:32, 64:96]]))

    with pytest.raises(SystemExit, match="val-banks must be in"):
        cli.main(["train-new", "--val-banks", "1",
                  "--checkpoint", str(tmp_path / "c.npz")])
    monkeypatch.setattr(cli, "_load_graphs", lambda args: G128[:100])
    with pytest.raises(SystemExit, match="bank-aligned"):
        cli.main(["train-new", "--val-banks", "2",
                  "--checkpoint", str(tmp_path / "c.npz")])
