"""Training/run configuration.

The reference has no config system — knobs are kwargs with defaults
(model.py:11,374; main.py:12-21) and workflows are chosen by editing commented
lines in ``__main__`` (main.py:50-76).  Here the same knob set is a dataclass,
exposed 1:1 by the CLI (dxvae_tpu.cli) while the Python API keeps
kwargs-level parity.
"""

from __future__ import annotations

import dataclasses
import json


@dataclasses.dataclass
class TrainConfig:
    # reference training defaults (model.py:374, main.py:12)
    epochs: int = 500
    size_batch: int = 32
    lr: float = 1e-3
    w_env: float = 2.0
    w_frq: float = 5.0
    w_kld: float = 0.01
    checkpoint: str = "auto.chk.npz"
    # full-state continuation (beyond-reference): restore params + AdamW
    # moments + step from an atomic train() checkpoint and replay the
    # remaining epochs bit-for-bit (api.DXVAE.train(resume=)).  None keeps
    # the reference's weights-only semantics (train-on loads weights, AdamW
    # restarts — model.py:388)
    resume: str | None = None
    raw_dir: str = "DX_data"
    seed: int = 0
    # reference quirk (model.py:378): `range(epochs + 1)` runs one extra epoch;
    # kept by default for loss-curve parity, disable with extra_epoch=False
    extra_epoch: bool = True
    # checkpoint cadence: reference saves every epoch (model.py:388)
    save_every_epochs: int = 1
    # data-parallel mesh size (None = all local devices / n_model)
    n_data: int | None = None
    # tensor-parallel mesh size: >1 shards the wide MLP heads Megatron-style
    # over the 'model' axis (parallel/mesh.py)
    n_model: int = 1
    metrics_csv: str | None = None
    # operator-permutation data augmentation (data/algorithms.orbit_augment):
    # None = off, -1 = full automorphism orbit, N >= 0 = at most N permuted
    # copies per patch
    augment_orbit: int | None = None
    # collapse every patch to the canonical presentation of its automorphism
    # orbit before training (data/algorithms.canonicalize_orbit) — the
    # augmentation's complement (one decoder target per latent); mutually
    # exclusive with augment_orbit
    canonicalize_orbit: bool = False
    # hold out this many interleaved banks as a validation split: val ELBO
    # scored every val_every_epochs, best-val weights kept alongside the
    # final checkpoint (<checkpoint>.best.npz).  None/0 = off.  Minimum 2 —
    # single-bank val is noise-dominated (docs/PERF.md CV section)
    val_banks: int | None = None
    val_every_epochs: int = 1

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "TrainConfig":
        return TrainConfig(**json.loads(s))
