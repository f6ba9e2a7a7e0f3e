"""DX7 patch dataset with an npz disk cache.

Replaces the reference's ``DXDataset(dgl.data.DGLDataset)`` (dxdata.py:77-338)
with a plain-array dataset:

* ``process`` recursively globs ``raw_dir/**/*.syx`` (sorted for determinism;
  the reference relies on filesystem order, dxdata.py:321), concatenates all
  banks and decodes them in one vectorized pass;
* the cache is a single ``.npz`` of the three dense tensors, keyed on the file
  list + sizes + codec version, stored as ``DXDataset.npz`` in ``save_dir``
  (the reference's ``DXDataset.bin`` DGL cache never invalidates and has an
  inconsistent ``dataset[0]`` shape between the cache and fresh paths,
  dxdata.py:325-338 — both fixed here: ``dataset[idx]`` is always a length-1
  :class:`GraphBatch` and ``dataset.batch`` is always the full batch);
* the shipped reference cache holds the 32 SynprezFM banks only (1024
  patches); a fresh build over the full ``DX_data`` tree yields 1056.  Pass
  ``include='synprez'`` to reproduce the 1024-patch baseline set.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Sequence

import numpy as np

from dxvae_tpu.data.sysex import read_syx, unpack_voices
from dxvae_tpu.graph import GraphBatch

_CODEC_VERSION = 1


def default_raw_dir() -> str:
    """Default bank directory for scripts/benchmarks: ``$DXVAE_RAW_DIR`` when
    set, else the reference mount on this image.  Every script takes
    ``--raw-dir`` on top of this, so the framework is not image-pinned."""
    return os.environ.get("DXVAE_RAW_DIR", "/root/reference/DX_data")


_NO_CACHE_ROOT = Path("/root/reference")  # upstream mount: treat as read-only


def _default_save_dir(raw_dir: Path) -> Path:
    """Default cache location for ``save_dir=None``: ``$DXVAE_CACHE_DIR`` when
    set, else ``raw_dir`` itself (the reference's convention, dxdata.py:139) —
    EXCEPT when ``raw_dir`` lives under the upstream reference mount, which
    must stay byte-identical to upstream: those caches go to
    ``~/.cache/dxvae_tpu`` instead (the cache key hashes the absolute file
    paths, so banks from different raw dirs never collide there)."""
    env = os.environ.get("DXVAE_CACHE_DIR")
    if env:
        return Path(env)
    fallback = Path.home() / ".cache" / "dxvae_tpu"
    try:
        if raw_dir.resolve().is_relative_to(_NO_CACHE_ROOT):
            return fallback
    except (OSError, ValueError):
        pass
    # any other read-only bank directory (shared mounts etc.): same fallback
    # rather than crashing in _save (note: as root os.access is permissive,
    # so truly read-only filesystems may still surface in _save — see there)
    if not os.access(raw_dir, os.W_OK):
        return fallback
    return raw_dir


def _cache_key(files: Sequence[Path]) -> str:
    h = hashlib.sha256()
    h.update(f"v{_CODEC_VERSION}".encode())
    for f in files:
        st = f.stat()
        # mtime matters: every valid bank is exactly 4104 bytes, so size alone
        # could never invalidate the cache after an in-place edit
        h.update(str(f.resolve()).encode())  # absolute: the shared
        # ~/.cache fallback must not collide across identical relative names
        h.update(str(st.st_size).encode())
        h.update(str(st.st_mtime_ns).encode())
    return h.hexdigest()[:16]


class DXDataset:
    """Decode every ``.syx`` bank under ``raw_dir`` into dense graph tensors.

    Parameters mirror the reference ctor (dxdata.py:139): ``raw_dir`` holds
    the banks, ``save_dir`` holds the cache (default: ``raw_dir``, except
    never inside the read-only reference mount — see ``_default_save_dir``).
    """

    def __init__(
        self,
        raw_dir: str | os.PathLike,
        save_dir: str | os.PathLike | None = None,
        force_reload: bool = False,
        include: str | None = None,
    ):
        self.raw_dir = Path(raw_dir)
        self._save_dir_defaulted = save_dir is None
        self.save_dir = (Path(save_dir) if save_dir is not None
                         else _default_save_dir(self.raw_dir))
        files = sorted(self.raw_dir.rglob("*.syx"))
        if include == "synprez":
            files = [f for f in files if "SynprezFM" in f.name]
        elif include is not None:
            raise ValueError(
                f"unknown include={include!r} (valid: 'synprez' or None) — "
                "a typo here would silently change the training corpus")
        if not files:
            raise FileNotFoundError(f"no .syx banks under {self.raw_dir}")
        self.files = files
        self._cache_path = self.save_dir / f"DXDataset_{_cache_key(files)}.npz"

        if self._cache_path.exists() and not force_reload:
            self.batch = self._load()
        else:
            self.batch = self._process()
            self._save()

    # -- lifecycle ---------------------------------------------------------
    def _process(self) -> GraphBatch:
        raw = np.concatenate([read_syx(f) for f in self.files])  # (n_files*32, 128)
        # native (C++) codec when available, NumPy fallback otherwise — the
        # two are verified bit-exact against each other (tests/test_native.py)
        from dxvae_tpu.data import native

        unpack = native.unpack_voices if native.available() else unpack_voices
        params, X, adj = unpack(raw)
        return GraphBatch(X=X, params=params, adj=adj)

    def _save(self) -> None:
        try:
            self._write_cache()
        except OSError:
            # a defaulted save_dir that turns out read-only (os.access is
            # permissive for root) falls back instead of failing the build;
            # an explicit save_dir is the caller's contract — re-raise
            if not self._save_dir_defaulted:
                raise
            self.save_dir = Path.home() / ".cache" / "dxvae_tpu"
            self._cache_path = self.save_dir / self._cache_path.name
            self._write_cache()

    def _write_cache(self) -> None:
        self.save_dir.mkdir(parents=True, exist_ok=True)
        # pid-unique tmp name: two processes cold-building the same cache
        # must not interleave writes into one tmp file (os.replace keeps the
        # publish itself atomic; last writer wins with identical content)
        tmp = self._cache_path.with_suffix(f".tmp.{os.getpid()}.npz")
        np.savez_compressed(tmp, X=self.batch.X, params=self.batch.params, adj=self.batch.adj)
        os.replace(tmp, self._cache_path)  # atomic publish

    def _load(self) -> GraphBatch:
        with np.load(self._cache_path) as z:
            return GraphBatch(X=z["X"], params=z["params"], adj=z["adj"])

    # -- provenance ------------------------------------------------------------
    def provenance(self, i: int) -> tuple[Path, int]:
        """(bank file, voice index within the bank) for dataset patch ``i`` —
        every bank contributes exactly 32 voices in file-sorted order."""
        i = range(len(self))[i]  # normalize negatives, bounds-check
        return self.files[i // 32], i % 32

    @property
    def names(self) -> np.ndarray:
        """(N,) array of the 10-char voice names (bytes 118-127 of each
        packed voice; the model itself never sees them — the reference
        discards names too, dxdata.py:175-244).  Read lazily from the raw
        banks and cached."""
        if not hasattr(self, "_names"):
            raw = np.concatenate([read_syx(f) for f in self.files])
            chars = np.where((raw[:, 118:128] < 32) | (raw[:, 118:128] > 126),
                             np.uint8(32), raw[:, 118:128].astype(np.uint8))
            self._names = chars.view(f"S10").ravel().astype("U10")
        return self._names

    # -- container protocol --------------------------------------------------
    def __len__(self) -> int:
        return len(self.batch)

    def __getitem__(self, idx) -> GraphBatch:
        # GraphBatch owns the indexing contract (int incl. np.integer ->
        # length-1 batch with bounds check, slice/array -> sub-batch)
        return self.batch[idx]
