"""Metrics logging.

Keeps the reference's stdout contract for parity — per-batch loss components
(model.py:387), epoch headers (model.py:379), checkpoint notices
(model.py:389) — and adds structured per-step CSV metrics (loss components,
grad-norm, throughput) the reference lacks (SURVEY.md §5)."""

from __future__ import annotations

import csv
import time
from pathlib import Path


class MetricsLogger:
    def __init__(self, csv_path: str | None = None, stdout: bool = True,
                 append: bool = False):
        """``append=True`` extends an existing CSV (resumed training run);
        the default truncates, so a fresh run pointed at an old metrics file
        does not silently concatenate unrelated run histories."""
        self.stdout = stdout
        self._csv_path = Path(csv_path) if csv_path else None
        self._append = append
        self._writer = None
        self._file = None
        self._t0 = time.perf_counter()

    def epoch(self, epoch: int) -> None:
        if self.stdout:
            print(f"Epoch: {epoch}")

    def batch(self, i: int, metrics: dict, step: int | None = None, patches_per_sec=None) -> None:
        m = {k: float(v) for k, v in metrics.items()}
        if self.stdout:
            # reference per-batch line format (model.py:387)
            print(
                f"batch: {i}\tloss: {m['loss']:.4f}\tx0: {m['x0']:.4f}"
                f"\txi: {m['xi']:.4f}\te: {m['e']:.4f}\tkld: {m['kld']:.4f}"
            )
        if self._csv_path:
            row = {
                "step": step,
                "batch": i,
                "wall_s": time.perf_counter() - self._t0,
                **m,
                "patches_per_sec": patches_per_sec if patches_per_sec is not None else "",
            }
            if self._writer is None:
                self._csv_path.parent.mkdir(parents=True, exist_ok=True)
                # append only when the caller says this is a resume (train-on
                # with the same CSV path); the header is written only when the
                # file starts empty
                fresh = (not self._append or not self._csv_path.exists()
                         or self._csv_path.stat().st_size == 0)
                self._file = open(self._csv_path, "a" if self._append else "w",
                                  newline="")
                self._writer = csv.DictWriter(self._file, fieldnames=list(row))
                if fresh:
                    self._writer.writeheader()
            self._writer.writerow(row)
            self._file.flush()

    def checkpoint_saved(self, path) -> None:
        if self.stdout:
            print(f"\nCheckpoint [{path}] saved\n")

    def finished(self) -> None:
        if self.stdout:
            print("Finished Training")
        if self._file:
            self._file.close()
            self._file = None
            self._writer = None
