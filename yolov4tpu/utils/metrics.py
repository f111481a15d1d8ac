"""Structured training metrics: CSV always, TensorBoard when available.

The reference had no metrics observability beyond keras fit's stdout
(SURVEY §5).  ``MetricsLogger`` is a Trainer callback recording per-epoch
metrics (and optionally per-step via ``log_step``) to a CSV file and, if the
torch TensorBoard writer is importable, to TensorBoard event files too.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Optional


class MetricsLogger:
    """Callback: ``MetricsLogger(dir)`` -> pass in Trainer.fit(callbacks=[...]).

    Writes ``dir/metrics.csv`` with one row per epoch (epoch, loss,
    val_loss, time, wall) and mirrors scalars to TensorBoard if available.
    """

    def __init__(self, log_dir: str, tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.csv_path = os.path.join(log_dir, "metrics.csv")
        self._csv_fields: Optional[list] = None
        self._t0 = time.time()
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def _write_csv(self, row: dict):
        fields = sorted(row.keys())
        new_file = (self._csv_fields is None
                    and not os.path.exists(self.csv_path))
        if self._csv_fields is None:
            self._csv_fields = fields
        with open(self.csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._csv_fields,
                               extrasaction="ignore")
            if new_file:
                w.writeheader()
            w.writerow(row)

    def log_step(self, step: int, metrics: dict):
        """Optional fine-grained per-step scalars (TensorBoard only)."""
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(f"step/{k}", float(v), step)
                except (TypeError, ValueError):
                    pass

    def __call__(self, trainer, entry: dict):
        row = {k: (float(v) if isinstance(v, (int, float)) else v)
               for k, v in entry.items()}
        row["wall"] = round(time.time() - self._t0, 3)
        self._write_csv(row)
        if self._tb is not None:
            epoch = int(entry.get("epoch", 0))
            for k, v in entry.items():
                if isinstance(v, (int, float)) and k != "epoch":
                    self._tb.add_scalar(f"epoch/{k}", float(v), epoch)
            self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
