"""Training callbacks (reference custom_callbacks.py:5-15 equivalent).

The reference's CosineAnnealingScheduler is a keras callback that mutates the
optimizer's python-float LR each epoch.  Here LR schedules are pure functions
fed to optax (see train.cosine_annealing_schedule); this module provides the
callback-style interface for Trainer.fit plus a checkpoint callback.
"""

from __future__ import annotations

import math


class CosineAnnealingScheduler:
    """Epoch-wise cosine annealing with restarts, as a Trainer callback.

    lr = lr_min + (lr_max - lr_min) * (1 + cos(pi * (epoch % T) / T)) / 2
    (reference custom_callbacks.py:13-15).

    Note: with optax the preferred route is passing
    ``train.cosine_annealing_schedule`` at Trainer construction; this callback
    exists for API familiarity and records the LR it would apply.
    """

    def __init__(self, lr_max: float, lr_min: float, cycle_epochs: int,
                 verbose: int = 0):
        self.lr_max = lr_max
        self.lr_min = lr_min
        self.cycle_epochs = cycle_epochs
        self.verbose = verbose
        self.history = []

    def lr(self, epoch: int) -> float:
        t = (epoch % self.cycle_epochs) / self.cycle_epochs
        return self.lr_min + (self.lr_max - self.lr_min) * (
            1 + math.cos(math.pi * t)) / 2

    def __call__(self, trainer, entry: dict):
        lr = self.lr(entry["epoch"] + 1)
        self.history.append(lr)
        if self.verbose:
            print(f"CosineAnnealingScheduler: epoch {entry['epoch'] + 1} "
                  f"lr {lr:.6g}")


class CheckpointCallback:
    """Save an .npz checkpoint every N epochs."""

    def __init__(self, path_fmt: str, every: int = 1):
        self.path_fmt = path_fmt
        self.every = every

    def __call__(self, trainer, entry: dict):
        epoch = entry["epoch"]
        if (epoch + 1) % self.every == 0:
            from . import checkpoint as ckpt
            import jax
            import numpy as np
            ckpt.save_npz(self.path_fmt.format(epoch=epoch),
                          jax.tree.map(np.asarray, trainer.params),
                          jax.tree.map(np.asarray, trainer.state),
                          step=trainer.global_step,
                          extra={"epoch": epoch})
