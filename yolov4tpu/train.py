"""Training loop: optax Adam + jitted, mesh-sharded train step.

Replaces the reference's keras ``training_model.fit`` with an identity loss
trick (reference models.py:55-65, 83-84, 100-107) with a functional
``train_step``: pure (params, state, opt_state, batch) -> updated triple +
metrics, compiled once, batch sharded over the mesh ``data`` axis with
parameters replicated — XLA inserts the gradient all-reduce.

Also provides the cosine-annealing LR schedule matching the reference's
CosineAnnealingScheduler (reference custom_callbacks.py:5-15).
"""

from __future__ import annotations

import math
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import optax

from .config import YoloConfig
from .losses import yolo_loss
from .models import network
from .parallel.mesh import batch_sharding, make_mesh, replicate, replicated


def cosine_annealing_schedule(lr_max: float, lr_min: float, cycle_epochs: int,
                              steps_per_epoch: int) -> Callable[[int], float]:
    """Per-epoch cosine annealing with restarts (reference custom_callbacks.py:13-15):
    lr = lr_min + (lr_max - lr_min) * (1 + cos(pi * (epoch % cycle) / cycle)) / 2
    """

    def schedule(step):
        epoch = step // steps_per_epoch
        t = (epoch % cycle_epochs) / cycle_epochs
        return lr_min + (lr_max - lr_min) * (1 + jnp.cos(math.pi * t)) / 2

    return schedule


def make_optimizer(config: YoloConfig, schedule=None) -> optax.GradientTransformation:
    """Adam at the reference's lr (models.py:83), optionally scheduled."""
    return optax.adam(schedule if schedule is not None else config.learning_rate)


def make_train_step(num_classes: int, config: YoloConfig,
                    optimizer: optax.GradientTransformation,
                    mesh=None, donate: bool = True):
    """Build the jitted train step.

    Returned step: (params, state, opt_state, batch) ->
    (params, state, opt_state, metrics) where batch is
    {'image': (B,H,W,3), 'labels': [3 grids], 'boxes': (B,M,4)}.
    """
    anchors = config.anchors_grouped
    compute_dtype = (jnp.bfloat16 if config.compute_dtype == "bfloat16"
                     else jnp.float32)

    def step(params, state, opt_state, batch):
        def loss_fn(p):
            outs, new_state = network.apply(
                p, state, batch["image"], num_classes, train=True,
                compute_dtype=compute_dtype)
            total, comps = yolo_loss(
                outs, batch["labels"], batch["boxes"], anchors,
                config.strides, num_classes, config.iou_loss_thresh,
                weights=(config.loss_box_weight, config.loss_conf_weight,
                         config.loss_prob_weight),
                label_smoothing=config.label_smoothing,
                return_components=True)
            return total, (new_state, comps)

        (loss, (new_state, comps)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, **comps}
        return new_params, new_state, new_opt_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1, 2) if donate else ())

    repl = replicated(mesh)
    data = batch_sharding(mesh)
    batch_shardings = {"image": data, "labels": [data] * 3, "boxes": data}
    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, batch_shardings),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1, 2) if donate else (),
    )


def make_eval_step(num_classes: int, config: YoloConfig, mesh=None):
    """Jitted validation loss (BN in inference mode)."""
    anchors = config.anchors_grouped

    def step(params, state, batch):
        outs, _ = network.apply(params, state, batch["image"], num_classes,
                                train=False)
        return yolo_loss(outs, batch["labels"], batch["boxes"], anchors,
                         config.strides, num_classes, config.iou_loss_thresh,
                         weights=(config.loss_box_weight,
                                  config.loss_conf_weight,
                                  config.loss_prob_weight))

    if mesh is None:
        return jax.jit(step)
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(
        repl, repl, {"image": data, "labels": [data] * 3, "boxes": data}))


class Trainer:
    """Owns (params, state, opt_state) and runs epochs over a DataGenerator."""

    def __init__(self, config: YoloConfig, num_classes: int, params, state,
                 mesh=None, schedule=None, optimizer=None):
        self.config = config
        self.num_classes = num_classes
        self.mesh = mesh
        if mesh is None and config.num_devices > 1:
            self.mesh = make_mesh(config.num_devices)
        self.optimizer = optimizer or make_optimizer(config, schedule)
        self.params = params
        self.state = state
        self.opt_state = self.optimizer.init(params)
        if self.mesh is not None:
            self.params = replicate(self.params, self.mesh)
            self.state = replicate(self.state, self.mesh)
            self.opt_state = replicate(self.opt_state, self.mesh)
        self._step = make_train_step(num_classes, config, self.optimizer,
                                     self.mesh)
        self._eval = make_eval_step(num_classes, config, self.mesh)
        self.global_step = 0
        self.history = []

    def _place(self, batch):
        if self.mesh is not None:
            from .parallel.mesh import shard_batch
            return shard_batch(batch, self.mesh)
        return batch

    def train_step(self, batch) -> dict:
        batch = self._place(batch)
        self.params, self.state, self.opt_state, metrics = self._step(
            self.params, self.state, self.opt_state, batch)
        self.global_step += 1
        return metrics

    def eval_step(self, batch):
        return self._eval(self.params, self.state, self._place(batch))

    # -- checkpoint / resume (SURVEY §5: the reference had none) ----------
    def save_checkpoint(self, path: str, epoch: int = -1):
        """Full training checkpoint: params + BN state + optimizer state."""
        import numpy as np

        from . import checkpoint as ckpt
        opt_leaves = [np.asarray(x) for x in jax.tree.leaves(self.opt_state)]
        ckpt.save_npz(path, jax.tree.map(np.asarray, self.params),
                      {"model": jax.tree.map(np.asarray, self.state),
                       "opt_leaves": opt_leaves},
                      step=self.global_step, extra={"epoch": epoch})

    def restore_checkpoint(self, path: str) -> int:
        """Restore a full training checkpoint; returns the next epoch."""
        from . import checkpoint as ckpt
        params, wrapped, step, extra = ckpt.load_npz(path)
        self.params = params
        self.state = wrapped["model"]
        treedef = jax.tree.structure(self.optimizer.init(params))
        self.opt_state = jax.tree.unflatten(treedef, wrapped["opt_leaves"])
        if self.mesh is not None:
            self.params = replicate(self.params, self.mesh)
            self.state = replicate(self.state, self.mesh)
            self.opt_state = replicate(self.opt_state, self.mesh)
        self.global_step = step
        return int(extra.get("epoch", -1)) + 1

    def fit(self, train_gen, epochs: int, val_gen=None, initial_epoch: int = 0,
            callbacks: Optional[Iterable[Callable]] = None,
            log_every: int = 50, verbose: bool = True,
            resume_dir: Optional[str] = None):
        """Epoch loop with prefetching (reference fit, models.py:100-107 —
        minus its crash when val_gen is None).

        With ``resume_dir`` set, a full checkpoint (params+BN+optimizer) is
        written there every epoch and training auto-resumes from it after a
        crash/restart — the failure-recovery story the reference lacked.
        """
        import os

        from .data.pipeline import prefetch

        latest = (os.path.join(resume_dir, "latest.npz")
                  if resume_dir else None)
        if latest and os.path.exists(latest):
            initial_epoch = max(initial_epoch, self.restore_checkpoint(latest))
            if verbose:
                print(f"resumed from {latest} at epoch {initial_epoch}")
        elif resume_dir:
            os.makedirs(resume_dir, exist_ok=True)

        for epoch in range(initial_epoch, epochs):
            t0 = time.time()
            n, loss_sum = 0, 0.0
            for batch in prefetch(train_gen, epochs=1):
                metrics = self.train_step(batch)
                n += 1
                loss_sum += float(metrics["loss"])
                if verbose and n % log_every == 0:
                    print(f"epoch {epoch} step {n}/{len(train_gen)} "
                          f"loss {loss_sum / n:.4f}")
            entry = {"epoch": epoch, "loss": loss_sum / max(n, 1),
                     "time": time.time() - t0}
            if val_gen is not None:
                vn, vs = 0, 0.0
                for batch in prefetch(val_gen, epochs=1):
                    vs += float(self.eval_step(batch))
                    vn += 1
                entry["val_loss"] = vs / max(vn, 1)
            self.history.append(entry)
            if verbose:
                print({k: (f"{v:.4f}" if isinstance(v, float) else v)
                       for k, v in entry.items()})
            for cb in (callbacks or []):
                cb(self, entry)
            if latest:
                self.save_checkpoint(latest, epoch=epoch)
        return self.history
