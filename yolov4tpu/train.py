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
import jax.flatten_util
import jax.numpy as jnp
import optax
from jax import lax

from .config import YoloConfig
from .losses import yolo_loss
from .models import network
from .parallel.mesh import make_mesh, replicate


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


def fused_adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam over ONE raveled parameter vector instead of ~330 pytree leaves.

    optax.adam runs its moment updates leaf-by-leaf; for this model that is
    hundreds of small streaming kernels whose aggregate HBM throughput is
    ~330 GB/s on v5e.  Raveling grads into a single flat vector makes the
    update a handful of full-bandwidth streaming ops: 2x faster AS A
    STANDALONE DISPATCH (12.0 ms -> 6.5 ms for the 64 M-param COCO model),
    bit-identical math vs optax.adam (max param delta 4e-9, including
    schedule callables).

    Caveat (why config.fused_optimizer defaults False): fused into the full
    train step, the ravel concat is a scheduling barrier — leaf-wise adam
    overlaps each leaf's update with the remaining backward pass, the flat
    form cannot start until the last gradient exists.  Measured NET LOSS in
    the end-to-end step (36.5 -> 43 ms at 416^2 b8).  Use it where the
    update genuinely runs alone, e.g. the reduce phase of gradient
    accumulation or a parameter-server-style update process.
    """

    def init(params):
        flat, _ = jax.flatten_util.ravel_pytree(params)
        return {"mu": jnp.zeros_like(flat), "nu": jnp.zeros_like(flat),
                "count": jnp.zeros([], jnp.int32)}

    def update(grads, opt_state, params=None):
        del params
        flat_g, unravel = jax.flatten_util.ravel_pytree(grads)
        count = opt_state["count"] + 1
        mu = b1 * opt_state["mu"] + (1 - b1) * flat_g
        nu = b2 * opt_state["nu"] + (1 - b2) * lax.square(flat_g)
        cf = count.astype(jnp.float32)
        mu_hat = mu / (1 - b1 ** cf)
        nu_hat = nu / (1 - b2 ** cf)
        # Schedules are evaluated at the PRE-increment count, like optax's
        # scale_by_schedule (first update uses lr(0)).
        step = (learning_rate(opt_state["count"]) if callable(learning_rate)
                else learning_rate)
        updates = -step * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return unravel(updates), {"mu": mu, "nu": nu, "count": count}

    return optax.GradientTransformation(init, update)


def make_optimizer(config: YoloConfig, schedule=None) -> optax.GradientTransformation:
    """Adam at the reference's lr (models.py:83), optionally scheduled.

    ``config.fused_optimizer`` (default OFF — see fused_adam's caveat)
    selects the flat-vector :func:`fused_adam`; the default is leaf-wise
    optax.adam (identical numerics, different opt_state structure).

    Without a ``schedule``, the LR is exposed as a mutable optimizer-state
    hyperparameter (``opt_state.hyperparams['learning_rate']``) so epoch
    callbacks — :class:`yolov4tpu.callbacks.CosineAnnealingScheduler`, the
    equivalent of the reference's keras callback (reference
    custom_callbacks.py:5-15) — can drive it between steps via
    ``Trainer.set_learning_rate`` without recompiling the train step."""
    lr = schedule if schedule is not None else config.learning_rate
    if config.fused_optimizer:
        return fused_adam(lr)
    if schedule is None:
        return optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    return optax.adam(lr)


def _maybe_encode_on_device(batch: dict, config: YoloConfig,
                            num_classes: int) -> dict:
    """Turn a raw-boxes batch into a labels batch INSIDE the jit.

    With ``config.encode_on_device`` the DataGenerator ships
    {'image', 'raw_boxes': (B, max_boxes, 5)} and the anchor-grid scatter
    (the reference's slowest host code, reference utils.py:210-303) runs
    here as XLA scatters on the accelerator — the BASELINE north star's
    "anchor ground-truth target encoding run as jit-vectorized pipelines".
    Batches that already carry 'labels' pass through untouched, so host- and
    device-encoded pipelines share every step variant.

    Grid shapes key off the TRACED image shape, not the static config: under
    multi-scale training the step retraces per drawn size anyway (each size
    is a distinct jit signature), so the encoder sees the right static
    (h, w) per trace — device encoding and multi-scale compose.
    """
    if "labels" in batch:
        return batch
    from .data.encode import encode_labels_jax
    # (..., H, W, 3): robust to the grad-accum micro-batch stacking.
    img_hw = batch["image"].shape[-3:-1]
    labels, xywh = encode_labels_jax(
        batch["raw_boxes"], img_hw, config.anchors_flat,
        num_classes, config.strides)
    out = {"image": batch["image"], "labels": labels, "boxes": xywh}
    if "mask" in batch:  # padded ragged batch: keep the validity mask
        out["mask"] = batch["mask"]
    return out


def _batch_pspec(config: YoloConfig, spec, masked: bool = False):
    """shard_map PartitionSpec tree matching the batch the DataGenerator
    produces (labels batches, or raw-boxes batches with encode_on_device);
    ``masked`` adds the (B,) validity-mask leaf of pad-and-mask batches."""
    if config.encode_on_device:
        out = {"image": spec, "raw_boxes": spec}
    else:
        out = {"image": spec, "labels": [spec] * 3, "boxes": spec}
    if masked:
        out["mask"] = spec
    return out


def _make_grad_and_metrics(num_classes: int, config: YoloConfig,
                           mesh_axes=()):
    """(params, state, batch) -> (grads, new_state, metrics) — the shared
    core of every train-step variant.  Local computation only, no explicit
    collectives; BN batch statistics are over the batch it is given.

    mesh_axes: shard_map axis names when the core runs per-replica.  With a
    validity mask present, the differentiated loss is pre-scaled by
    ``w_local * n_dev / psum(w_local)`` so the IMPLICIT gradient psum
    (shard_map AD sums the cotangents of the replicated params) yields
    ``n_dev x`` the valid-count-weighted mean across shards — the caller's
    uniform ``grads / n_dev`` then gives exactly the mean over every valid
    sample of the global batch, however unevenly the padding falls.  With
    equal per-shard counts the scale is identically 1 (no numeric change)."""
    anchors = config.anchors_grouped
    compute_dtype = (jnp.bfloat16 if config.compute_dtype == "bfloat16"
                     else jnp.float32)

    def grad_and_metrics(params, state, batch):
        if batch["image"].dtype == jnp.uint8:
            # uint8 wire format (YoloConfig.transfer_uint8, or any caller
            # shipping raw decoded bytes): normalize on-device — 4x less
            # H2D traffic, within 1 ulp of a host-side /255 of the same
            # uint8 raster (XLA may lower /255 to a reciprocal multiply).
            batch = dict(batch,
                         image=batch["image"].astype(jnp.float32) / 255.0)
        batch = _maybe_encode_on_device(batch, config, num_classes)
        # Optional (B,) 0/1 validity mask ("mask" key): padded samples drop
        # out of loss means AND BN batch statistics, so a ragged batch
        # padded to an XLA-friendly size updates exactly like its trimmed
        # self (pad-and-mask; see Trainer.train_step).
        mask = batch.get("mask")
        loss_scale = None
        if mesh_axes and mask is not None:
            w_local = jnp.sum(mask, dtype=jnp.float32)
            w_global = lax.psum(w_local, mesh_axes)
            n_dev_f = lax.psum(jnp.float32(1.0), mesh_axes)
            loss_scale = w_local * n_dev_f / jnp.maximum(w_global, 1.0)
        if config.sat_epsilon > 0.0:
            # Self-adversarial training (the reference's unchecked TODO,
            # reference README.md:10-13): one FGSM step on the IMAGES that
            # maximises the current loss, then the normal weight update on
            # the perturbed batch.  Doubles fwd+bwd cost, as in the paper.
            def img_loss(images):
                outs, _ = network.apply(
                    params, state, images, num_classes, train=True,
                    compute_dtype=compute_dtype,
                    csp_repeats=config.csp_repeats,
                    bn_stats_gradient=config.bn_stats_gradient,
                    sample_mask=mask, pallas_wgrad=config.pallas_wgrad)
                return yolo_loss(
                    outs, batch["labels"], batch["boxes"], anchors,
                    config.strides, num_classes, config.iou_loss_thresh,
                    weights=(config.loss_box_weight, config.loss_conf_weight,
                             config.loss_prob_weight),
                    label_smoothing=config.label_smoothing,
                    sample_mask=mask)

            g_img = jax.grad(img_loss)(batch["image"])
            adv = jnp.clip(batch["image"]
                           + config.sat_epsilon * jnp.sign(g_img), 0.0, 1.0)
            batch = dict(batch, image=adv)

        def loss_fn(p):
            outs, new_state = network.apply(
                p, state, batch["image"], num_classes, train=True,
                compute_dtype=compute_dtype, csp_repeats=config.csp_repeats,
                bn_stats_gradient=config.bn_stats_gradient,
                sample_mask=mask, pallas_wgrad=config.pallas_wgrad)
            total, comps = yolo_loss(
                outs, batch["labels"], batch["boxes"], anchors,
                config.strides, num_classes, config.iou_loss_thresh,
                weights=(config.loss_box_weight, config.loss_conf_weight,
                         config.loss_prob_weight),
                label_smoothing=config.label_smoothing,
                return_components=True, sample_mask=mask)
            # Pre-scale ONLY the differentiated value (see docstring); the
            # reported loss/metrics stay the local masked means.
            scaled = total if loss_scale is None else total * loss_scale
            return scaled, (new_state, comps, total)

        (_, (new_state, comps, loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return grads, new_state, {"loss": loss, **comps}

    return grad_and_metrics


def _accumulated(grad_and_metrics, accum: int, mesh_axes=()):
    """Wrap a (params, state, batch) -> (grads, state, metrics) core so it
    scans over ``accum`` micro-batches stacked on a leading axis.

    Activations exist only for one micro-batch at a time (the scan body),
    so the effective batch grows ``accum``-fold at constant activation
    memory — one grads-sized buffer is the only extra cost.  Gradients and
    metrics are averaged; BN batch statistics update sequentially through
    the micro-batches (the same moving-average semantics sequential small
    batches would have).

    mesh_axes: shard_map axis names when the core runs per-replica.  The
    scan carry then starts replicated but becomes device-varying after one
    micro-step, so the initial carry must be pcast to 'varying' for the
    carry types to match (jax's shard-map VMA typing).
    """
    if accum <= 1:
        return grad_and_metrics

    def accumulated(params, state, batch):
        has_mask = isinstance(batch, dict) and "mask" in batch

        def body(carry, micro):
            gsum, wsum, wsum_local, st = carry
            g, new_st, m = grad_and_metrics(params, st, micro)
            # Micro-batches may carry unequal VALID counts (a padded ragged
            # tail): weight each micro-grad (a mean over its own valid
            # samples) by that count so the combination is the mean over
            # every valid sample of the whole logical batch.  Without masks
            # the weights are equal and this is the plain average.  On a
            # mesh the micro-grad is already the implicit-psum global
            # weighted mean (the core pre-scales the loss — see
            # _make_grad_and_metrics), so the GRADIENT weight must be the
            # GLOBAL valid count of the micro-round, which is also
            # mesh-invariant (scaling the invariant gsum by a
            # device-varying weight would break shard_map's VMA typing).
            # BN state and metrics are the opposite: they are LOCAL
            # (device-varying) values that the mesh step later combines
            # weighted by per-shard totals, so they must be guarded/
            # weighted by the LOCAL count — using the global count kept a
            # shard's throwaway all-padding BN stats whenever any OTHER
            # shard had valid samples, and double-counted metrics toward
            # whichever micro-rounds were globally fuller.
            if has_mask:
                w_local = jnp.sum(micro["mask"], dtype=jnp.float32)
                w = (lax.psum(w_local, tuple(mesh_axes)) if mesh_axes
                     else w_local)
            else:
                w_local = w = jnp.float32(1.0)
            gsum = jax.tree.map(lambda a, b: a + w * b, gsum, g)
            if has_mask:
                # An all-padding micro-batch (on THIS shard) must not
                # advance the BN moving statistics (its masked batch stats
                # are defined throwaway values).
                new_st = jax.tree.map(
                    lambda n, o: jnp.where(w_local > 0, n, o), new_st, st)
            return ((gsum, wsum + w, wsum_local + w_local, new_st),
                    jax.tree.map(lambda x: x * w_local, m))

        # Only the BN-state and local-count halves of the carry become
        # device-varying (their updates come from the sharded batch); the
        # gradient sum stays invariant (each micro-grad is already
        # shard_map-psummed), and pcasting it too would make the optimizer
        # update varying and break the replicated out_specs.
        if mesh_axes:
            state0 = lax.pcast(state, tuple(mesh_axes), to="varying")
            wl0 = lax.pcast(jnp.float32(0.0), tuple(mesh_axes),
                            to="varying")
        else:
            state0, wl0 = state, jnp.float32(0.0)
        init = (jax.tree.map(jnp.zeros_like, params), jnp.float32(0.0),
                wl0, state0)
        (gsum, wsum, wsum_local, new_state), ms = lax.scan(body, init, batch)
        grads = jax.tree.map(lambda g: g / jnp.maximum(wsum, 1e-6), gsum)
        metrics = jax.tree.map(
            lambda x: jnp.sum(x, axis=0) / jnp.maximum(wsum_local, 1e-6), ms)
        return grads, new_state, metrics

    return accumulated


def chunk_batch(batch: dict, accum: int) -> dict:
    """(B, ...) batch -> (accum, B/accum, ...) micro-batch stack for the
    gradient-accumulation step.  B must divide evenly."""
    def chunk(x):
        b = x.shape[0]
        assert b % accum == 0, (
            f"batch size {b} not divisible by grad_accum_steps {accum}")
        return x.reshape(accum, b // accum, *x.shape[1:])

    return jax.tree.map(chunk, batch)


_SMALL_POW2 = (1, 2, 4, 8, 16, 32)


def aligned_batch(b: int) -> bool:
    """Batch sizes XLA's conv tiling likes on TPU: small (<=32), or a
    multiple of 32.  Off sizes between the powers regress badly (b136/b144
    measured ~30% below b128 per-image, benchmarks/PERF_NOTES.md)."""
    return b <= 32 or b % 32 == 0


def aligned_size(b: int) -> int:
    """Smallest aligned batch >= b (next power of two up to 32, then the
    next multiple of 32)."""
    if b <= 32:
        return next(p for p in _SMALL_POW2 if p >= b)
    return -(-b // 32) * 32


def decompose_batch(b: int):
    """Split a non-aligned batch into aligned chunks: the largest multiple
    of 32, plus the remainder padded up to the next power of two (bounding
    the number of compiled programs).  Returns [(chunk_size, n_valid)]."""
    if aligned_batch(b):
        return [(b, b)]
    main = 32 * (b // 32)
    rem = b - main
    tgt = next(p for p in _SMALL_POW2 if p >= rem)
    return [(main, main), (tgt, rem)]


def pad_mask_batch(batch: dict, target: int) -> dict:
    """Pad every leaf to ``target`` samples on axis 0 and attach a (target,)
    0/1 validity mask.  Padded samples drop out of loss means and BN batch
    statistics (see _make_grad_and_metrics), so the step is numerically the
    trimmed batch's step."""
    b = next(iter(jax.tree.leaves(batch))).shape[0]
    mask = batch.get("mask")
    if mask is None:
        mask = jnp.ones((b,), jnp.float32)
    if b == target and "mask" in batch:
        return batch
    pad = target - b

    def pad_leaf(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    out = {k: jax.tree.map(pad_leaf, v)
           for k, v in batch.items() if k != "mask"}
    out["mask"] = jnp.pad(mask, (0, pad))
    return out


def make_train_step(num_classes: int, config: YoloConfig,
                    optimizer: optax.GradientTransformation,
                    mesh=None, donate: bool = True, masked: bool = False):
    """Build the jitted train step.

    Returned step: (params, state, opt_state, batch) ->
    (params, state, opt_state, metrics) where batch is
    {'image': (B,H,W,3), 'labels': [3 grids], 'boxes': (B,M,4)}.

    With ``config.grad_accum_steps > 1`` the batch must be pre-chunked by
    :func:`chunk_batch` to (accum, B/accum, ...): the step scans micro-
    batches, averaging gradients, for accum-times-larger effective batch at
    constant activation memory.

    ``masked`` (mesh path only): the batch carries a (B,) 0/1 validity
    mask (pad-and-mask ragged tails).  Gradients, BN moving statistics and
    metrics are weighted by per-shard valid counts, so the update equals
    the mean over every valid sample regardless of how padding falls across
    shards — ragged epoch tails train on the mesh instead of being dropped.
    """
    mesh_axes = ("data",) if mesh is not None else ()
    core = _make_grad_and_metrics(num_classes, config, mesh_axes=mesh_axes)
    grad_and_metrics = _accumulated(
        core, config.grad_accum_steps, mesh_axes=mesh_axes)

    def step(params, state, opt_state, batch):
        grads, new_state, metrics = grad_and_metrics(params, state, batch)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1, 2) if donate else ())

    # Mesh path: shard_map with LOCAL BatchNorm statistics and ONE fused
    # gradient pmean.  Per-replica BN is the reference's semantics (keras
    # BatchNormalization under MirroredStrategy is not cross-replica synced,
    # reference models.py:41-44) and collapses the ~300 per-layer
    # batch-stat collectives GSPMD would otherwise emit into 3 pmeans —
    # fewer, larger all-reduces ride ICI far better (and XLA:CPU's 40 s
    # collective rendezvous survives the virtual-device test rig).
    from jax.sharding import PartitionSpec as P

    # With gradient accumulation the leading batch axis is the micro-step
    # stack (replicated scan axis); the per-device shard axis is axis 1.
    spec = (P(None, "data") if config.grad_accum_steps > 1 else P("data"))
    batch_spec = _batch_pspec(config, spec, masked=masked)

    n_dev = mesh.devices.size

    def local_step(params, state, opt_state, batch):
        grads, new_state, metrics = grad_and_metrics(params, state, batch)
        # shard_map's AD already psums cotangents of replicated inputs
        # (transpose inserts psum_invariant), so `grads` here is the SUM of
        # per-replica gradients; divide by the replica count for the mean —
        # an explicit pmean would be an identity on the already-invariant
        # value and silently leave an n_dev-times-too-large gradient.
        # (With masks the core pre-scaled each shard's loss by
        # w_local * n_dev / w_global, so this same division yields the
        # valid-count-weighted mean — see _make_grad_and_metrics.)
        grads = jax.tree.map(lambda g: g / n_dev, grads)
        if masked:
            # Weight BN moving stats and metrics by per-shard valid counts:
            # an all-padding shard (w=0, finite throwaway stats by
            # construction — see network masked BN) contributes nothing,
            # and uneven tails average by sample, not by shard.
            w = jnp.sum(batch["mask"], dtype=jnp.float32)
            frac = w / jnp.maximum(lax.psum(w, "data"), 1.0)
            weighted = lambda t: lax.psum(  # noqa: E731
                jax.tree.map(lambda x: x * frac, t), "data")
            new_state = weighted(new_state)
            metrics = weighted(metrics)
        else:
            new_state = lax.pmean(new_state, "data")  # average BN stats
            metrics = lax.pmean(metrics, "data")
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt_state, metrics

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), batch_spec),
        out_specs=(P(), P(), P(), P()))
    return jax.jit(sharded, donate_argnums=(0, 1, 2) if donate else ())


def make_train_step_twophase(num_classes: int, config: YoloConfig,
                             optimizer: optax.GradientTransformation, mesh):
    """Mesh train step split into two dispatches: (1) per-shard gradients
    with ZERO collectives (outputs stay sharded on the data axis), then (2)
    a trivial-compute reduce + optimizer update.

    Numerically equivalent to the fused ``make_train_step(mesh=...)`` (same
    local-BN semantics; mean over the stacked axis == pmean).  Exists for
    hosts where the mesh is N *virtual* devices time-slicing a few cores
    (the multi-chip dry-run rig): there the fused step's replicas reach the
    gradient all-reduce up to N full backward-passes apart, and XLA:CPU's
    collective rendezvous kills the process after 40 s.  Phase 1 has no
    rendezvous at all; phase 2's replicas arrive together because their
    pre-collective compute is trivial.  On real TPU meshes prefer the fused
    step — it overlaps the backward pass with the gradient all-reduce.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if config.grad_accum_steps > 1:
        raise ValueError(
            "make_train_step_twophase does not support grad_accum_steps>1 — "
            "use make_train_step(mesh=...), which does")
    grad_and_metrics = _make_grad_and_metrics(num_classes, config)
    batch_spec = _batch_pspec(config, P("data"))

    def local_grads(params, state, batch):
        grads, new_state, metrics = grad_and_metrics(params, state, batch)
        stack = lambda t: jax.tree.map(lambda x: x[None], t)  # noqa: E731
        return stack(grads), stack(new_state), stack(metrics)

    # check_vma=False: with it on, shard_map's AD transpose inserts a
    # psum_invariant for the cotangent of the replicated params — a hidden
    # collective at the END of the heaviest per-replica computation, exactly
    # the rendezvous this two-phase split exists to avoid.  With it off the
    # outputs are the raw per-shard gradients, and phase 2's mean performs
    # the (mathematically identical) reduction.
    phase1 = jax.jit(jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(P(), P(), batch_spec),
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False))

    repl = NamedSharding(mesh, P())

    # Phase 1b (no collectives): concatenate every stacked leaf into ONE
    # (n_dev, D) slab.  A leaf-wise mean in the reduce phase would emit one
    # all-reduce per leaf (~500 tiny collectives for this model), and the
    # concat itself is seconds of per-device memcpy that must NOT sit in
    # front of a rendezvous — so it gets its own dispatch + barrier.
    import numpy as _np

    data0 = NamedSharding(mesh, P("data"))

    def to_slab(*stacked):
        leaves = jax.tree.leaves(stacked)
        return jnp.concatenate(
            [l.reshape(l.shape[0], -1) for l in leaves], axis=1)

    # Pin the slab's sharding: inference through a 500-leaf reshape+concat
    # can fall back to replicated, which would smuggle a 2 GB all-gather
    # into the next dispatch.
    phase1b = jax.jit(to_slab, out_shardings=data0)

    def combine(slab, params, opt_state, treedef, shapes):
        flat = jnp.mean(slab, axis=0)                 # the ONE all-reduce
        sizes = [max(int(_np.prod(s)), 1) for s in shapes]
        parts = jnp.split(flat, list(_np.cumsum(sizes))[:-1])
        merged = [p.reshape(s) for p, s in zip(parts, shapes)]
        grads, new_state, metrics = jax.tree.unflatten(treedef, merged)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_state,
                new_opt_state, metrics)

    phase2 = jax.jit(combine, static_argnames=("treedef", "shapes"),
                     out_shardings=(repl, repl, repl, repl))

    def step(params, state, opt_state, batch):
        stacked = phase1(params, state, batch)
        # Barriers: without them async dispatch pipelines the next phase
        # behind each device's previous one, so the first device reaches the
        # all-reduce while the others are still in their backward pass —
        # recreating the exact stagger this function exists to avoid.
        jax.block_until_ready(stacked)
        leaves, treedef = jax.tree.flatten(stacked)
        shapes = tuple(tuple(l.shape[1:]) for l in leaves)
        slab = phase1b(*stacked)
        jax.block_until_ready(slab)
        return phase2(slab, params, opt_state, treedef, shapes)

    # Exposed for the multi-chip dryrun: phase 1 (per-shard AD over the full
    # depth) is ~95% of this step's compile time, and `__graft_entry__`
    # pre-compiles it via .lower().compile() so a cold-cache gate run shows
    # where the time goes (the persistent compile cache dedupes the later
    # in-step compile).
    step.phase1 = phase1
    return step


def make_eval_step(num_classes: int, config: YoloConfig, mesh=None,
                   masked: bool = False):
    """Jitted validation loss (BN in inference mode).

    ``masked`` (mesh path): the batch carries a (B,) 0/1 validity mask
    (pad_mask_batch) and the returned loss is the mean over VALID samples
    only, weighted across shards by per-shard valid counts — a ragged
    validation tail evaluates on the mesh to exactly its trimmed-batch
    loss, mirroring make_train_step(masked=True)."""
    anchors = config.anchors_grouped

    def step(params, state, batch):
        if batch["image"].dtype == jnp.uint8:
            batch = dict(batch,
                         image=batch["image"].astype(jnp.float32) / 255.0)
        batch = _maybe_encode_on_device(batch, config, num_classes)
        mask = batch.get("mask") if masked else None
        outs, _ = network.apply(params, state, batch["image"], num_classes,
                                train=False, csp_repeats=config.csp_repeats)
        return yolo_loss(outs, batch["labels"], batch["boxes"], anchors,
                         config.strides, num_classes, config.iou_loss_thresh,
                         weights=(config.loss_box_weight,
                                  config.loss_conf_weight,
                                  config.loss_prob_weight),
                         sample_mask=mask)

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import PartitionSpec as P

    batch_spec = _batch_pspec(config, P("data"), masked=masked)

    def local_step(params, state, batch):
        loss = step(params, state, batch)
        if masked:
            # Valid-count-weighted mean across shards: an all-padding shard
            # (w=0, finite throwaway loss by masked-mean construction)
            # contributes nothing.
            w = jnp.sum(batch["mask"], dtype=jnp.float32)
            return (lax.psum(loss * w, "data")
                    / jnp.maximum(lax.psum(w, "data"), 1.0))
        return lax.pmean(loss, "data")

    return jax.jit(jax.shard_map(local_step, mesh=mesh,
                                 in_specs=(P(), P(), batch_spec),
                                 out_specs=P()))


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
        else:
            # network.init returns host (numpy) arrays; commit them to the
            # device once, or the first train step re-transfers all params.
            self.params, self.state, self.opt_state = jax.device_put(
                (self.params, self.state, self.opt_state))
        self._step = make_train_step(num_classes, config, self.optimizer,
                                     self.mesh)
        self._step_masked = None  # lazy: mesh pad-and-mask variant
        self._eval = make_eval_step(num_classes, config, self.mesh)
        self._eval_masked = None  # lazy: pad-and-mask eval (ragged tails)
        self._chunk_grad = None     # lazy: jitted grads for aligned chunks
        self._chunk_combine = None  # lazy: weighted combine + Adam update
        self.global_step = 0
        self.history = []

    def _place(self, batch, batch_axis: int = 0):
        if self.mesh is not None:
            from .parallel.mesh import shard_batch
            return shard_batch(batch, self.mesh, batch_axis=batch_axis)
        return batch

    def _prefetch_place(self, batch):
        """Producer-thread device placement (double-buffered device_put):
        ships full batches to the accelerator from inside the prefetch
        thread, so batch N+1's async H2D copy rides under batch N's
        compute.  Ragged/non-aligned batches stay on host — train_step pads
        or chunks them there first (host-side numpy padding is cheap;
        re-placement of already-placed arrays is a no-op)."""
        b = next(iter(jax.tree.leaves(batch))).shape[0]
        if self.mesh is not None:
            # Only accum==1 batches are pre-placed: grad-accum batches stay
            # on host because train_step reshapes them into micro-batches
            # before sharding.
            if self.config.grad_accum_steps == 1 \
                    and b % self.mesh.devices.size == 0:
                return self._place(batch)
            return batch
        if self.config.grad_accum_steps == 1 and aligned_batch(b):
            return jax.device_put(batch)
        return batch

    def train_step(self, batch) -> dict:
        """Run one optimizer step.  Never drops samples: single-device
        ragged/non-aligned batches are padded to an XLA-aligned size with a
        validity mask or split into aligned chunks; MESH ragged tails are
        padded to a whole number of per-device (micro-)batches and the
        gradient all-reduce, BN statistics and metrics are weighted by
        per-shard valid counts (see make_train_step(masked=True)) — the
        update equals the mean over every valid sample, however unevenly
        the padding falls across shards."""
        accum = self.config.grad_accum_steps
        b = next(iter(jax.tree.leaves(batch))).shape[0]
        if accum == 1 and self.mesh is None and not aligned_batch(b):
            # Non-aligned batch (either a weird configured batch_size like
            # 136, or a ragged epoch tail): run aligned chunks with valid-
            # count-weighted gradient combination — b136 = b128 + b8 runs at
            # ~b128 per-image throughput instead of the ~30% tiling
            # regression of a native b136 program.
            return self._chunked_step(batch)
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        multiple = accum * n_dev
        if accum > 1:
            # Misconfiguration (as opposed to a ragged tail) is judged
            # against the NOMINAL full batch: if even a full generator batch
            # cannot be split into accum x num_devices equal micro-batches,
            # no amount of padding helps — fail loudly.  The device count
            # is the ACTUAL mesh size (a Trainer built with an explicit
            # mesh is judged against the mesh it runs on, not the config's
            # num_devices hint).
            nominal = self.config.batch_size * n_dev
            if nominal % multiple:
                raise ValueError(
                    f"full batches of {nominal} samples "
                    f"(batch_size x num_devices) cannot be split into "
                    f"grad_accum_steps={accum} x {n_dev}-device "
                    "micro-batches — lower grad_accum_steps or raise "
                    "batch_size")
        if b % multiple:
            # Ragged tail: pad to a whole number of per-device micro-batch
            # rounds with a validity mask — nothing is dropped, on any path.
            batch = pad_mask_batch(batch, -(-b // multiple) * multiple)
        if accum > 1:
            batch = chunk_batch(batch, accum)
        batch = self._place(batch, batch_axis=1 if accum > 1 else 0)
        step = self._step
        if self.mesh is not None and "mask" in batch:
            if self._step_masked is None:
                self._step_masked = make_train_step(
                    self.num_classes, self.config, self.optimizer,
                    self.mesh, masked=True)
            step = self._step_masked
        self.params, self.state, self.opt_state, metrics = step(
            self.params, self.state, self.opt_state, batch)
        self.global_step += 1
        return metrics

    def _chunked_step(self, batch) -> dict:
        """One optimizer step over a non-aligned batch, as aligned chunks.

        Each chunk runs the shared gradient core (its own BN batch stats —
        the same local-stats semantics as the mesh step's per-replica BN);
        gradients, BN states and metrics combine weighted by valid counts,
        then one Adam update applies.  b136 -> b128 + b8 measures within a
        few % of b128's per-image throughput (vs ~30% regression for a
        native b136 program, benchmarks/PERF_NOTES.md)."""
        if self._chunk_grad is None:
            # Donating the batch piece lets XLA reuse its ~0.7 GB (b128
            # f32 images + encoded label grids) inside the grad program —
            # the chunk path holds the other chunks' gradients alongside a
            # full b128 working set, and measured b136 on a 416^2/80-class
            # net OOMs without this (the piece is always a fresh slice or
            # pad, never caller-owned, so donation is safe).
            self._chunk_grad = jax.jit(
                _make_grad_and_metrics(self.num_classes, self.config),
                donate_argnums=(2,))

            def combine_update(params, opt_state, gs, sts, ms, ws):
                wsum = sum(ws)
                wavg = lambda *xs: sum(  # noqa: E731
                    w * x for w, x in zip(ws, xs)) / wsum
                g = jax.tree.map(wavg, *gs)
                st = jax.tree.map(wavg, *sts)
                m = jax.tree.map(wavg, *ms)
                updates, new_opt = self.optimizer.update(g, opt_state,
                                                         params)
                return optax.apply_updates(params, updates), st, new_opt, m

            self._chunk_combine = jax.jit(combine_update,
                                          donate_argnums=(0, 1))

        b = next(iter(jax.tree.leaves(batch))).shape[0]
        gs, sts, ms, ws = [], [], [], []
        offset = 0
        for size, valid in decompose_batch(b):
            piece = jax.tree.map(lambda x: x[offset:offset + valid], batch)
            offset += valid
            if valid < size:
                piece = pad_mask_batch(piece, size)
            g, st, m = self._chunk_grad(self.params, self.state, piece)
            gs.append(g)
            sts.append(st)
            ms.append(m)
            ws.append(jnp.float32(valid))
        self.params, self.state, self.opt_state, metrics = \
            self._chunk_combine(self.params, self.opt_state,
                                tuple(gs), tuple(sts), tuple(ms), tuple(ws))
        self.global_step += 1
        return metrics

    # -- mutable learning rate (callback-driven scheduling) ---------------
    def _lr_hyperparams(self) -> dict:
        hp = getattr(self.opt_state, "hyperparams", None)
        if not isinstance(hp, dict) or "learning_rate" not in hp:
            raise RuntimeError(
                "this Trainer's optimizer does not expose a mutable "
                "learning rate (it was built with an optax schedule or a "
                "custom/fused optimizer) — either construct the Trainer "
                "without `schedule` so make_optimizer wraps Adam in "
                "optax.inject_hyperparams, or drop the LR callback and use "
                "train.cosine_annealing_schedule instead")
        return hp

    @property
    def learning_rate(self) -> float:
        """The LR the NEXT optimizer step will apply."""
        return float(jnp.ravel(
            jnp.asarray(self._lr_hyperparams()["learning_rate"]))[0])

    def set_learning_rate(self, lr: float) -> None:
        """Set the LR applied from the next step on, without recompiling.

        The LR lives in optimizer state (optax.inject_hyperparams), so a
        host-side write here flows into the already-jitted train step."""
        hp = self._lr_hyperparams()
        value = jnp.asarray(lr, jnp.float32)
        if self.mesh is not None:
            value = replicate(value, self.mesh)
        hp["learning_rate"] = value

    def eval_step(self, batch):
        """Validation loss on one batch.  Ragged tails never raise: a batch
        that does not split evenly across the mesh (or is XLA-non-aligned on
        a single device) is padded to the nearest aligned/device-divisible
        size with a validity mask, and the masked eval step returns exactly
        the trimmed batch's loss (pad-and-mask, mirroring train_step)."""
        b = next(iter(jax.tree.leaves(batch))).shape[0]
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        ragged = (b % n_dev != 0 if self.mesh is not None
                  else not aligned_batch(b))
        if ragged:
            target = -(-b // n_dev) * n_dev
            if self.mesh is None:
                target = aligned_size(b)
            batch = pad_mask_batch(batch, target)
            if self._eval_masked is None:
                self._eval_masked = make_eval_step(
                    self.num_classes, self.config, self.mesh, masked=True)
            return self._eval_masked(self.params, self.state,
                                     self._place(batch))
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
        import numpy as np

        from . import checkpoint as ckpt
        params, wrapped, step, extra = ckpt.load_npz(path)
        self.params = params
        self.state = wrapped["model"]
        fresh_opt = self.optimizer.init(params)
        treedef = jax.tree.structure(fresh_opt)
        fresh_leaves = jax.tree.leaves(fresh_opt)
        saved_leaves = wrapped["opt_leaves"]
        # Migration gate: leaf COUNT alone could match a different layout by
        # coincidence and silently unflatten moments into the wrong slots;
        # require per-leaf shape AND dtype agreement too.
        compatible = (
            treedef.num_leaves == len(saved_leaves)
            and all(tuple(np.shape(s)) == tuple(np.shape(f))
                    and np.asarray(s).dtype == np.asarray(f).dtype
                    for s, f in zip(saved_leaves, fresh_leaves)))
        if not compatible:
            # Checkpoint from a different optimizer format (e.g. pre-
            # inject_hyperparams plain Adam): params/step/epoch restore,
            # Adam moments restart — better than dying at resume time.
            print(f"restore_checkpoint: optimizer state in {path} "
                  f"({len(saved_leaves)} leaves) does not match the current "
                  f"optimizer's layout ({treedef.num_leaves} leaves, "
                  "shape/dtype-checked); reinitializing optimizer state "
                  "(params/step/epoch are restored)")
            self.opt_state = fresh_opt
        else:
            self.opt_state = jax.tree.unflatten(treedef, saved_leaves)
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
            for cb in (callbacks or []):
                begin = getattr(cb, "on_epoch_begin", None)
                if begin is not None:
                    begin(self, epoch)
            t0 = time.time()
            # Losses stay on device until a log point / epoch end: float()
            # every step would block the host on each step's completion and
            # stop step N+1's dispatch from overlapping step N's compute.
            n, losses = 0, []
            # transform=_prefetch_place: batch N+1's host->device copy is
            # issued from the producer thread and rides under batch N's
            # compute (double-buffered device_put, SURVEY hard part #4).
            for batch in prefetch(train_gen, epochs=1,
                                  transform=self._prefetch_place):
                metrics = self.train_step(batch)
                n += 1
                losses.append(metrics["loss"])
                if verbose and n % log_every == 0:
                    # Running epoch mean, fetched only at log points — by
                    # now every step but the newest has long completed, so
                    # this sync costs one step's latency, not n.
                    mean = sum(float(l) for l in losses) / n
                    print(f"epoch {epoch} step {n}/{len(train_gen)} "
                          f"loss {mean:.4f}")
            if n == 0:
                # Zero optimizer steps: the generator was empty.  Recording
                # loss 0.0 and saving a "best" checkpoint of an untrained
                # model would be silently wrong — fail instead.
                raise ValueError(
                    f"epoch {epoch} ran zero optimizer steps — the "
                    "generator yielded no batches; grow the dataset")
            loss_sum = float(sum(float(l) for l in losses))
            entry = {"epoch": epoch, "loss": loss_sum / n,
                     "time": time.time() - t0}
            if val_gen is not None:
                vlosses = [self.eval_step(batch)
                           for batch in prefetch(val_gen, epochs=1)]
                entry["val_loss"] = (sum(float(v) for v in vlosses)
                                     / max(len(vlosses), 1))
            self.history.append(entry)
            if verbose:
                print({k: (f"{v:.4f}" if isinstance(v, float) else v)
                       for k, v in entry.items()})
            for cb in (callbacks or []):
                cb(self, entry)
            if latest:
                self.save_checkpoint(latest, epoch=epoch)
        return self.history
