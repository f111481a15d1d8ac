"""Training tests: step mechanics, overfit convergence, 8-fake-device DP
equivalence (SURVEY §4 distributed tier)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov4tpu.config import YoloConfig
from yolov4tpu.data.encode import preprocess_true_boxes
from yolov4tpu.models import network
from yolov4tpu.parallel.mesh import make_mesh
from yolov4tpu.train import (Trainer, cosine_annealing_schedule,
                             make_optimizer, make_train_step)

CFG = YoloConfig(img_size=(64, 64, 3), batch_size=2)
C = 2


def _synthetic_batch(rng, bs=2):
    imgs = rng.uniform(0, 1, (bs, 64, 64, 3)).astype(np.float32)
    boxes = np.zeros((bs, 100, 5), np.float32)
    boxes[:, 0] = [8, 8, 40, 40, 0]
    boxes[:, 1] = [30, 20, 60, 60, 1]
    labels, xywh = preprocess_true_boxes(boxes, (64, 64), CFG.anchors_flat, C)
    return {"image": jnp.asarray(imgs),
            "labels": [jnp.asarray(l) for l in labels],
            "boxes": jnp.asarray(xywh)}


@pytest.fixture(scope="module")
def setup():
    params, state, _ = network.init(C, img_size=64, seed=0)
    batch = _synthetic_batch(np.random.default_rng(1234))
    return params, state, batch


def test_train_step_runs_and_updates(setup):
    params, state, batch = setup
    opt = make_optimizer(CFG)
    step = make_train_step(C, CFG, opt)
    opt_state = opt.init(params)
    p2, s2, o2, metrics = step(params, state, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    w0 = np.asarray(jax.tree.leaves(params)[0])
    w1 = np.asarray(jax.tree.leaves(p2)[0])
    assert not np.allclose(w0, w1)
    # BN moving stats updated
    assert not np.allclose(np.asarray(state["bn"][0]["mean"]),
                           np.asarray(s2["bn"][0]["mean"]))


def test_train_step_bfloat16(setup):
    """bf16 training works end-to-end (regression: a traced -inf init in the
    SPP maxpool broke reduce_window's reverse-mode AD for non-f32 dtypes)."""
    params, state, batch = setup
    cfg = CFG.replace(compute_dtype="bfloat16")
    opt = make_optimizer(cfg)
    step = make_train_step(C, cfg, opt, donate=False)
    _, _, _, metrics = step(params, state, opt.init(params), batch)
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_sat(setup):
    """Self-adversarial training: the FGSM image perturbation changes the
    update (vs sat off) and keeps the loss finite."""
    params, state, batch = setup
    cfg_sat = CFG.replace(sat_epsilon=0.01)
    opt = make_optimizer(CFG)
    p_plain, _, _, m_plain = make_train_step(C, CFG, opt, donate=False)(
        params, state, opt.init(params), batch)
    p_sat, _, _, m_sat = make_train_step(C, cfg_sat, opt, donate=False)(
        params, state, opt.init(params), batch)
    assert np.isfinite(float(m_sat["loss"]))
    # The adversarial image raises the loss relative to the clean batch.
    assert float(m_sat["loss"]) >= float(m_plain["loss"])
    w_plain = np.asarray(jax.tree.leaves(p_plain)[0])
    w_sat = np.asarray(jax.tree.leaves(p_sat)[0])
    assert not np.allclose(w_plain, w_sat)


def test_bn_stats_gradient_flag(setup):
    """bn_stats_gradient=False: forward (loss) is unchanged — stop_gradient
    is an identity there — but the backward drops the stat-gradient chain,
    so the update genuinely differs from the parity default."""
    params, state, batch = setup
    cfg = CFG.replace(bn_stats_gradient=False)
    opt = make_optimizer(CFG)
    p_a, _, _, m_a = make_train_step(C, CFG, opt, donate=False)(
        params, state, opt.init(params), batch)
    p_b, _, _, m_b = make_train_step(C, cfg, opt, donate=False)(
        params, state, opt.init(params), batch)
    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), rel=1e-6)
    assert np.isfinite(float(m_b["loss"]))
    a0 = np.asarray(jax.tree.leaves(p_a)[0])
    b0 = np.asarray(jax.tree.leaves(p_b)[0])
    assert not np.allclose(a0, b0)


def test_overfit_tiny_synthetic(setup, rng):
    """Loss decreases substantially on one repeated batch (integration tier)."""
    params, state, batch = setup
    cfg = CFG.replace(learning_rate=1e-3)
    opt = make_optimizer(cfg)
    step = make_train_step(C, cfg, opt, donate=False)
    opt_state = opt.init(params)
    first = None
    for i in range(12):
        params, state, opt_state, metrics = step(params, state, opt_state,
                                                 batch)
        loss = float(metrics["loss"])
        if first is None:
            first = loss
    assert np.isfinite(loss)
    assert loss < first * 0.7, f"no convergence: {first} -> {loss}"


def test_dp_mesh_equivalence():
    """Fake-device data-parallel step == single-device step on the same
    global batch (gradient all-reduce correctness).

    Sized for a 1-core CI host: 4 devices at 32px.  XLA:CPU's collective
    rendezvous hard-aborts the process after 40 s if replicas (which
    time-slice the host cores) arrive too staggered, so per-replica work
    must stay small."""
    from yolov4tpu.losses import yolo_loss
    from yolov4tpu.parallel.mesh import batch_sharding, replicated

    params, state, _ = network.init(C, img_size=32, seed=0)
    assert jax.device_count() >= 4, "conftest must fake >=4 devices"
    cfg = YoloConfig(img_size=(32, 32, 3), batch_size=1)
    # Local deterministic rng: the shared session fixture makes the batch
    # depend on test order, and the train-mode BN loss check below sits
    # near the fp32-chaos boundary for some draws.
    rng = np.random.default_rng(99)
    imgs = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    boxes = np.zeros((4, 100, 5), np.float32)
    boxes[:, 0] = [4, 4, 20, 20, 0]
    boxes[:, 1] = [15, 10, 30, 30, 1]
    labels, xywh = preprocess_true_boxes(boxes, (32, 32), cfg.anchors_flat, C)
    big_batch = {"image": jnp.asarray(imgs),
                 "labels": [jnp.asarray(l) for l in labels],
                 "boxes": jnp.asarray(xywh)}

    # Gradient equivalence is asserted with BN in inference mode: the
    # train-mode BN gradient at random init is numerically CHAOTIC — even on
    # one device, permuting the batch (mathematically a no-op) changes
    # gradients by >10x relative, because fp32 reduction-order noise in the
    # 110 stacked batch-statistics terms amplifies through the graph.  Eval
    # mode exercises the identical data-parallel structure (sharded batch,
    # replicated params, XLA-inserted gradient all-reduce) with a
    # well-conditioned objective; train-mode equivalence is asserted at the
    # loss level where it is numerically meaningful.
    def loss_fn(p, batch, train):
        outs, _ = network.apply(p, state, batch["image"], C, train=train)
        return yolo_loss(outs, batch["labels"], batch["boxes"],
                         cfg.anchors_grouped, cfg.strides, C,
                         cfg.iou_loss_thresh)

    mesh = make_mesh(4)
    repl, data = replicated(mesh), batch_sharding(mesh)
    batch_sh = {"image": data, "labels": [data] * 3, "boxes": data}

    vg = jax.value_and_grad(lambda p, b: loss_fn(p, b, False))
    l1, g1 = jax.jit(vg)(params, big_batch)
    l8, g8 = jax.jit(vg, in_shardings=(repl, batch_sh),
                     out_shardings=(repl, repl))(params, big_batch)
    assert float(l1) == pytest.approx(float(l8), rel=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        a, b = np.asarray(a), np.asarray(b)
        tol = 1e-6 * max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(a, b, atol=tol, rtol=1e-5)

    # Train mode (BN batch stats): loss-level equivalence.  Loose rel: f32
    # reduction-order noise through 110 stacked batch-stat terms reaches
    # ~1e-4 relative on the loss (and makes its GRADIENT chaotic — see
    # docstring), so 1e-3 is the meaningful-and-stable bound.
    lt1 = jax.jit(lambda p, b: loss_fn(p, b, True))(params, big_batch)
    lt8 = jax.jit(lambda p, b: loss_fn(p, b, True),
                  in_shardings=(repl, batch_sh),
                  out_shardings=repl)(params, big_batch)
    assert float(lt1) == pytest.approx(float(lt8), rel=1e-3)


def test_mesh_grad_accum_step(rng):
    """Mesh DP composes with gradient accumulation: batch stacked as
    (accum, per_dev*n_dev, ...), sharded on axis 1, one scan per replica."""
    from yolov4tpu.parallel.mesh import replicate, shard_batch
    from yolov4tpu.train import chunk_batch

    cfg = YoloConfig(img_size=(32, 32, 3), batch_size=1,
                     csp_repeats=(1, 1, 1, 1, 1), grad_accum_steps=2)
    params, state, _ = network.init(C, img_size=32, seed=0,
                                    csp_repeats=cfg.csp_repeats)
    mesh = make_mesh(2)
    opt = make_optimizer(cfg)
    step = make_train_step(C, cfg, opt, mesh=mesh, donate=False)

    bs = 4  # accum 2 x 2 devices x 1 per device
    img = rng.uniform(0, 1, (bs, 32, 32, 3)).astype(np.float32)
    boxes = np.zeros((bs, 100, 5), np.float32)
    boxes[:, 0] = [4, 4, 20, 20, 0]
    labels, xywh = preprocess_true_boxes(boxes, (32, 32), cfg.anchors_flat, C)
    batch = chunk_batch({"image": jnp.asarray(img),
                         "labels": [jnp.asarray(l) for l in labels],
                         "boxes": jnp.asarray(xywh)}, 2)
    batch = shard_batch(batch, mesh, batch_axis=1)
    p, s, o, m = step(replicate(params, mesh), replicate(state, mesh),
                      replicate(opt.init(params), mesh), batch)
    assert np.isfinite(float(m["loss"]))
    moved = float(jnp.abs(jax.tree.leaves(p)[0]
                          - jax.tree.leaves(params)[0]).max())
    assert moved > 0


@pytest.mark.heavy
def test_mesh_step_collective_count(rng):
    """The fused mesh step's collective budget is an INVARIANT, not a
    comment: the shard_map design collapses what GSPMD would emit as ~300
    per-layer batch-stat collectives into a handful of fused all-reduces
    (local BN + one gradient psum + state/metrics pmeans — train.py:422-429).
    Compile the 8-device step and count all-reduce instructions in the
    optimized HLO; a shard_map/GSPMD regression that reintroduces per-layer
    collectives fails loudly here instead of resurfacing as 40 s rendezvous
    aborts on real meshes (VERDICT r04 weak#6)."""
    from yolov4tpu.parallel.mesh import replicate, shard_batch

    cfg = YoloConfig(img_size=(32, 32, 3), batch_size=1,
                     csp_repeats=(1, 1, 1, 1, 1), num_devices=8)
    params, state, _ = network.init(C, img_size=32, seed=0,
                                    csp_repeats=cfg.csp_repeats)
    mesh = make_mesh(8)
    opt = make_optimizer(cfg)
    step = make_train_step(C, cfg, opt, mesh=mesh, donate=False)

    img = rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
    boxes = np.zeros((8, 100, 5), np.float32)
    boxes[:, 0] = [4, 4, 20, 20, 0]
    labels, xywh = preprocess_true_boxes(boxes, (32, 32), cfg.anchors_flat, C)
    batch = shard_batch({"image": jnp.asarray(img),
                         "labels": [jnp.asarray(l) for l in labels],
                         "boxes": jnp.asarray(xywh)}, mesh)
    args = (replicate(params, mesh), replicate(state, mesh),
            replicate(opt.init(params), mesh), batch)

    hlo = step.lower(*args).compile().as_text()
    n_ar = hlo.count(" all-reduce(") + hlo.count(" all-reduce-start(")
    n_conv = hlo.count(" convolution(") + hlo.count(" convolution-start(")
    # The claimed handful: grad psum + BN-state pmean + metrics pmean, after
    # XLA's all-reduce combiner.  Bound it well under the per-layer count.
    assert 1 <= n_ar <= 12, f"all-reduce count drifted: {n_ar}\n"
    assert n_conv == 0 or n_ar < n_conv / 4, (n_ar, n_conv)

    # The compiled program must still run (the count means nothing if the
    # lowering is broken).
    _, _, _, m = step(*args)
    assert np.isfinite(float(m["loss"]))


def test_shard_map_train_step(rng):
    """Mesh train step semantics: with the SAME sample replicated onto every
    device, the data-parallel step must equal the single-device step on one
    copy — identical local batches make local-BN stats, per-replica
    gradients, and their mean all coincide.  Catches gradient sum-vs-mean
    scaling bugs (shard_map AD auto-psums cotangents of replicated params).
    Also checks the two-phase variant agrees with the fused step."""
    from yolov4tpu.parallel.mesh import replicate, shard_batch
    from yolov4tpu.train import make_train_step_twophase

    # Shallow depth: same step code/sharding specs, ~4x faster CI compiles,
    # and per-replica work small enough for XLA:CPU's 40s collective window.
    cfg = YoloConfig(img_size=(32, 32, 3), batch_size=1,
                     csp_repeats=(1, 1, 1, 1, 1))
    params, state, _ = network.init(C, img_size=32, seed=0,
                                    csp_repeats=cfg.csp_repeats)
    mesh = make_mesh(4)
    opt = make_optimizer(cfg)

    img = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    boxes = np.zeros((1, 100, 5), np.float32)
    boxes[:, 0] = [4, 4, 20, 20, 0]
    labels, xywh = preprocess_true_boxes(boxes, (32, 32), cfg.anchors_flat, C)
    one = {"image": jnp.asarray(img),
           "labels": [jnp.asarray(l) for l in labels],
           "boxes": jnp.asarray(xywh)}
    four = {"image": jnp.concatenate([one["image"]] * 4),
            "labels": [jnp.concatenate([l] * 4) for l in one["labels"]],
            "boxes": jnp.concatenate([one["boxes"]] * 4)}

    single = make_train_step(C, cfg, opt, donate=False)
    p1, s1, _, m1 = single(params, state, opt.init(params), one)

    step = make_train_step(C, cfg, opt, mesh=mesh, donate=False)
    params_r = replicate(params, mesh)
    state_r = replicate(state, mesh)
    opt_r = replicate(opt.init(params), mesh)
    p4, s4, o4, m4 = step(params_r, state_r, opt_r,
                          shard_batch(four, mesh))

    assert float(m1["loss"]) == pytest.approx(float(m4["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=5e-6, rtol=1e-4)

    # Two-phase variant == fused variant on the same inputs.
    step2 = make_train_step_twophase(C, cfg, opt, mesh)
    p4b, s4b, _, m4b = step2(params_r, state_r, replicate(opt.init(params),
                                                          mesh),
                             shard_batch(four, mesh))
    assert float(m4b["loss"]) == pytest.approx(float(m4["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(p4), jax.tree.leaves(p4b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)
    # BN moving stats were updated.
    assert not np.allclose(np.asarray(state["bn"][0]["mean"]),
                           np.asarray(s4["bn"][0]["mean"]))


def test_mesh_step_with_encode_on_device(rng):
    """encode_on_device composes with the shard_map mesh step: raw-boxes
    batches shard on the data axis and the per-replica encoder runs inside
    the sharded program."""
    from yolov4tpu.parallel.mesh import replicate, shard_batch

    cfg = YoloConfig(img_size=(32, 32, 3), batch_size=1,
                     csp_repeats=(1, 1, 1, 1, 1), encode_on_device=True)
    params, state, _ = network.init(C, img_size=32, seed=0,
                                    csp_repeats=cfg.csp_repeats)
    mesh = make_mesh(4)
    opt = make_optimizer(cfg)
    step = make_train_step(C, cfg, opt, mesh=mesh, donate=False)

    imgs = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    boxes = np.zeros((4, 100, 5), np.float32)
    boxes[:, 0] = [4, 4, 20, 20, 0]
    batch = shard_batch({"image": jnp.asarray(imgs),
                         "raw_boxes": jnp.asarray(boxes)}, mesh)
    p, s, o, m = step(replicate(params, mesh), replicate(state, mesh),
                      replicate(opt.init(params), mesh), batch)
    assert np.isfinite(float(m["loss"]))

    # equals the host-encoded mesh step on the same data
    cfg_h = cfg.replace(encode_on_device=False)
    labels, xywh = preprocess_true_boxes(boxes, (32, 32), cfg.anchors_flat, C)
    host_batch = shard_batch({"image": jnp.asarray(imgs),
                              "labels": [jnp.asarray(l) for l in labels],
                              "boxes": jnp.asarray(xywh)}, mesh)
    step_h = make_train_step(C, cfg_h, opt, mesh=mesh, donate=False)
    p2, s2, o2, m2 = step_h(replicate(params, mesh), replicate(state, mesh),
                            replicate(opt.init(params), mesh), host_batch)
    assert float(m["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)


def test_dp_train_mode_gradient_equivalence(rng):
    """Train-mode (batch-stat BN) DP updates == single-device updates when
    every device holds the SAME 2-sample shard the single device runs: each
    replica's BN reduction is then bitwise the single device's (same data,
    same reduction size — a 4x-repeated global batch is NOT bitwise
    equivalent: different reduction sizes let f32 summation noise amplify
    chaotically through the conv stack), per-replica gradients coincide,
    and their mean must equal the single-device gradient.  Extends
    test_shard_map_train_step (1 sample) to multi-sample batch-stat
    gradients; pins UPDATES, not just the loss."""
    from yolov4tpu.parallel.mesh import replicate, shard_batch

    cfg = YoloConfig(img_size=(32, 32, 3), batch_size=2,
                     csp_repeats=(1, 1, 1, 1, 1))
    params, state, _ = network.init(C, img_size=32, seed=0,
                                    csp_repeats=cfg.csp_repeats)
    mesh = make_mesh(4)
    opt = make_optimizer(cfg)

    imgs = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    boxes = np.zeros((2, 100, 5), np.float32)
    boxes[0, 0] = [4, 4, 20, 20, 0]
    boxes[1, 0] = [8, 2, 28, 24, 1]
    labels, xywh = preprocess_true_boxes(boxes, (32, 32), cfg.anchors_flat, C)
    shard = {"image": jnp.asarray(imgs),
             "labels": [jnp.asarray(l) for l in labels],
             "boxes": jnp.asarray(xywh)}
    replicated_batch = jax.tree.map(lambda x: jnp.concatenate([x] * 4), shard)

    single = make_train_step(C, cfg, opt, donate=False)
    p1, s1, _, m1 = single(params, state, opt.init(params), shard)

    step = make_train_step(C, cfg, opt, mesh=mesh, donate=False)
    p4, s4, _, m4 = step(replicate(params, mesh), replicate(state, mesh),
                         replicate(opt.init(params), mesh),
                         shard_batch(replicated_batch, mesh))

    assert float(m1["loss"]) == pytest.approx(float(m4["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)


def test_twophase_heterogeneous_matches_fused(rng):
    """Fused vs two-phase mesh steps on a batch where every device holds a
    DIFFERENT sample (the replicated-sample case is covered by
    test_shard_map_train_step; heterogeneous shards are where a sum-vs-mean
    or stacking bug would actually show)."""
    from yolov4tpu.parallel.mesh import replicate, shard_batch
    from yolov4tpu.train import make_train_step_twophase

    cfg = YoloConfig(img_size=(32, 32, 3), batch_size=1,
                     csp_repeats=(1, 1, 1, 1, 1))
    params, state, _ = network.init(C, img_size=32, seed=0,
                                    csp_repeats=cfg.csp_repeats)
    mesh = make_mesh(4)
    opt = make_optimizer(cfg)

    imgs = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    boxes = np.zeros((4, 100, 5), np.float32)
    for i in range(4):
        boxes[i, 0] = [2 + i, 4, 18 + 2 * i, 20, i % 2]
    labels, xywh = preprocess_true_boxes(boxes, (32, 32), cfg.anchors_flat, C)
    batch = shard_batch({"image": jnp.asarray(imgs),
                         "labels": [jnp.asarray(l) for l in labels],
                         "boxes": jnp.asarray(xywh)}, mesh)

    fused = make_train_step(C, cfg, opt, mesh=mesh, donate=False)
    p_a, s_a, _, m_a = fused(replicate(params, mesh), replicate(state, mesh),
                             replicate(opt.init(params), mesh), batch)

    twophase = make_train_step_twophase(C, cfg, opt, mesh)
    p_b, s_b, _, m_b = twophase(replicate(params, mesh),
                                replicate(state, mesh),
                                replicate(opt.init(params), mesh), batch)

    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_a), jax.tree.leaves(s_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)


def test_cosine_annealing_schedule_values():
    """Schedule formula parity with reference custom_callbacks.py:13-15."""
    sched = cosine_annealing_schedule(1e-3, 1e-5, cycle_epochs=10,
                                      steps_per_epoch=5)
    assert float(sched(0)) == pytest.approx(1e-3)
    # epoch 5 of 10: cos(pi/2)=0 -> midpoint
    assert float(sched(25)) == pytest.approx((1e-3 + 1e-5) / 2, rel=1e-5)
    # restart at epoch 10
    assert float(sched(50)) == pytest.approx(1e-3)


def test_grad_accum_step(rng):
    """grad_accum_steps=2 runs, updates params, and yields gradients close
    to the single-batch step (identical up to BN batch-stat differences:
    accumulation computes per-micro-batch statistics)."""
    import dataclasses

    from yolov4tpu.train import chunk_batch

    cfg2 = dataclasses.replace(CFG, grad_accum_steps=2)
    params, state, _ = network.init(C, img_size=64, seed=0)
    batch = _synthetic_batch(np.random.default_rng(7), bs=4)

    opt = make_optimizer(cfg2)
    step2 = make_train_step(C, cfg2, opt, donate=False)
    p2, s2, o2, m2 = step2(params, state, opt.init(params),
                           chunk_batch(batch, 2))
    assert np.isfinite(float(m2["loss"]))

    step1 = make_train_step(C, CFG, opt, donate=False)
    p1, s1, o1, m1 = step1(params, state, opt.init(params), batch)
    # Same data, same params: accumulated loss (mean of 2 half-batches)
    # tracks the full-batch loss closely.
    assert abs(float(m2["loss"]) - float(m1["loss"])) / float(m1["loss"]) < 0.2
    # Params moved in both.
    d2 = float(jnp.abs(p2["convs"][0]["w"] - params["convs"][0]["w"]).max())
    assert d2 > 0


def test_grad_accum_chunk_validates():
    from yolov4tpu.train import chunk_batch
    import jax.numpy as jnp
    with pytest.raises(AssertionError, match="not divisible"):
        chunk_batch({"image": jnp.zeros((3, 2))}, 2)


def test_grad_accum_ragged_batch_pads_everywhere():
    """Ragged (epoch-final) batches at grad_accum: BOTH the single-device
    and the mesh path pad to a whole number of (per-device) micro-batches
    with a validity mask — nothing is dropped, even a 1-sample tail trains
    (round 3 dropped mesh tails; the masked mesh step now weights the
    gradient all-reduce by per-shard valid counts)."""
    import dataclasses

    from yolov4tpu.train import Trainer

    cfg = dataclasses.replace(CFG, grad_accum_steps=2)
    params, state, _ = network.init(C, img_size=64, seed=0)
    tr = Trainer(cfg, C, params, state)
    ragged = _synthetic_batch(np.random.default_rng(3), bs=3)  # 3 % 2 != 0
    m = tr.train_step(ragged)
    assert np.isfinite(float(m["loss"]))

    tiny = _synthetic_batch(np.random.default_rng(4), bs=1)
    m = tr.train_step(tiny)  # pads 1 -> 2; trains instead of skipping
    assert m is not None and np.isfinite(float(m["loss"]))
    assert tr.global_step == 2

    mesh = make_mesh(2)
    tr_mesh = Trainer(cfg, C, params, state, mesh=mesh)
    m = tr_mesh.train_step(tiny)  # pads 1 -> 4 (accum x devices); trains
    assert m is not None and np.isfinite(float(m["loss"]))
    assert tr_mesh.global_step == 1
    # The padded shards must not have corrupted the update: another step on
    # a full batch still yields finite loss.
    m = tr_mesh.train_step(_synthetic_batch(np.random.default_rng(5), bs=4))
    assert np.isfinite(float(m["loss"]))


def test_mesh_masked_step_weights_by_valid_count(rng):
    """Mesh pad-and-mask correctness against hand-computed semantics: a
    3-sample ragged batch on a 2-device mesh pads to 4 (shard0: 2 valid,
    shard1: 1 valid + 1 pad).  The masked mesh step's update must equal
    per-shard gradients (local masked BN) combined weighted by valid counts
    (2, 1) — the mean over every VALID sample — not the shard-uniform mean.
    BN moving statistics and metrics weight the same way."""
    from yolov4tpu.train import (Trainer, _make_grad_and_metrics,
                                 pad_mask_batch)
    import optax

    params, state, _ = network.init(C, img_size=64, seed=0)
    batch = _synthetic_batch(rng, bs=3)
    # Make the samples genuinely heterogeneous so a mis-weighted combine
    # cannot pass by symmetry.
    batch["image"] = batch["image"].at[2].multiply(0.3)

    # Hand-computed expectation: per-shard masked core + weighted combine.
    core = jax.jit(_make_grad_and_metrics(C, CFG))
    padded = pad_mask_batch(batch, 4)
    shard0 = jax.tree.map(lambda x: x[:2], padded)
    shard1 = jax.tree.map(lambda x: x[2:], padded)
    g0, st0, m0 = core(params, state, shard0)
    g1, st1, m1 = core(params, state, shard1)
    wavg = lambda a, b: (2.0 * a + 1.0 * b) / 3.0  # noqa: E731
    g = jax.tree.map(wavg, g0, g1)
    st_expect = jax.tree.map(wavg, st0, st1)
    loss_expect = wavg(m0["loss"], m1["loss"])
    # SGD, not Adam: Adam's g/(sqrt(g^2)+eps) is sign-like near zero, so
    # f32 reduction-order noise in tiny gradients would explode the param
    # comparison; SGD keeps the update LINEAR in the gradients, which is
    # exactly the quantity this test pins.
    opt = optax.sgd(0.1)
    updates, _ = opt.update(g, opt.init(params), params)
    p_expect = optax.apply_updates(params, updates)

    tr = Trainer(CFG, C, params, state, mesh=make_mesh(2), optimizer=opt)
    metrics = tr.train_step(batch)

    assert float(metrics["loss"]) == pytest.approx(float(loss_expect),
                                                   rel=1e-5)
    # Leaf-SCALE-relative comparison: random-init gradients reach ~1e6
    # through the 110-conv f32 backward, and individual elements where
    # 2*g0+g1 nearly cancels keep arbitrarily large PER-ELEMENT relative
    # reassociation noise between the shard_map collective and the
    # two-call manual path (a per-element rtol flakes on a different
    # element each run).  Normalizing by each leaf's magnitude bounds the
    # noise (measured ~1e-5 of leaf scale) while mis-WEIGHTING shifts
    # elements of full leaf magnitude by |g1-g0|/6 ~ 16% — the negative
    # control below proves the criterion rejects it.
    def leaf_close(got, want, tol):
        got, want = np.asarray(got), np.asarray(want)
        scale = max(float(np.abs(want).max()), 1e-3)
        return float(np.abs(got - want).max()) <= tol * scale

    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(p_expect)):
        assert leaf_close(a, b, 1e-3)
    for a, b in zip(jax.tree.leaves(tr.state), jax.tree.leaves(st_expect)):
        assert leaf_close(a, b, 1e-3)

    # Negative control: the UNIFORM shard mean (what a mis-weighted
    # all-reduce would produce) must NOT pass the same criterion.
    g_uni = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)
    updates_u, _ = opt.update(g_uni, opt.init(params), params)
    p_uniform = optax.apply_updates(params, updates_u)
    mismatch = any(
        not leaf_close(a, b, 1e-3)
        for a, b in zip(jax.tree.leaves(tr.params),
                        jax.tree.leaves(p_uniform)))
    assert mismatch, "test lost its discrimination power"


def test_uint8_batch_matches_float(rng):
    """A uint8 image batch (transfer_uint8 wire format) steps equivalently
    to the same values shipped as float32 — the core normalizes on-device,
    within compiled-program reassociation of the fused /255 (see body).
    Covers the train core and the validation step."""
    from yolov4tpu.train import _make_grad_and_metrics, make_eval_step

    params, state, _ = network.init(C, img_size=64, seed=0)
    batch = _synthetic_batch(rng, bs=2)
    u8 = np.clip(np.rint(np.array(batch["image"]) * 255), 0, 255
                 ).astype(np.uint8)
    bf = dict(batch, image=jnp.asarray(u8.astype(np.float32) / 255.0))
    bu = dict(batch, image=jnp.asarray(u8))

    core = jax.jit(_make_grad_and_metrics(C, CFG))
    gf, stf, mf = core(params, state, bf)
    gu, stu, mu = core(params, state, bu)
    # Mathematically identical inputs, but the u8 program fuses the /255
    # into the graph, so the two COMPILED programs reassociate (~3e-6 on
    # the loss) — and this untrained 20+-conv net amplifies 1e-6 input
    # noise >1000x in individual gradient elements (see
    # test_masked_step_matches_trimmed).  Loss/BN-state are tight; the
    # gradient is bounded globally, not elementwise.
    assert float(mf["loss"]) == pytest.approx(float(mu["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(stf), jax.tree.leaves(stu)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(b).max()), 1e-3)
        assert float(np.abs(a - b).max()) <= 1e-3 * scale
    flat_f = jnp.concatenate([x.ravel() for x in jax.tree.leaves(gf)])
    flat_u = jnp.concatenate([x.ravel() for x in jax.tree.leaves(gu)])
    rel = float(jnp.linalg.norm(flat_f - flat_u) / jnp.linalg.norm(flat_f))
    assert rel < 0.20, rel

    ev = make_eval_step(C, CFG)
    assert float(ev(params, state, bf)) == pytest.approx(
        float(ev(params, state, bu)), rel=1e-4)


def test_mesh_accum_masked_weights_local_counts(rng):
    """Mesh + grad-accum + ragged tail: BN state and metrics must weight by
    LOCAL per-shard valid counts, gradients by GLOBAL micro-round counts.

    bs=5 on a 2-device mesh at accum=2 pads to 8 and lands as
      shard0: micro0=[s0,s1]  micro1=[s4,pad]
      shard1: micro0=[s2,s3]  micro1=[pad,pad]   <- all-padding micro
    The all-padding micro's GLOBAL count is 1 (s4 lives on shard0), so a
    global-count guard would keep shard1's throwaway BN stats (mean-0/
    unit-var fallback) in its moving-average chain, and global-count metric
    weighting would skew the loss toward globally fuller micro-rounds.
    Expected semantics, hand-computed from the single-device masked core
    with per-shard state threading:
      grads   = (2 g00 + 2 g10 + 1 g01) / 5          (per-sample mean)
      state   = (3 st01 + 2 st10) / 5                (st10, NOT st11)
      metrics = (2 m00 + 2 m10 + 1 m01) / 5
    """
    import dataclasses

    import optax

    from yolov4tpu.train import (Trainer, _make_grad_and_metrics,
                                 chunk_batch, pad_mask_batch)

    cfg = dataclasses.replace(CFG, grad_accum_steps=2)
    params, state, _ = network.init(C, img_size=64, seed=0)
    batch = _synthetic_batch(rng, bs=5)
    # Heterogeneous samples so mis-weighted combines cannot pass by
    # symmetry.
    img = np.array(batch["image"])
    for i in range(5):
        img[i] *= 0.3 + 0.2 * i
    batch["image"] = jnp.asarray(img)

    core = jax.jit(_make_grad_and_metrics(C, cfg))
    padded = pad_mask_batch(batch, 8)
    micros = chunk_batch(padded, 2)  # (2, 4, ...)
    piece = lambda mu, lo, hi: jax.tree.map(  # noqa: E731
        lambda x: x[mu, lo:hi], micros)
    g00, st00, m00 = core(params, state, piece(0, 0, 2))
    g10, st10, m10 = core(params, state, piece(0, 2, 4))
    g01, st01, m01 = core(params, st00, piece(1, 0, 2))
    g11, st11, m11 = core(params, st10, piece(1, 2, 4))  # all-pad piece

    wavg = lambda a, b, c: (2.0 * a + 2.0 * b + 1.0 * c) / 5.0  # noqa: E731
    g_expect = jax.tree.map(wavg, g00, g10, g01)
    st_expect = jax.tree.map(lambda a, b: (3.0 * a + 2.0 * b) / 5.0,
                             st01, st10)
    loss_expect = wavg(m00["loss"], m10["loss"], m01["loss"])

    opt = optax.sgd(0.1)  # linear in grads — see the non-accum mesh test
    updates, _ = opt.update(g_expect, opt.init(params), params)
    p_expect = optax.apply_updates(params, updates)

    tr = Trainer(cfg, C, params, state, mesh=make_mesh(2), optimizer=opt)
    metrics = tr.train_step(batch)

    assert float(metrics["loss"]) == pytest.approx(float(loss_expect),
                                                   rel=1e-5)

    def leaf_close(got, want, tol):
        got, want = np.asarray(got), np.asarray(want)
        scale = max(float(np.abs(want).max()), 1e-3)
        return float(np.abs(got - want).max()) <= tol * scale

    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(p_expect)):
        assert leaf_close(a, b, 1e-3)
    for a, b in zip(jax.tree.leaves(tr.state), jax.tree.leaves(st_expect)):
        assert leaf_close(a, b, 1e-3)

    # Discrimination guards: the pre-fix (global-count) semantics must be
    # rejected by the same criteria.
    loss_buggy = (3.0 / 5.0) * (4 * m00["loss"] + m01["loss"]) / 5.0 \
        + (2.0 / 5.0) * (4 * m10["loss"] + m11["loss"]) / 5.0
    assert abs(float(loss_expect) - float(loss_buggy)) \
        > 1e-4 * abs(float(loss_expect)), "loss check lost discrimination"
    st_buggy = jax.tree.map(lambda a, b: (3.0 * a + 2.0 * b) / 5.0,
                            st01, st11)
    mismatch = any(
        not leaf_close(a, b, 1e-3)
        for a, b in zip(jax.tree.leaves(st_expect),
                        jax.tree.leaves(st_buggy)))
    assert mismatch, "state check lost discrimination power"


def test_fit_zero_step_epoch_raises():
    """An epoch that runs ZERO optimizer steps must raise, not record loss
    0.0 and checkpoint an untrained model.  Since round 4 every ragged tail
    trains via pad-and-mask on every path (mesh included), the only way to
    run zero steps is an EMPTY generator."""
    from yolov4tpu.train import Trainer

    params, state, _ = network.init(C, img_size=64, seed=0)
    tr = Trainer(CFG, C, params, state)

    class EmptyGen:
        def __len__(self):
            return 0

        def get_batch(self, i):  # pragma: no cover — never called
            raise AssertionError("empty generator must not be asked")

        def on_epoch_end(self):
            pass

    with pytest.raises(ValueError, match="zero optimizer steps"):
        tr.fit(EmptyGen(), epochs=1, verbose=False)
    assert tr.history == []  # nothing recorded for the failed epoch


def test_init_distributed_single_process_smoke():
    """Multi-host entry point: on a single plain host the no-arg call runs
    JAX's managed-cluster auto-detection, which finds nothing and falls
    back to reporting the local topology (no coordinator is started)."""
    from yolov4tpu.parallel.mesh import init_distributed

    info = init_distributed()
    assert info["process_id"] == 0
    assert info["num_processes"] == 1
    assert info["global_devices"] == jax.device_count()
    assert info["local_devices"] == jax.local_device_count()
    # idempotent
    assert init_distributed() == info


@pytest.mark.slow
def test_two_process_distributed_step(tmp_path):
    """REAL multi-process training: two OS processes, one CPU device each,
    joined by init_distributed into a global 2-device mesh, run one fused
    mesh train step with collectives over the actual jax.distributed wire
    (gloo) — not the fake-8-device single-process rig.  Both processes must
    produce the identical replicated loss and updated params, and the loss
    must match the same step run single-process on a local 2-device mesh."""
    import socket
    import subprocess
    import sys as _sys

    import yolov4tpu

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__),
                          "_distributed_worker.py")
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   yolov4tpu.__file__)))
    procs = [subprocess.Popen(
        [_sys.executable, worker, str(pid), "2", f"localhost:{port}"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    results = {}
    for out in outs:
        line = next(l for l in out.splitlines() if l.startswith("LOSS "))
        _, pid, loss, psum = line.split()
        results[int(pid)] = (float(loss), float(psum))
    assert set(results) == {0, 1}
    # identical replicated outputs on both processes
    assert results[0] == results[1]

    # single-process ground truth: same batch, same 2-way sharding
    from yolov4tpu.train import make_optimizer, make_train_step

    cfg = YoloConfig(img_size=(64, 64, 3), batch_size=4,
                     csp_repeats=(1, 1, 1, 1, 1))
    params, state, _ = network.init(C, img_size=64, seed=0,
                                    csp_repeats=cfg.csp_repeats)
    rng42 = np.random.default_rng(42)
    imgs = rng42.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    boxes = np.zeros((4, 100, 5), np.float32)
    boxes[:, 0] = [8, 8, 40, 40, 0]
    boxes[:, 1] = [30, 20, 60, 60, 1]
    labels, xywh = preprocess_true_boxes(boxes, (64, 64),
                                         cfg.anchors_flat, C)
    batch = {"image": jnp.asarray(imgs),
             "labels": [jnp.asarray(l) for l in labels],
             "boxes": jnp.asarray(xywh)}
    opt = make_optimizer(cfg)
    step = make_train_step(C, cfg, opt, mesh=make_mesh(2), donate=False)
    _, _, _, m = step(params, state, opt.init(params), batch)
    assert results[0][0] == pytest.approx(float(m["loss"]), rel=1e-5)


def test_init_distributed_refuses_fallback_when_multihost_hinted(monkeypatch):
    """Auto-detect failure + multi-host env hints must RAISE, not silently
    fall back to single-process (each process would train alone: no grad
    sync, clashing checkpoints — advisor finding r2)."""
    from yolov4tpu.parallel import mesh

    monkeypatch.setattr(mesh, "_DISTRIBUTED_INITIALIZED", False)
    monkeypatch.setenv("SLURM_NTASKS", "4")

    def boom(*a, **k):
        raise ValueError("coordinator metadata unavailable")

    monkeypatch.setattr(mesh.jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="looks multi-host.*SLURM_NTASKS"):
        mesh.init_distributed()

    # Same failure WITHOUT hints: warn loudly, then single-process fallback.
    monkeypatch.delenv("SLURM_NTASKS")
    monkeypatch.setattr(mesh, "_DISTRIBUTED_INITIALIZED", False)
    with pytest.warns(UserWarning, match="coordinator metadata unavailable"):
        info = mesh.init_distributed()
    assert info["num_processes"] == 1
    # SLURM_NTASKS=1 (single-task slurm job) is NOT a multi-host hint
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert mesh._multi_host_hints() == []


def test_encode_on_device_step_matches_host(rng):
    """config.encode_on_device: the train step fed raw (B,max_boxes,5) boxes
    encodes labels inside the jit and produces the SAME loss and parameter
    update as the host-encoded pipeline (boxes chosen collision-free, where
    the two encoders are exact twins)."""
    import dataclasses

    cfg_dev = dataclasses.replace(CFG, encode_on_device=True)
    params, state, _ = network.init(C, img_size=64, seed=0)
    opt = make_optimizer(CFG)

    bs = 2
    imgs = rng.uniform(0, 1, (bs, 64, 64, 3)).astype(np.float32)
    boxes = np.zeros((bs, 100, 5), np.float32)
    boxes[:, 0] = [8, 8, 40, 40, 0]
    boxes[:, 1] = [30, 20, 60, 60, 1]
    labels, xywh = preprocess_true_boxes(boxes, (64, 64), CFG.anchors_flat, C)
    host_batch = {"image": jnp.asarray(imgs),
                  "labels": [jnp.asarray(l) for l in labels],
                  "boxes": jnp.asarray(xywh)}
    raw_batch = {"image": jnp.asarray(imgs), "raw_boxes": jnp.asarray(boxes)}

    p_host, _, _, m_host = make_train_step(C, CFG, opt, donate=False)(
        params, state, opt.init(params), host_batch)
    p_dev, _, _, m_dev = make_train_step(C, cfg_dev, opt, donate=False)(
        params, state, opt.init(params), raw_batch)

    assert float(m_host["loss"]) == pytest.approx(float(m_dev["loss"]),
                                                  rel=1e-6)
    for a, b in zip(jax.tree.leaves(p_host), jax.tree.leaves(p_dev)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_encode_on_device_multiscale_matches_host_per_size(rng):
    """Multi-scale + encode_on_device (the combination round 3 forbade):
    the SAME jitted step object, fed raw-boxes batches at two different
    square sizes, retraces per size and matches the host-encoded step's
    loss and parameter update at each size."""
    import dataclasses

    cfg_dev = dataclasses.replace(CFG, encode_on_device=True,
                                  multi_scale=(64, 96))
    params, state, _ = network.init(C, img_size=64, seed=0)
    opt = make_optimizer(CFG)
    step_dev = make_train_step(C, cfg_dev, opt, donate=False)
    step_host = make_train_step(C, CFG, opt, donate=False)

    for size in (64, 96):
        imgs = rng.uniform(0, 1, (2, size, size, 3)).astype(np.float32)
        boxes = np.zeros((2, 100, 5), np.float32)
        boxes[:, 0] = [8, 8, size - 24, size - 24, 0]
        boxes[:, 1] = [size // 2, 20, size - 4, size - 4, 1]
        labels, xywh = preprocess_true_boxes(boxes, (size, size),
                                             CFG.anchors_flat, C)
        host_batch = {"image": jnp.asarray(imgs),
                      "labels": [jnp.asarray(l) for l in labels],
                      "boxes": jnp.asarray(xywh)}
        raw_batch = {"image": jnp.asarray(imgs),
                     "raw_boxes": jnp.asarray(boxes)}
        p_host, _, _, m_host = step_host(params, state, opt.init(params),
                                         host_batch)
        p_dev, _, _, m_dev = step_dev(params, state, opt.init(params),
                                      raw_batch)
        assert float(m_host["loss"]) == pytest.approx(float(m_dev["loss"]),
                                                      rel=1e-6)
        for a, b in zip(jax.tree.leaves(p_host), jax.tree.leaves(p_dev)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_cosine_callback_drives_optimizer():
    """The callback-style LR scheduler ACTUALLY changes the LR the optimizer
    applies (regression: round-1 version only recorded it).  Epoch e trains
    at cb.lr(e), keras on_epoch_begin semantics."""
    from yolov4tpu.callbacks import CosineAnnealingScheduler
    from yolov4tpu.train import Trainer

    params, state, _ = network.init(C, img_size=64, seed=0)
    tr = Trainer(CFG, C, params, state)
    batch = _synthetic_batch(np.random.default_rng(0), bs=2)

    class OneBatchGen:
        def __len__(self):
            return 1

        def get_batch(self, i):
            return batch

        def on_epoch_end(self):
            pass

    cb = CosineAnnealingScheduler(lr_max=1e-3, lr_min=1e-5, cycle_epochs=4)
    seen = []

    def probe(trainer, entry):  # epoch-end, runs before cb primes epoch+1
        seen.append(trainer.learning_rate)

    tr.fit(OneBatchGen(), epochs=3, callbacks=[probe, cb], verbose=False)
    expect = [cb.lr(e) for e in range(3)]
    assert seen == pytest.approx(expect)
    assert cb.history == pytest.approx(expect)
    assert len({round(v, 9) for v in seen}) == 3  # it really changed

    # And the mutated LR is what the jitted step applies: at lr=0, Adam
    # must leave parameters bit-identical.
    tr.set_learning_rate(0.0)
    before = np.asarray(jax.tree.leaves(tr.params)[0]).copy()
    tr.train_step(batch)
    np.testing.assert_array_equal(before,
                                  np.asarray(jax.tree.leaves(tr.params)[0]))


def test_cosine_callback_rejects_scheduled_optimizer():
    """Installing the LR callback on a Trainer whose optimizer already owns a
    baked-in optax schedule raises instead of silently fighting it."""
    from yolov4tpu.callbacks import CosineAnnealingScheduler
    from yolov4tpu.train import Trainer, cosine_annealing_schedule

    sched = cosine_annealing_schedule(1e-3, 1e-5, cycle_epochs=4,
                                      steps_per_epoch=1)
    params, state, _ = network.init(C, img_size=64, seed=0)
    tr = Trainer(CFG, C, params, state, schedule=sched)
    cb = CosineAnnealingScheduler(lr_max=1e-3, lr_min=1e-5, cycle_epochs=4)
    with pytest.raises(RuntimeError, match="mutable"):
        cb.on_epoch_begin(tr, 0)


def test_restore_checkpoint_migrates_old_optimizer_format(tmp_path):
    """A checkpoint whose optimizer-state leaf structure predates the
    current optimizer (e.g. plain Adam vs inject_hyperparams) restores
    params/step/epoch and reinitializes the moments instead of crashing —
    fit(resume_dir=...) must survive format upgrades."""
    from yolov4tpu.train import Trainer, cosine_annealing_schedule

    params, state, _ = network.init(C, img_size=64, seed=0)
    # schedule => plain optax.adam opt-state layout (the round-1 format)
    old = Trainer(CFG, C, params, state,
                  schedule=cosine_annealing_schedule(1e-3, 1e-5, 4, 1))
    old.global_step = 7
    path = str(tmp_path / "old.npz")
    old.save_checkpoint(path, epoch=3)

    new = Trainer(CFG, C, params, state)  # inject_hyperparams layout
    next_epoch = new.restore_checkpoint(path)
    assert next_epoch == 4 and new.global_step == 7
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(new.params)[0]),
        np.asarray(jax.tree.leaves(old.params)[0]))
    # reinitialized optimizer state still drives a working step
    assert new.learning_rate == pytest.approx(CFG.learning_rate)


def test_restore_checkpoint_rejects_same_count_different_layout(tmp_path):
    """The migration gate is shape/dtype-checked, not leaf-count-only: a
    checkpoint with coincidentally the same number of opt leaves but a
    different layout must reinitialize the moments, not silently unflatten
    them into the wrong slots (advisor finding r2)."""
    from yolov4tpu.train import Trainer

    params, state, _ = network.init(C, img_size=64, seed=0)
    tr = Trainer(CFG, C, params, state)
    leaves, treedef = jax.tree.flatten(tr.opt_state)
    i = next(j for j, l in enumerate(leaves) if np.ndim(l) >= 2)
    orig_shape = np.shape(leaves[i])
    leaves[i] = jnp.ravel(leaves[i])  # same leaf count, different shape
    tr.opt_state = jax.tree.unflatten(treedef, leaves)
    path = str(tmp_path / "tampered.npz")
    tr.save_checkpoint(path, epoch=1)

    new = Trainer(CFG, C, params, state)
    assert new.restore_checkpoint(path) == 2
    restored = jax.tree.leaves(new.opt_state)[i]
    assert np.shape(restored) == orig_shape  # fresh moments, not the ravel


def test_cosine_callback_hand_rolled_loop():
    """Invoking the scheduler only as an epoch-end callable (no
    on_epoch_begin) still drives the LR and records history."""
    from yolov4tpu.callbacks import CosineAnnealingScheduler
    from yolov4tpu.train import Trainer

    params, state, _ = network.init(C, img_size=64, seed=0)
    tr = Trainer(CFG, C, params, state)
    cb = CosineAnnealingScheduler(1e-3, 1e-5, cycle_epochs=4)
    cb(tr, {"epoch": 0})
    assert tr.learning_rate == pytest.approx(cb.lr(1))
    assert cb.history == pytest.approx([cb.lr(1)])


def test_grad_accum_misconfig_raises():
    """accum that can't divide even a FULL batch is a misconfiguration and
    still raises (distinct from the ragged-tail drop contract)."""
    import dataclasses

    from yolov4tpu.train import Trainer

    cfg = dataclasses.replace(CFG, grad_accum_steps=16)  # > batch_size=2
    params, state, _ = network.init(C, img_size=64, seed=0)
    tr = Trainer(cfg, C, params, state)
    batch = _synthetic_batch(np.random.default_rng(4), bs=2)
    with pytest.raises(ValueError, match="grad_accum_steps"):
        tr.train_step(batch)


def test_twophase_rejects_grad_accum():
    import dataclasses

    from yolov4tpu.train import make_train_step_twophase

    cfg = dataclasses.replace(CFG, grad_accum_steps=2)
    opt = make_optimizer(cfg)
    with pytest.raises(ValueError, match="twophase"):
        make_train_step_twophase(C, cfg, opt, make_mesh(2))


def test_fused_adam_matches_optax(rng):
    """fused_adam (flat-vector moments) is numerically identical to
    optax.adam over a multi-step trajectory, including with a schedule."""
    import optax

    from yolov4tpu.train import fused_adam

    params = {"w": jnp.asarray(rng.normal(0, 1, (67, 9)), jnp.float32),
              "nest": [jnp.asarray(rng.normal(0, 1, (3,)), jnp.float32),
                       {"g": jnp.asarray(rng.normal(0, 1, (4, 2, 5)),
                                         jnp.float32)}]}
    sched = lambda step: 1e-3 / (1.0 + 0.1 * step)  # noqa: E731

    for lr in (1e-3, sched):
        ref_opt, new_opt = optax.adam(lr), fused_adam(lr)
        p_ref = p_new = params
        s_ref, s_new = ref_opt.init(params), new_opt.init(params)
        for i in range(5):
            g = jax.tree.map(
                lambda x: jnp.asarray(
                    np.random.default_rng(i).normal(0, 0.1, x.shape),
                    jnp.float32), params)
            u_ref, s_ref = ref_opt.update(g, s_ref, p_ref)
            p_ref = optax.apply_updates(p_ref, u_ref)
            u_new, s_new = new_opt.update(g, s_new, p_new)
            p_new = optax.apply_updates(p_new, u_new)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_new)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


def test_trainer_fit_smoke(tmp_path, rng, setup):
    """Trainer.fit over a real DataGenerator directory (2 imgs, 1 epoch)."""
    import cv2
    from yolov4tpu.data.pipeline import DataGenerator

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    lines = []
    for i in range(2):
        img = (rng.uniform(0, 255, (80, 90, 3))).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        lines.append(f"im{i}.jpg 10,10,50,60,0 20,30,70,70,1\n")
    classes = tmp_path / "classes.txt"
    classes.write_text("a\nb\n")

    gen = DataGenerator(lines, str(classes), str(img_dir), config=CFG, seed=0)
    params, state, _ = network.init(C, img_size=64, seed=1)
    trainer = Trainer(CFG, C, params, state)
    history = trainer.fit(gen, epochs=1, verbose=False)
    assert len(history) == 1
    assert np.isfinite(history[0]["loss"])
    # fit with val generator must not crash (reference bug, models.py:104)
    history = trainer.fit(gen, epochs=2, initial_epoch=1, val_gen=gen,
                          verbose=False)
    assert "val_loss" in history[-1]


def test_trainer_fit_uint8_wire(tmp_path, rng):
    """Trainer.fit over a uint8-wire DataGenerator: prefetch placement,
    RAGGED-tail pad-and-mask (3 imgs at batch 2) and validation all run on
    uint8 batches, normalized inside the jitted programs."""
    import dataclasses

    import cv2
    from yolov4tpu.data.pipeline import DataGenerator

    cfg8 = dataclasses.replace(CFG, transfer_uint8=True)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    lines = []
    for i in range(3):  # 3 % batch_size(2) != 0 -> ragged u8 tail
        img = (rng.uniform(0, 255, (80, 90, 3))).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        lines.append(f"im{i}.jpg 10,10,50,60,0 20,30,70,70,1\n")
    classes = tmp_path / "classes.txt"
    classes.write_text("a\nb\n")

    gen = DataGenerator(lines, str(classes), str(img_dir), config=cfg8,
                        seed=0, shuffle=False)
    assert gen.get_batch(0)["image"].dtype == np.uint8
    params, state, _ = network.init(C, img_size=64, seed=1)
    trainer = Trainer(cfg8, C, params, state)
    history = trainer.fit(gen, epochs=1, val_gen=gen, verbose=False)
    assert np.isfinite(history[0]["loss"])
    assert np.isfinite(history[0]["val_loss"])


def test_trainer_checkpoint_resume(tmp_path, setup):
    """save_checkpoint/restore_checkpoint round-trips params, BN state and
    optimizer state; fit(resume_dir=...) auto-resumes at the next epoch."""
    params, state, batch = setup
    t1 = Trainer(CFG, C, params, state)
    t1.train_step(batch)
    t1.train_step(batch)
    p = str(tmp_path / "ck.npz")
    t1.save_checkpoint(p, epoch=4)

    t2 = Trainer(CFG, C, params, state)
    next_epoch = t2.restore_checkpoint(p)
    assert next_epoch == 5
    assert t2.global_step == 2
    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(t1.opt_state),
                    jax.tree.leaves(t2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # continued steps from both produce identical params
    m1 = t1.train_step(batch)
    m2 = t2.train_step(batch)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)


# -- pad-and-mask ragged batches (round-3, VERDICT #3) -----------------------

def _tiny_cfg(**kw):
    return YoloConfig(img_size=(64, 64, 3), batch_size=2,
                      csp_repeats=(1, 1, 1, 1, 1), **kw)


def _tiny_batch(rng, bs, cfg):
    imgs = rng.uniform(0, 1, (bs, 64, 64, 3)).astype(np.float32)
    boxes = np.zeros((bs, 100, 5), np.float32)
    boxes[:, 0] = [8, 8, 40, 40, 0]
    boxes[:, 1] = [30, 20, 60, 60, 1]
    labels, xywh = preprocess_true_boxes(boxes, (64, 64), cfg.anchors_flat, C)
    return {"image": jnp.asarray(imgs),
            "labels": [jnp.asarray(l) for l in labels],
            "boxes": jnp.asarray(xywh)}


def test_masked_step_matches_trimmed(rng):
    """A batch padded to an aligned size with a validity mask computes the
    SAME step as its trimmed (unpadded) self.

    What can be asserted exactly vs loosely is dictated by f32:
    - NO LEAKAGE, bit-exact: two padded batches differing ONLY in the pad
      rows' contents (different poisons) must produce IDENTICAL grads, BN
      state and metrics — any influence of pad values would differ.
    - Loss vs trimmed: tight (the masked means are the trimmed means up to
      one reduction reassociation).
    - Grads/BN state vs trimmed: loose.  The B=4 and B=3 reductions
      associate differently; a measured 1e-6 image perturbation already
      changes some gradient elements of this untrained 20+-conv net by
      >1000x (chaotic amplification), so elementwise equality between the
      two batch shapes is not a property f32 has.  Global grad L2 measured
      ~8%; asserted <20%."""
    from yolov4tpu.train import _make_grad_and_metrics, pad_mask_batch

    cfg = _tiny_cfg()
    params, state, _ = network.init(C, img_size=64, seed=0,
                                    csp_repeats=cfg.csp_repeats)
    params, state = jax.device_put((params, state))
    core = jax.jit(_make_grad_and_metrics(C, cfg))

    trimmed = _tiny_batch(rng, 3, cfg)
    padded = pad_mask_batch(trimmed, 4)
    img = np.array(padded["image"])  # writable copy
    img[3] = 7.5                     # poison A
    padded["image"] = jnp.asarray(img)
    img2 = img.copy()
    img2[3] = -123.0                 # poison B
    padded2 = dict(padded, image=jnp.asarray(img2))

    g_t, st_t, m_t = core(params, state, trimmed)
    g_p, st_p, m_p = core(params, state, padded)
    g_q, st_q, m_q = core(params, state, padded2)

    # 1. leakage check: poison-invariant, bit-exact
    for a, b in zip(jax.tree.leaves((g_p, st_p, m_p)),
                    jax.tree.leaves((g_q, st_q, m_q))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # 2. loss matches the trimmed batch tightly
    assert float(m_p["loss"]) == pytest.approx(float(m_t["loss"]), rel=1e-4)

    # 3. first conv's BN batch stats see only the input image — tight
    np.testing.assert_allclose(np.asarray(st_p["bn"][0]["mean"]),
                               np.asarray(st_t["bn"][0]["mean"]),
                               rtol=1e-5, atol=1e-7)

    # 4. whole-gradient direction: chaos-bounded, not elementwise
    flat_t = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_t)])
    flat_p = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_p)])
    rel = float(jnp.linalg.norm(flat_t - flat_p)
                / jnp.linalg.norm(flat_t))
    assert rel < 0.20, rel


def test_mesh_eval_ragged_matches_trimmed(rng):
    """A ragged validation batch (b=3 on a 2-device mesh) evaluates via
    pad-and-mask to exactly the trimmed batch's loss — instead of raising
    a GSPMD placement error (VERDICT r04 weak#3).  Single-device
    non-aligned eval (b=3 -> pad 4 + mask) pins the same semantics.
    Shallow depth: pad-and-mask numerics are depth-independent."""
    cfg = _tiny_cfg()
    params, state, _ = network.init(C, img_size=64, seed=0,
                                    csp_repeats=cfg.csp_repeats)
    batch = _synthetic_batch(rng, bs=3)
    batch["image"] = batch["image"].at[2].multiply(0.3)  # heterogeneous

    # Ground truth: plain single-device eval on the trimmed batch.
    tr_single = Trainer(cfg, C, params, state)
    loss_trimmed = float(tr_single.eval_step(batch))

    # Mesh path: b=3 on 2 devices pads to 4 with a mask.
    tr_mesh = Trainer(cfg, C, params, state, mesh=make_mesh(2))
    loss_mesh = float(tr_mesh.eval_step(batch))
    assert loss_mesh == pytest.approx(loss_trimmed, rel=1e-4)

    # Negative control: evaluating the zero-padded batch WITHOUT masking
    # (what the old path would compute if it padded blindly) differs.
    from yolov4tpu.train import pad_mask_batch
    padded = {k: v for k, v in pad_mask_batch(batch, 4).items()
              if k != "mask"}
    loss_unmasked = float(tr_single._eval(tr_single.params, tr_single.state,
                                          jax.device_put(padded)))
    assert abs(loss_unmasked - loss_trimmed) > 1e-3 * abs(loss_trimmed), \
        "test lost its discrimination power"


def test_single_device_eval_nonaligned_pads_and_masks(rng):
    """eval_step on a single device pads an XLA-non-aligned batch
    (b=34 -> 64: the smallest batch that is non-aligned, since any
    b<=32 is aligned) with a validity mask; the loss equals the mean
    over the 34 real samples (poisoned pad rows don't leak).  Runs at
    32px — the masked-eval numerics are resolution-independent."""
    from yolov4tpu.train import aligned_size, pad_mask_batch

    assert aligned_size(34) == 64 and aligned_size(33) == 64
    cfg = YoloConfig(img_size=(32, 32, 3), batch_size=2,
                     csp_repeats=(1, 1, 1, 1, 1))
    params, state, _ = network.init(C, img_size=32, seed=0,
                                    csp_repeats=cfg.csp_repeats)
    imgs = rng.uniform(0, 1, (34, 32, 32, 3)).astype(np.float32)
    boxes = np.zeros((34, 100, 5), np.float32)
    boxes[:, 0] = [4, 4, 20, 20, 0]
    boxes[:, 1] = [15, 10, 30, 30, 1]
    labels, xywh = preprocess_true_boxes(boxes, (32, 32), cfg.anchors_flat, C)
    batch = {"image": jnp.asarray(imgs),
             "labels": [jnp.asarray(l) for l in labels],
             "boxes": jnp.asarray(xywh)}
    tr = Trainer(cfg, C, params, state)
    loss34 = float(tr.eval_step(batch))
    assert tr._eval_masked is not None  # the masked path actually ran
    assert np.isfinite(loss34)
    # Same padded batch with poisoned pad rows: identical loss (no leakage).
    poisoned = pad_mask_batch(batch, 64)
    img = np.array(poisoned["image"])
    img[34:] = 9.5
    poisoned["image"] = jnp.asarray(img)
    loss_poisoned = float(tr._eval_masked(tr.params, tr.state,
                                          jax.device_put(poisoned)))
    assert loss34 == pytest.approx(loss_poisoned, rel=1e-6)


def test_chunked_step_nonaligned_batch(rng):
    """A non-aligned batch (34 = 32 + 2) routes through aligned chunks with
    valid-count-weighted combination; metrics equal the hand-computed
    weighted average of the per-chunk cores and params get one update."""
    from yolov4tpu.train import _make_grad_and_metrics, decompose_batch

    cfg = _tiny_cfg()
    params, state, _ = network.init(C, img_size=64, seed=0,
                                    csp_repeats=cfg.csp_repeats)
    tr = Trainer(cfg, C, params, state)
    batch = _tiny_batch(rng, 34, cfg)
    assert decompose_batch(34) == [(32, 32), (2, 2)]

    core = jax.jit(_make_grad_and_metrics(C, cfg))
    p0, s0 = tr.params, tr.state
    _, _, m1 = core(p0, s0, jax.tree.map(lambda x: x[:32], batch))
    _, _, m2 = core(p0, s0, jax.tree.map(lambda x: x[32:], batch))
    want = (32 * float(m1["loss"]) + 2 * float(m2["loss"])) / 34
    # snapshot before the step: the chunked combine DONATES tr.params
    w0 = np.array(jax.tree.leaves(p0)[0])

    metrics = tr.train_step(batch)
    assert metrics is not None
    assert float(metrics["loss"]) == pytest.approx(want, rel=2e-5)
    assert tr.global_step == 1
    moved = float(jnp.abs(jnp.asarray(jax.tree.leaves(tr.params)[0])
                          - w0).max())
    assert np.isfinite(float(metrics["loss"])) and moved > 0


def test_accum_padded_tail_trains_instead_of_dropping(rng):
    """grad_accum ragged tail: previously trimmed/dropped, now padded with a
    mask and weighted by valid counts — a 3-sample tail at accum=2 returns
    real metrics, and an all-padding micro-batch (2 valid at accum=4 ->
    chunks [2, 0, 0, 0]... here [2,1] and [1,0]) leaves everything finite."""
    import dataclasses

    cfg = dataclasses.replace(_tiny_cfg(), grad_accum_steps=2)
    params, state, _ = network.init(C, img_size=64, seed=0,
                                    csp_repeats=cfg.csp_repeats)
    tr = Trainer(cfg, C, params, state)
    m = tr.train_step(_tiny_batch(rng, 3, cfg))  # pad 3 -> 4, chunks 2+2
    assert m is not None and np.isfinite(float(m["loss"]))

    # batch_size=4 keeps the nominal batch splittable (the misconfig guard
    # judges batch_size x devices, not the ragged tail fed here)
    cfg4 = dataclasses.replace(_tiny_cfg(), grad_accum_steps=4, batch_size=4)
    tr4 = Trainer(cfg4, C, params, state)
    m4 = tr4.train_step(_tiny_batch(rng, 2, cfg4))  # pad 2 -> 4: micro-
    # batches of size 1: [s0],[s1],[pad],[pad] — two all-padding chunks
    assert m4 is not None and np.isfinite(float(m4["loss"]))
    for leaf in jax.tree.leaves((tr4.params, tr4.state, tr4.opt_state)):
        assert np.isfinite(np.asarray(leaf)).all()


def test_mesh_step_uint8_matches_float(rng):
    """The uint8 wire composes with mesh data parallelism: a shard_map
    train step on a uint8 batch matches the float32 batch of the same
    raster values (the per-replica core normalizes on-device, so the wire
    format never touches the collective math)."""
    import optax

    params, state, _ = network.init(C, img_size=64, seed=0)
    batch = _synthetic_batch(rng, bs=4)
    u8 = np.clip(np.rint(np.array(batch["image"]) * 255), 0, 255
                 ).astype(np.uint8)
    bf = dict(batch, image=jnp.asarray(u8.astype(np.float32) / 255.0))
    bu = dict(batch, image=jnp.asarray(u8))

    # SGD keeps the update linear in the gradients (see
    # test_mesh_masked_step_weights_by_valid_count).
    tf_ = Trainer(CFG, C, params, state, mesh=make_mesh(2),
                  optimizer=optax.sgd(0.1))
    tu = Trainer(CFG, C, params, state, mesh=make_mesh(2),
                 optimizer=optax.sgd(0.1))
    mf = tf_.train_step(bf)
    mu = tu.train_step(bu)
    # Same tolerance story as test_uint8_batch_matches_float: identical
    # values, but the u8 program fuses the /255, so the two COMPILED
    # programs reassociate (~e-6) — and this untrained net amplifies that
    # >1000x in individual gradient elements.  Loss and BN state (forward
    # quantities) are tight; the parameter UPDATE (0.1x the gradient under
    # SGD) is bounded globally, not elementwise.
    assert float(mf["loss"]) == pytest.approx(float(mu["loss"]), rel=1e-4)

    def leaf_close(got, want, tol):
        got, want = np.asarray(got), np.asarray(want)
        scale = max(float(np.abs(want).max()), 1e-3)
        return float(np.abs(got - want).max()) <= tol * scale

    for a, b in zip(jax.tree.leaves(tf_.state), jax.tree.leaves(tu.state)):
        assert leaf_close(a, b, 1e-3)
    df = jnp.concatenate([
        (a - b).ravel() for a, b in zip(jax.tree.leaves(tf_.params),
                                        jax.tree.leaves(params))])
    du = jnp.concatenate([
        (a - b).ravel() for a, b in zip(jax.tree.leaves(tu.params),
                                        jax.tree.leaves(params))])
    rel = float(jnp.linalg.norm(df - du) / jnp.linalg.norm(df))
    assert rel < 0.20, rel
