"""Training tests: step mechanics, overfit convergence, 8-fake-device DP
equivalence (SURVEY §4 distributed tier)."""

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
def setup(rng):
    params, state, _ = network.init(C, img_size=64, seed=0)
    batch = _synthetic_batch(rng)
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


def test_dp_mesh_equivalence(setup):
    """8-fake-device data-parallel step == single-device step on the same
    global batch (gradient all-reduce correctness)."""
    params, state, batch = setup
    assert jax.device_count() >= 8, "conftest must fake 8 devices"
    big_batch = {
        "image": jnp.concatenate([batch["image"]] * 4),
        "labels": [jnp.concatenate([l] * 4) for l in batch["labels"]],
        "boxes": jnp.concatenate([batch["boxes"]] * 4),
    }
    opt = make_optimizer(CFG)
    opt_state = opt.init(params)

    single = make_train_step(C, CFG, opt, donate=False)
    p1, _, _, m1 = single(params, state, opt_state, big_batch)

    mesh = make_mesh(8)
    sharded = make_train_step(C, CFG, opt, mesh=mesh, donate=False)
    p8, _, _, m8 = sharded(params, state, opt_state, big_batch)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-4)
    l1 = jax.tree.leaves(p1)
    l8 = jax.tree.leaves(p8)
    for a, b in zip(l1[:5], l8[:5]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_cosine_annealing_schedule_values():
    """Schedule formula parity with reference custom_callbacks.py:13-15."""
    sched = cosine_annealing_schedule(1e-3, 1e-5, cycle_epochs=10,
                                      steps_per_epoch=5)
    assert float(sched(0)) == pytest.approx(1e-3)
    # epoch 5 of 10: cos(pi/2)=0 -> midpoint
    assert float(sched(25)) == pytest.approx((1e-3 + 1e-5) / 2, rel=1e-5)
    # restart at epoch 10
    assert float(sched(50)) == pytest.approx(1e-3)


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
