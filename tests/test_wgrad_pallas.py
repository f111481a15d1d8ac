"""Pallas 3x3-s1 weight-gradient kernel vs XLA autodiff (ops/wgrad_pallas).

Runs the kernel in interpret mode on CPU; the TPU-compiled path is driven by
benchmarks/bench_wgrad.py and the train-step integration tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov4tpu.ops.wgrad_pallas import wgrad_3x3_s1, wgrad_xla_3x3_s1


@pytest.mark.parametrize("shape", [
    (4, 16, 16, 8, 16),    # B,H,W,Ci,Co — tiny
    (2, 13, 13, 16, 8),    # odd H/W (13^2 head grid), ht=13 whole
    (4, 26, 24, 8, 8),     # H multiple of ht, W arbitrary
])
def test_wgrad_matches_xla_f32(shape):
    B, H, W, Ci, Co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, Ci)).astype(np.float32))
    dy = jnp.asarray(rng.normal(0, 1, (B, H, W, Co)).astype(np.float32))
    ht = 13 if H == 13 else 8 if H % 8 == 0 else H
    got = wgrad_3x3_s1(x, dy, bt=2, ht=ht, interpret=True)
    want = wgrad_xla_3x3_s1(x, dy)
    assert got.shape == (3, 3, Ci, Co) and got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_wgrad_bf16_accumulates_f32():
    """bf16 operands, f32 accumulation — same contract as XLA's wgrad with
    preferred_element_type=f32."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (4, 16, 16, 8)), jnp.bfloat16)
    dy = jnp.asarray(rng.normal(0, 1, (4, 16, 16, 8)), jnp.bfloat16)
    got = wgrad_3x3_s1(x, dy, bt=2, ht=8, interpret=True)
    want = wgrad_xla_3x3_s1(x, dy)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-1)


def test_train_step_pallas_wgrad_matches_default(rng=None):
    """YoloConfig(pallas_wgrad=True): the full gradient core produces the
    same loss and near-identical gradients as the default XLA backward
    (interpret-mode kernel on CPU; the only change is the wgrad of 3x3 s1
    convs, whose f32 accumulation matches XLA's)."""
    from yolov4tpu.config import YoloConfig
    from yolov4tpu.data.encode import preprocess_true_boxes
    from yolov4tpu.models import network
    from yolov4tpu.train import _make_grad_and_metrics

    rng = np.random.default_rng(5)
    C = 2
    cfg = YoloConfig(img_size=(64, 64, 3), batch_size=2,
                     csp_repeats=(1, 1, 1, 1, 1))
    cfg_p = cfg.replace(pallas_wgrad=True)
    params, state, _ = network.init(C, img_size=64, seed=0,
                                    csp_repeats=cfg.csp_repeats)
    imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    boxes = np.zeros((2, 100, 5), np.float32)
    boxes[:, 0] = [8, 8, 40, 40, 0]
    boxes[:, 1] = [30, 20, 60, 60, 1]
    labels, xywh = preprocess_true_boxes(boxes, (64, 64), cfg.anchors_flat, C)
    batch = {"image": jnp.asarray(imgs),
             "labels": [jnp.asarray(l) for l in labels],
             "boxes": jnp.asarray(xywh)}

    g0, st0, m0 = jax.jit(_make_grad_and_metrics(C, cfg))(
        params, state, batch)
    g1, st1, m1 = jax.jit(_make_grad_and_metrics(C, cfg_p))(
        params, state, batch)
    assert float(m1["loss"]) == pytest.approx(float(m0["loss"]), rel=1e-6)
    # forward identical -> BN states identical
    for a, b in zip(jax.tree.leaves(st0), jax.tree.leaves(st1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # wgrads agree to f32 reduction tolerance
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.sqrt(np.mean(a ** 2)) + 1e-12
        assert np.sqrt(np.mean((a - b) ** 2)) / denom < 1e-4


def test_wgrad_edge_taps_see_zero_padding():
    """SAME padding: corner taps must correlate against zeros outside the
    image, not wrap or clamp — checked on a delta-function input."""
    B, H, W, Ci, Co = 1, 8, 8, 8, 8
    x = np.zeros((B, H, W, Ci), np.float32)
    x[0, 0, 0, 0] = 1.0                      # top-left corner pixel
    dy = np.zeros((B, H, W, Co), np.float32)
    dy[0, 0, 0, 0] = 1.0
    got = np.asarray(wgrad_3x3_s1(jnp.asarray(x), jnp.asarray(dy),
                                  bt=1, ht=8, interpret=True))
    # only the center tap pairs (0,0) with (0,0); taps reaching outside the
    # image hit zero padding
    want = np.zeros((3, 3, Ci, Co), np.float32)
    want[1, 1, 0, 0] = 1.0
    np.testing.assert_array_equal(got, want)
