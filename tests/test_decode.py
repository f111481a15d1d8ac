"""Decode tests: hand-computed grids + train/inference variant divergence."""

import jax.numpy as jnp
import numpy as np
from scipy.special import expit as sigmoid

from yolov4tpu.models import head


def test_inference_decode_hand_computed():
    """box_xy = ((sig(xy)*xyscale) - 0.5*(xyscale-1) + grid) * stride
    (reference custom_layers.py:251-253)."""
    g, stride, xyscale, C = 2, 32, 1.05, 1
    anchors = np.array([[10.0, 20.0], [30.0, 40.0], [50.0, 60.0]], np.float32)
    rng = np.random.default_rng(0)
    raw = rng.normal(size=(1, g, g, 3 * (5 + C))).astype(np.float32)

    corners, obj, cls, xywh = head.get_boxes(
        jnp.asarray(raw), anchors, C, stride, xyscale)

    p = raw.reshape(1, g, g, 3, 5 + C)
    for row in range(g):
        for col in range(g):
            for a in range(3):
                v = p[0, row, col, a]
                sx, sy = sigmoid(v[0]), sigmoid(v[1])
                cx = ((sx * xyscale) - 0.5 * (xyscale - 1) + col) * stride
                cy = ((sy * xyscale) - 0.5 * (xyscale - 1) + row) * stride
                w = np.exp(v[2]) * anchors[a, 0]
                h = np.exp(v[3]) * anchors[a, 1]
                want = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]
                np.testing.assert_allclose(
                    np.asarray(corners[0, row, col, a]), want, rtol=2e-5,
                    atol=1e-4)
                np.testing.assert_allclose(np.asarray(obj[0, row, col, a, 0]),
                                           sigmoid(v[4]), rtol=1e-5)
                np.testing.assert_allclose(np.asarray(cls[0, row, col, a, 0]),
                                           sigmoid(v[5]), rtol=1e-5)
                # xywh keeps sigmoid-space xy + raw wh (custom_layers.py:245)
                np.testing.assert_allclose(np.asarray(xywh[0, row, col, a]),
                                           [sx, sy, v[2], v[3]], rtol=2e-5,
                                           atol=1e-5)


def test_train_decode_no_xyscale():
    """Train decode: pred_xy = (sig(dxdy)+grid)*stride — no xyscale
    (reference loss.py:206)."""
    g, stride, C = 2, 16, 2
    anchors = np.array([[5.0, 5.0], [10.0, 10.0], [20.0, 20.0]], np.float32)
    rng = np.random.default_rng(1)
    raw = rng.normal(size=(1, g, g, 3 * (5 + C))).astype(np.float32)
    out = head.decode_train(jnp.asarray(raw), anchors, stride, C)

    p = raw.reshape(1, g, g, 3, 5 + C)
    for row in range(g):
        for col in range(g):
            for a in range(3):
                v = p[0, row, col, a]
                want_xy = [(sigmoid(v[0]) + col) * stride,
                           (sigmoid(v[1]) + row) * stride]
                want_wh = np.exp(v[2:4]) * anchors[a]
                got = np.asarray(out[0, row, col, a])
                np.testing.assert_allclose(got[0:2], want_xy, rtol=2e-5, atol=1e-4)
                np.testing.assert_allclose(got[2:4], want_wh, rtol=2e-5, atol=1e-4)
                np.testing.assert_allclose(got[4], sigmoid(v[4]), rtol=1e-5)
                np.testing.assert_allclose(got[5:], sigmoid(v[5:]), rtol=1e-5)


def test_variants_differ_unless_xyscale_one():
    """The two decodes must agree iff xyscale == 1 (documented reference
    divergence, SURVEY §2.1)."""
    g, stride, C = 2, 8, 1
    anchors = np.array([[4.0, 4.0], [8.0, 8.0], [12.0, 12.0]], np.float32)
    raw = np.random.default_rng(3).normal(size=(1, g, g, 18)).astype(np.float32)

    tr = head.decode_train(jnp.asarray(raw), anchors, stride, C)
    corners1, _, _, _ = head.get_boxes(jnp.asarray(raw), anchors, C, stride, 1.0)
    # Convert train xywh -> corners
    xy, wh = np.asarray(tr[..., :2]), np.asarray(tr[..., 2:4])
    want = np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    np.testing.assert_allclose(np.asarray(corners1), want, rtol=2e-5, atol=1e-4)

    corners12, _, _, _ = head.get_boxes(jnp.asarray(raw), anchors, C, stride, 1.2)
    assert not np.allclose(np.asarray(corners12), want, atol=1e-3)


def test_flatten_boxes_scores_counts():
    """416 input: 52²·3+26²·3+13²·3 = 10647 candidates (SURVEY §6)."""
    C = 3
    anchors = np.arange(18, dtype=np.float32).reshape(3, 3, 2) + 1
    raws = [jnp.zeros((2, s, s, 3 * (5 + C))) for s in (52, 26, 13)]
    outs = head.decode_head(raws, anchors, C, (8, 16, 32), (1.2, 1.1, 1.05))
    boxes, scores = head.flatten_boxes_scores(outs, 416, C)
    assert boxes.shape == (2, 10647, 4)
    assert scores.shape == (2, 10647, C)
