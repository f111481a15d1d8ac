"""Pallas suppression-kernel parity vs the XLA combined-NMS reference path.

Runs the kernel in Pallas interpreter mode (no TPU needed); on real TPU the
same kernel compiles via Mosaic.  The XLA path is itself cross-checked against
tf.image.combined_non_max_suppression in test_nms.py, so transitively this
pins the Pallas kernel to the reference semantics (custom_layers.py:290-297).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from yolov4tpu.ops.nms import combined_nms
from yolov4tpu.ops.nms_pallas import combined_nms_fast, combined_nms_pallas


def _make_boxes(rng, n, c):
    centers = rng.uniform(0.2, 0.8, (max(n // 4, 1), 2))
    idx = rng.integers(0, len(centers), n)
    xy = centers[idx] + rng.normal(0, 0.02, (n, 2))
    wh = rng.uniform(0.05, 0.25, (n, 2))
    boxes = np.clip(np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1),
                    0, 1).astype(np.float32)
    scores = rng.uniform(0, 1, (n, c)).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("n,c,iou_t,score_t,k", [
    (64, 3, 0.413, 0.3, 64),
    (96, 5, 0.5, 0.1, 64),
    (48, 1, 0.3, 0.05, 32),
])
def test_pallas_matches_xla(rng, n, c, iou_t, score_t, k):
    boxes, scores = _make_boxes(rng, n, c)
    b = jnp.asarray(boxes)[None]
    s = jnp.asarray(scores)[None]
    xb, xs, xc, xv = combined_nms(b, s, iou_threshold=iou_t,
                                  score_threshold=score_t, pre_top_k=k)
    pb, ps, pc, pv = combined_nms_pallas(b, s, iou_threshold=iou_t,
                                         score_threshold=score_t, pre_top_k=k,
                                         interpret=True)
    assert int(pv[0]) == int(xv[0])
    v = int(xv[0])
    np.testing.assert_allclose(np.asarray(ps)[0, :v], np.asarray(xs)[0, :v],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(pc)[0, :v],
                                  np.asarray(xc)[0, :v])
    np.testing.assert_allclose(np.asarray(pb)[0, :v], np.asarray(xb)[0, :v],
                               rtol=1e-6, atol=1e-7)


def test_pallas_batched_and_caps(rng):
    boxes1, scores1 = _make_boxes(rng, 40, 2)
    boxes2, scores2 = _make_boxes(rng, 40, 2)
    b = jnp.asarray(np.stack([boxes1, boxes2]))
    s = jnp.asarray(np.stack([scores1, scores2]))
    xb, xs, xc, xv = combined_nms(b, s, max_per_class=5, max_total=8,
                                  pre_top_k=40)
    pb, ps, pc, pv = combined_nms_pallas(b, s, max_per_class=5, max_total=8,
                                         pre_top_k=40, interpret=True)
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(xv))
    np.testing.assert_allclose(np.asarray(ps), np.asarray(xs), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(xb), rtol=1e-6,
                               atol=1e-7)


def test_fast_matches_xla_on_sparse_scores(rng):
    """combined_nms_fast is exact whenever at most ``candidates`` boxes clear
    the score threshold on their best class — the regime of a real detector
    at the reference operating point (score 0.3, config.py:15)."""
    n, c = 400, 8
    boxes, _ = _make_boxes(rng, n, c)
    # Sparse scores: background below threshold, ~30 strong detections.
    scores = rng.uniform(0, 0.25, (n, c)).astype(np.float32)
    hot = rng.choice(n, 30, replace=False)
    scores[hot, rng.integers(0, c, 30)] = rng.uniform(0.35, 1.0, 30)
    b = jnp.asarray(boxes)[None]
    s = jnp.asarray(scores)[None]
    xb, xs, xc, xv = combined_nms(b, s, pre_top_k=64)
    fb, fs, fc, fv = combined_nms_fast(b, s, candidates=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(xv))
    v = int(xv[0])
    np.testing.assert_allclose(np.asarray(fs)[0, :v], np.asarray(xs)[0, :v],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(fc)[0, :v],
                                  np.asarray(xc)[0, :v])
    np.testing.assert_allclose(np.asarray(fb)[0, :v], np.asarray(xb)[0, :v],
                               rtol=1e-6, atol=1e-7)


def test_fast_empty_and_batched(rng):
    boxes1, _ = _make_boxes(rng, 64, 3)
    boxes2, _ = _make_boxes(rng, 64, 3)
    scores = np.full((2, 64, 3), 0.01, np.float32)
    scores[1, 4, 2] = 0.9
    fb, fs, fc, fv = combined_nms_fast(
        jnp.asarray(np.stack([boxes1, boxes2])), jnp.asarray(scores),
        candidates=32, interpret=True)
    assert int(fv[0]) == 0 and int(fv[1]) == 1
    assert float(fs[1, 0]) == pytest.approx(0.9)
    assert int(fc[1, 0]) == 2


def test_pallas_empty(rng):
    boxes = rng.uniform(0, 1, (16, 4)).astype(np.float32)
    scores = np.full((16, 3), 0.01, np.float32)
    pb, ps, pc, pv = combined_nms_pallas(jnp.asarray(boxes)[None],
                                         jnp.asarray(scores)[None],
                                         score_threshold=0.3, pre_top_k=16,
                                         interpret=True)
    assert int(pv[0]) == 0
    assert np.all(np.asarray(ps) == 0)
