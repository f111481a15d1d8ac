"""Combined-NMS parity tests — including direct cross-checks against the very
TF op the reference wraps (tf.image.combined_non_max_suppression,
reference custom_layers.py:290-297)."""

import jax.numpy as jnp
import numpy as np
import pytest

from yolov4tpu.ops.nms import combined_nms, pairwise_iou_corners


def _np_iou(a, b):
    a = np.concatenate([np.minimum(a[:2], a[2:]), np.maximum(a[:2], a[2:])])
    b = np.concatenate([np.minimum(b[:2], b[2:]), np.maximum(b[:2], b[2:])])
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = ((a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1])
          - inter)
    return inter / ua if ua > 0 else 0.0


def test_pairwise_iou_vs_bruteforce(rng):
    boxes = rng.uniform(0, 1, (20, 4)).astype(np.float32)
    got = np.asarray(pairwise_iou_corners(jnp.asarray(boxes),
                                          jnp.asarray(boxes)))
    for i in range(20):
        for j in range(20):
            assert got[i, j] == pytest.approx(_np_iou(boxes[i], boxes[j]),
                                              abs=1e-5)


def _make_boxes(rng, n, c, clustered=True):
    """Random normalized boxes with deliberate overlap clusters."""
    centers = rng.uniform(0.2, 0.8, (max(n // 4, 1), 2))
    idx = rng.integers(0, len(centers), n)
    xy = centers[idx] + rng.normal(0, 0.02, (n, 2))
    wh = rng.uniform(0.05, 0.25, (n, 2))
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    boxes = np.clip(boxes, 0, 1).astype(np.float32)
    scores = rng.uniform(0, 1, (n, c)).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("n,c,iou_t,score_t", [
    (64, 3, 0.413, 0.3),
    (128, 5, 0.5, 0.1),
    (32, 1, 0.3, 0.05),
])
def test_combined_nms_matches_tensorflow(rng, n, c, iou_t, score_t):
    """Bitwise-semantics check against tf.image.combined_non_max_suppression
    with the reference's exact argument pattern (custom_layers.py:290-297)."""
    tf = pytest.importorskip("tensorflow")
    boxes, scores = _make_boxes(rng, n, c)

    tb, ts, tc, tv = tf.image.combined_non_max_suppression(
        boxes=boxes[None, :, None, :], scores=scores[None],
        max_output_size_per_class=100, max_total_size=100,
        iou_threshold=iou_t, score_threshold=score_t)
    jb, js, jc, jv = combined_nms(
        jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
        iou_threshold=iou_t, score_threshold=score_t, pre_top_k=n)

    assert int(jv[0]) == int(tv.numpy()[0])
    nvalid = int(tv.numpy()[0])
    np.testing.assert_allclose(np.asarray(js)[0, :nvalid],
                               ts.numpy()[0, :nvalid], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(jc)[0, :nvalid],
                                  tc.numpy()[0, :nvalid])
    np.testing.assert_allclose(np.asarray(jb)[0, :nvalid],
                               tb.numpy()[0, :nvalid], rtol=1e-4, atol=1e-5)


def test_combined_nms_batched_independent(rng):
    """Each batch element is suppressed independently."""
    boxes1, scores1 = _make_boxes(rng, 40, 2)
    boxes2, scores2 = _make_boxes(rng, 40, 2)
    b = jnp.asarray(np.stack([boxes1, boxes2]))
    s = jnp.asarray(np.stack([scores1, scores2]))
    jb, js, jc, jv = combined_nms(b, s, pre_top_k=40)
    jb1, js1, _, jv1 = combined_nms(b[:1], s[:1], pre_top_k=40)
    np.testing.assert_allclose(np.asarray(jb)[0], np.asarray(jb1)[0])
    assert int(jv[0]) == int(jv1[0])


def test_nms_caps_and_padding(rng):
    """Outputs padded with zeros to max_total; per-class and total caps hold;
    boxes clipped to [0,1]."""
    n = 200
    boxes = rng.uniform(-0.2, 1.2, (n, 4)).astype(np.float32)
    boxes = np.concatenate([np.minimum(boxes[:, :2], boxes[:, 2:]),
                            np.maximum(boxes[:, :2], boxes[:, 2:])], axis=-1)
    scores = rng.uniform(0.5, 1.0, (n, 2)).astype(np.float32)
    jb, js, jc, jv = combined_nms(jnp.asarray(boxes)[None],
                                  jnp.asarray(scores)[None],
                                  iou_threshold=0.99, score_threshold=0.0,
                                  max_per_class=10, max_total=15,
                                  pre_top_k=n)
    assert jb.shape == (1, 15, 4)
    v = int(jv[0])
    assert v <= 15
    assert float(np.asarray(jb).min()) >= 0.0
    assert float(np.asarray(jb).max()) <= 1.0
    # padding region zeroed
    assert np.all(np.asarray(js)[0, v:] == 0)
    assert np.all(np.asarray(jb)[0, v:] == 0)
    # per-class cap: at most 10 of each class among valid entries
    classes = np.asarray(jc)[0, :v]
    for cl in np.unique(classes):
        assert (classes == cl).sum() <= 10


def test_nms_empty_when_all_below_threshold(rng):
    boxes = rng.uniform(0, 1, (16, 4)).astype(np.float32)
    scores = np.full((16, 3), 0.01, np.float32)
    jb, js, jc, jv = combined_nms(jnp.asarray(boxes)[None],
                                  jnp.asarray(scores)[None],
                                  score_threshold=0.3, pre_top_k=16)
    assert int(jv[0]) == 0
    assert np.all(np.asarray(js) == 0)
