"""Fused detection path (ops/detect.py) vs the decomposed reference path.

detect_fused must be output-identical to decode_head -> flatten_boxes_scores
-> combined_nms_fast: same candidate set (per-scale top-k union contains the
global top-k; sigmoid is monotone so best-class selection commutes with the
logit max), same decode formulas, same NMS tail.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from yolov4tpu.config import YoloConfig
from yolov4tpu.models import head
from yolov4tpu.ops.detect import detect_fused
from yolov4tpu.ops.nms_pallas import combined_nms_fast


def _random_raws(rng, batch, img, num_classes):
    cfg = YoloConfig(img_size=(img, img, 3))
    raws = []
    for g in cfg.grid_sizes(img):
        # Spread logits so some boxes clear the 0.3 score threshold and many
        # overlap (pressure on the suppression loop).
        r = rng.normal(0.0, 2.0, (batch, g, g, 3 * (5 + num_classes)))
        raws.append(jnp.asarray(r, jnp.float32))
    return cfg, raws


@pytest.mark.parametrize("num_classes", [3, 8])
def test_detect_fused_matches_decomposed(rng, num_classes):
    img, batch = 64, 3
    cfg, raws = _random_raws(rng, batch, img, num_classes)

    outs = head.decode_head(raws, cfg.anchors_grouped, num_classes,
                            cfg.strides, cfg.xyscale)
    boxes, scores = head.flatten_boxes_scores(outs, img, num_classes)
    want = combined_nms_fast(
        boxes, scores, iou_threshold=cfg.iou_threshold,
        score_threshold=cfg.score_threshold, max_per_class=cfg.max_boxes,
        max_total=cfg.max_boxes, candidates=64, interpret=True)

    got = detect_fused(
        raws, cfg.anchors_grouped, num_classes, cfg.strides, cfg.xyscale,
        img, iou_threshold=cfg.iou_threshold,
        score_threshold=cfg.score_threshold, max_per_class=cfg.max_boxes,
        max_total=cfg.max_boxes, candidates=64, interpret=True)

    np.testing.assert_allclose(got[1], want[1], atol=1e-6)  # scores
    np.testing.assert_allclose(got[0], want[0], atol=1e-5)  # boxes
    np.testing.assert_array_equal(got[2], want[2])          # classes
    np.testing.assert_array_equal(got[3], want[3])          # valid counts


def test_detect_fused_low_threshold_and_small_k(rng):
    """K smaller than the per-scale box count and a permissive threshold:
    the candidate reduction saturates, outputs must still agree."""
    img, batch, num_classes = 64, 2, 4
    cfg, raws = _random_raws(rng, batch, img, num_classes)

    outs = head.decode_head(raws, cfg.anchors_grouped, num_classes,
                            cfg.strides, cfg.xyscale)
    boxes, scores = head.flatten_boxes_scores(outs, img, num_classes)
    kw = dict(iou_threshold=0.5, score_threshold=0.05, max_per_class=20,
              max_total=20, interpret=True)
    want = combined_nms_fast(boxes, scores, candidates=32, **kw)
    got = detect_fused(raws, cfg.anchors_grouped, num_classes, cfg.strides,
                       cfg.xyscale, img, candidates=32, **kw)
    np.testing.assert_allclose(got[1], want[1], atol=1e-6)
    np.testing.assert_allclose(got[0], want[0], atol=1e-5)
    np.testing.assert_array_equal(got[3], want[3])
