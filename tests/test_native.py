"""Native (C++) host-pipeline kernels vs their numpy/cv2 references."""

import numpy as np
import pytest

from yolov4tpu import native
from yolov4tpu.config import YoloConfig
from yolov4tpu.data.encode import preprocess_true_boxes

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_resize_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(100, 80), (37, 53), (64, 64)]]
    out = native.resize_bilinear_batch(imgs, (48, 48))
    assert out.shape == (3, 48, 48, 3)
    for i, im in enumerate(imgs):
        ref = cv2.resize(im, (48, 48)).astype(np.float32) / 255.0
        # cv2 INTER_LINEAR is fixed-point; allow ~1 quantisation step.
        assert np.abs(out[i] - ref).max() < 2.5 / 255.0


def test_encode_labels_matches_numpy(rng):
    cfg = YoloConfig()
    bs, mb = 4, 20
    boxes = np.zeros((bs, mb, 5), np.float32)
    for b in range(bs):
        n = rng.integers(1, mb)
        x1 = rng.uniform(0, 380, n)
        y1 = rng.uniform(0, 380, n)
        w = rng.uniform(4, 200, n)
        h = rng.uniform(4, 200, n)
        boxes[b, :n] = np.stack(
            [x1, y1, np.minimum(x1 + w, 415), np.minimum(y1 + h, 415),
             rng.integers(0, 3, n)], axis=-1)
    ref_grids, ref_xywh = preprocess_true_boxes(
        boxes, (416, 416), cfg.anchors_flat, 3)
    nat_grids, nat_xywh = native.encode_labels_batch(
        boxes, (416, 416), cfg.anchors_flat, 3)
    np.testing.assert_array_equal(nat_xywh, ref_xywh)
    for g_ref, g_nat in zip(ref_grids, nat_grids):
        np.testing.assert_array_equal(g_nat, g_ref)


def test_assemble_batch_fused(rng):
    imgs = [rng.integers(0, 256, (60, 90, 3), dtype=np.uint8),
            rng.integers(0, 256, (120, 40, 3), dtype=np.uint8)]
    boxes = np.zeros((2, 4, 5), np.float32)
    boxes[0, 0] = [9, 6, 45, 30, 1]
    boxes[1, 0] = [10, 20, 30, 100, 0]
    out_imgs, out_boxes = native.assemble_batch(imgs, boxes, (48, 48))
    assert out_imgs.shape == (2, 48, 48, 3)
    # Boxes rescaled by (dw/sw, dh/sh): img0 is 90x60 -> 48x48.
    np.testing.assert_allclose(
        out_boxes[0, 0, :4],
        [9 * 48 / 90, 6 * 48 / 60, 45 * 48 / 90, 30 * 48 / 60], rtol=1e-6)
    # Padding rows stay zero.
    assert np.all(out_boxes[:, 1:, :] == 0)
    ref = native.resize_bilinear_batch(imgs, (48, 48))
    np.testing.assert_allclose(out_imgs, ref, atol=1e-7)
