"""Loss math tests: IoU family vs brute force + TF cross-checks + reduction."""

import jax.numpy as jnp
import numpy as np
import pytest

from yolov4tpu import losses


def _np_corner_iou(b1, b2):
    c1 = np.concatenate([b1[:2] - b1[2:] / 2, b1[:2] + b1[2:] / 2])
    c2 = np.concatenate([b2[:2] - b2[2:] / 2, b2[:2] + b2[2:] / 2])
    x1, y1 = max(c1[0], c2[0]), max(c1[1], c2[1])
    x2, y2 = min(c1[2], c2[2]), min(c1[3], c2[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    a1, a2 = b1[2] * b1[3], b2[2] * b2[3]
    return inter / (a1 + a2 - inter + 1e-7)


def test_bbox_iou_bruteforce(rng):
    b1 = rng.uniform(1, 100, (50, 4)).astype(np.float32)
    b2 = rng.uniform(1, 100, (50, 4)).astype(np.float32)
    got = np.asarray(losses.bbox_iou(jnp.asarray(b1), jnp.asarray(b2)))
    for i in range(50):
        assert got[i] == pytest.approx(_np_corner_iou(b1[i], b2[i]), abs=1e-5)


def test_giou_known_values():
    # identical boxes -> giou = iou = 1
    b = jnp.asarray([[10.0, 10.0, 4.0, 4.0]])
    np.testing.assert_allclose(np.asarray(losses.bbox_giou(b, b)), [1.0],
                               atol=1e-5)
    # disjoint boxes inside a known enclosure
    b1 = jnp.asarray([[2.0, 2.0, 4.0, 4.0]])   # corners (0,0)-(4,4)
    b2 = jnp.asarray([[10.0, 2.0, 4.0, 4.0]])  # corners (8,0)-(12,4)
    # iou=0; enclose=(0,0)-(12,4)=48; union=32; giou = 0 - (48-32)/48 = -1/3
    np.testing.assert_allclose(np.asarray(losses.bbox_giou(b1, b2)),
                               [-1.0 / 3.0], atol=1e-5)


def test_giou_ciou_vs_tensorflow_formulas(rng):
    """Cross-check against a straight TF transcription of the reference
    formulas (reference loss.py:34-113)."""
    tf = pytest.importorskip("tensorflow")

    b1 = rng.uniform(5, 100, (64, 4)).astype(np.float32)
    b2 = rng.uniform(5, 100, (64, 4)).astype(np.float32)

    def tf_giou(boxes1, boxes2):
        area1 = boxes1[..., 2] * boxes1[..., 3]
        area2 = boxes2[..., 2] * boxes2[..., 3]
        c1 = tf.concat([boxes1[..., :2] - boxes1[..., 2:] * 0.5,
                        boxes1[..., :2] + boxes1[..., 2:] * 0.5], axis=-1)
        c2 = tf.concat([boxes2[..., :2] - boxes2[..., 2:] * 0.5,
                        boxes2[..., :2] + boxes2[..., 2:] * 0.5], axis=-1)
        tl = tf.maximum(c1[..., :2], c2[..., :2])
        br = tf.minimum(c1[..., 2:], c2[..., 2:])
        inter_xy = tf.maximum(br - tl, 0.0)
        inter = inter_xy[..., 0] * inter_xy[..., 1]
        union = area1 + area2 - inter
        iou = inter / (union + 1e-7)
        etl = tf.minimum(c1[..., :2], c2[..., :2])
        ebr = tf.maximum(c1[..., 2:], c2[..., 2:])
        ewh = ebr - etl
        enclose = ewh[..., 0] * ewh[..., 1]
        return iou - tf.math.divide_no_nan(enclose - union, enclose)

    want = tf_giou(tf.constant(b1), tf.constant(b2)).numpy()
    got = np.asarray(losses.bbox_giou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sigmoid_ce_matches_tf(rng):
    tf = pytest.importorskip("tensorflow")
    logits = rng.normal(0, 3, (32, 7)).astype(np.float32)
    labels = rng.uniform(0, 1, (32, 7)).astype(np.float32)
    want = tf.nn.sigmoid_cross_entropy_with_logits(
        labels=tf.constant(labels), logits=tf.constant(logits)).numpy()
    got = np.asarray(losses._sigmoid_ce(jnp.asarray(labels),
                                        jnp.asarray(logits)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def _tiny_setup(rng, C=2, g=4, stride=8, B=2, M=10):
    raw = rng.normal(0, 1, (B, g, g, 3 * (5 + C))).astype(np.float32)
    label = np.zeros((B, g, g, 3, 5 + C), np.float32)
    # one positive cell per image
    label[0, 1, 2, 1, :4] = [20, 10, 8, 8]
    label[0, 1, 2, 1, 4] = 1
    label[0, 1, 2, 1, 5] = 1
    boxes = np.zeros((B, M, 4), np.float32)
    boxes[0, 0] = [20, 10, 8, 8]
    return raw, label, boxes


def test_loss_layer_components_finite_and_positive(rng):
    from yolov4tpu.models.head import decode_train
    anchors = np.array([[4, 4], [8, 8], [12, 12]], np.float32)
    raw, label, boxes = _tiny_setup(rng)
    pred = decode_train(jnp.asarray(raw), anchors, 8, 2)
    bl, cl, pl = losses.loss_layer(jnp.asarray(raw), pred,
                                   jnp.asarray(label), jnp.asarray(boxes),
                                   8, 2, 0.5)
    for v in (bl, cl, pl):
        v = float(v)
        assert np.isfinite(v) and v >= 0


def test_yolo_loss_weighting(rng):
    """Total = 3.54*box + 64.3*conf + 1*prob (reference loss.py:131-133)."""
    anchors = np.stack([np.array([[4, 4], [8, 8], [12, 12]], np.float32),
                        np.array([[8, 8], [16, 16], [24, 24]], np.float32),
                        np.array([[16, 16], [32, 32], [48, 48]], np.float32)])
    C, B = 2, 2
    raws = [jnp.asarray(rng.normal(0, 1, (B, s, s, 3 * (5 + C))).astype(np.float32))
            for s in (8, 4, 2)]
    labels = [jnp.zeros((B, s, s, 3, 5 + C)) for s in (8, 4, 2)]
    boxes = jnp.zeros((B, 10, 4))

    total, comps = losses.yolo_loss(raws, labels, boxes, anchors, (8, 16, 32),
                                    C, 0.5, return_components=True)
    assert float(total) == pytest.approx(
        float(comps["box"]) + float(comps["conf"]) + float(comps["prob"]),
        rel=1e-6)

    total_unw, comps_unw = losses.yolo_loss(
        raws, labels, boxes, anchors, (8, 16, 32), C, 0.5,
        weights=(1.0, 1.0, 1.0), return_components=True)
    assert float(comps["box"]) == pytest.approx(
        3.54 * float(comps_unw["box"]), rel=1e-5)
    assert float(comps["conf"]) == pytest.approx(
        64.3 * float(comps_unw["conf"]), rel=1e-5)


def test_perfect_prediction_small_box_loss():
    """If raw logits exactly reproduce a GT box, its (1-GIoU) term ~ 0."""
    from yolov4tpu.models.head import decode_train
    C, g, stride = 1, 4, 8
    anchors = np.array([[8, 8], [16, 16], [24, 24]], np.float32)
    # GT: center (20, 12) -> cell col 2 row 1; wh = anchors[1] -> raw wh = 0
    raw = np.zeros((1, g, g, 3 * (5 + C)), np.float32)
    raw[..., :] = -20.0  # sigmoid ~ 0 for xy/conf/prob everywhere, wh large neg
    p = raw.reshape(1, g, g, 3, 5 + C)
    p[0, 1, 2, 1, 0] = 0.0  # sigmoid 0.5 -> x = (0.5+2)*8 = 20
    p[0, 1, 2, 1, 1] = 0.0  # y = (0.5+1)*8 = 12
    p[0, 1, 2, 1, 2] = 0.0  # wh = anchors
    p[0, 1, 2, 1, 3] = 0.0
    p[0, 1, 2, 1, 4] = 20.0  # conf ~ 1

    label = np.zeros((1, g, g, 3, 5 + C), np.float32)
    label[0, 1, 2, 1, :4] = [20, 12, 16, 16]
    label[0, 1, 2, 1, 4] = 1
    label[0, 1, 2, 1, 5] = 1
    boxes = np.zeros((1, 5, 4), np.float32)
    boxes[0, 0] = [20, 12, 16, 16]

    pred = decode_train(jnp.asarray(raw), anchors, stride, C)
    bl, _, _ = losses.loss_layer(jnp.asarray(raw), pred, jnp.asarray(label),
                                 jnp.asarray(boxes), stride, C, 0.5)
    assert float(bl) < 1e-3
