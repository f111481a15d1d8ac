"""YOLOv4 training loss — IoU family + per-scale loss + aggregator.

Math parity with reference loss.py, reproduced with eyes open:
  - the box term uses **GIoU**, not CIoU — the reference's bbox_ciou call is
    commented out (reference loss.py:156-157) — though CIoU is available and
    selectable;
  - fixed term weights 3.54 / 64.3 / 1 (reference loss.py:131-133);
  - train-time decode has no xyscale (see models/head.decode_train);
  - epsilon in IoU/GIoU denominators is Keras epsilon 1e-7
    (reference loss.py:31,50), CIoU uses 1e-9 (loss.py:93,107-108);
  - per-term reduction: mean over batch of per-image sums
    (reference loss.py:184-186).

Optional label smoothing implements the reference's unchecked TODO
(reference README.md:12, commented stub utils.py:296-301).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

_EPS = 1e-7  # tf.keras.backend.epsilon()


def xywh_to_x1y1x2y2(boxes):
    """Center-format -> corner-format (reference loss.py:10-11)."""
    return jnp.concatenate(
        [boxes[..., :2] - boxes[..., 2:] * 0.5,
         boxes[..., :2] + boxes[..., 2:] * 0.5], axis=-1)


def bbox_iou(boxes1, boxes2):
    """Elementwise IoU on center-format boxes (reference loss.py:15-31)."""
    area1 = boxes1[..., 2] * boxes1[..., 3]
    area2 = boxes2[..., 2] * boxes2[..., 3]
    b1 = xywh_to_x1y1x2y2(boxes1)
    b2 = xywh_to_x1y1x2y2(boxes2)
    tl = jnp.maximum(b1[..., :2], b2[..., :2])
    br = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.maximum(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / (union + _EPS)


def bbox_giou(boxes1, boxes2):
    """Elementwise GIoU on center-format boxes (reference loss.py:34-60)."""
    area1 = boxes1[..., 2] * boxes1[..., 3]
    area2 = boxes2[..., 2] * boxes2[..., 3]
    b1 = xywh_to_x1y1x2y2(boxes1)
    b2 = xywh_to_x1y1x2y2(boxes2)
    tl = jnp.maximum(b1[..., :2], b2[..., :2])
    br = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.maximum(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / (union + _EPS)

    etl = jnp.minimum(b1[..., :2], b2[..., :2])
    ebr = jnp.maximum(b1[..., 2:], b2[..., 2:])
    ewh = ebr - etl
    enclose = ewh[..., 0] * ewh[..., 1]
    # tf.math.divide_no_nan semantics (reference loss.py:58).
    frac = jnp.where(enclose != 0.0, (enclose - union) / jnp.where(enclose != 0.0, enclose, 1.0), 0.0)
    return iou - frac


def bbox_ciou(boxes1, boxes2):
    """Elementwise CIoU on center-format boxes (reference loss.py:63-113)."""
    b1 = xywh_to_x1y1x2y2(boxes1)
    b2 = xywh_to_x1y1x2y2(boxes2)
    b1 = jnp.concatenate([jnp.minimum(b1[..., :2], b1[..., 2:]),
                          jnp.maximum(b1[..., :2], b1[..., 2:])], axis=-1)
    b2 = jnp.concatenate([jnp.minimum(b2[..., :2], b2[..., 2:]),
                          jnp.maximum(b2[..., :2], b2[..., 2:])], axis=-1)
    area1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    area2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    lu = jnp.maximum(b1[..., :2], b2[..., :2])
    rd = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.maximum(rd - lu, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / (union + 1e-9)

    elu = jnp.minimum(b1[..., :2], b2[..., :2])
    erd = jnp.maximum(b1[..., 2:], b2[..., 2:])
    ewh = erd - elu
    c2 = ewh[..., 0] ** 2 + ewh[..., 1] ** 2
    p2 = ((boxes1[..., 0] - boxes2[..., 0]) ** 2
          + (boxes1[..., 1] - boxes2[..., 1]) ** 2)
    atan1 = jnp.arctan(boxes1[..., 2] / (boxes1[..., 3] + 1e-9))
    atan2 = jnp.arctan(boxes2[..., 2] / (boxes2[..., 3] + 1e-9))
    v = 4.0 * (atan1 - atan2) ** 2 / (math.pi ** 2)
    a = v / (1.0 - iou + v)
    return iou - p2 / c2 - a * v


def _sigmoid_ce(labels, logits):
    """tf.nn.sigmoid_cross_entropy_with_logits: max(x,0) - x*z + log1p(exp(-|x|))."""
    return (jnp.maximum(logits, 0.0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def loss_layer(conv, pred, label, true_boxes, stride: int, num_classes: int,
               iou_loss_thresh: float, box_iou_kind: str = "giou",
               label_smoothing: float = 0.0, sample_mask=None):
    """Per-scale loss terms (reference loss.py:138-188).

    conv: (B,g,g,3*(5+C)) raw head output; pred: decode_train output
    (B,g,g,3,5+C); label: GT grid (B,g,g,3,5+C); true_boxes: (B,M,4) xywh px.
    sample_mask: optional (B,) 0/1 validity — padded samples drop out of the
    batch means (reference loss.py:184-186 reduce_mean over real samples).
    Returns (box_loss, conf_loss, prob_loss) scalars (unweighted).
    """
    b, g = conv.shape[0], conv.shape[1]
    input_size = float(stride * g)
    conv = conv.reshape(b, g, g, 3, 5 + num_classes)
    conv_raw_conf = conv[..., 4:5]
    conv_raw_prob = conv[..., 5:]

    pred_xywh = pred[..., 0:4]
    pred_conf = pred[..., 4:5]

    label_xywh = label[..., 0:4]
    respond_bbox = label[..., 4:5]
    label_prob = label[..., 5:]
    if label_smoothing > 0.0:
        # delta-smoothed one-hot (the reference's commented-out stub,
        # utils.py:296-301, made real).
        label_prob = (label_prob * (1.0 - label_smoothing)
                      + label_smoothing / num_classes)

    iou_fn = bbox_giou if box_iou_kind == "giou" else bbox_ciou
    iou_term = iou_fn(pred_xywh, label_xywh)[..., None]

    bbox_loss_scale = 2.0 - (label_xywh[..., 2:3] * label_xywh[..., 3:4]
                             / (input_size ** 2))
    box_loss = respond_bbox * bbox_loss_scale * (1.0 - iou_term)

    prob_loss = respond_bbox * _sigmoid_ce(label_prob, conv_raw_prob)

    # Background assignment: cells whose best IoU against any GT box is below
    # the threshold (reference loss.py:167-173).
    iou = bbox_iou(pred_xywh[:, :, :, :, None, :],
                   true_boxes[:, None, None, None, :, :])
    max_iou = jnp.max(iou, axis=-1)[..., None]
    respond_bgd = ((1.0 - respond_bbox)
                   * (max_iou < iou_loss_thresh).astype(jnp.float32))

    conf_focal = (respond_bbox - pred_conf) ** 2
    ce = _sigmoid_ce(respond_bbox, conv_raw_conf)
    conf_loss = conf_focal * (respond_bbox * ce + respond_bgd * ce)

    if sample_mask is None:
        batch_mean = lambda t: jnp.mean(jnp.sum(t, axis=(1, 2, 3, 4)))  # noqa: E731
    else:
        m = sample_mask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        batch_mean = lambda t: (  # noqa: E731
            jnp.sum(jnp.sum(t, axis=(1, 2, 3, 4)) * m) / denom)
    box_loss = batch_mean(box_loss)
    conf_loss = batch_mean(conf_loss)
    prob_loss = batch_mean(prob_loss)
    return box_loss, conf_loss, prob_loss


def yolo_loss(raw_outputs: Sequence, labels: Sequence, true_boxes,
              anchors_grouped, strides: Sequence[int], num_classes: int,
              iou_loss_thresh: float, weights=(3.54, 64.3, 1.0),
              box_iou_kind: str = "giou", label_smoothing: float = 0.0,
              return_components: bool = False, sample_mask=None):
    """Total training loss over all scales (reference loss.py:116-135).

    raw_outputs: [sbbox, mbbox, lbbox] raw grids; labels: matching GT grids;
    true_boxes: (B, max_boxes, 4) xywh pixels.
    """
    from .models.head import decode_train

    box_l = conf_l = prob_l = 0.0
    for i, (raw, label) in enumerate(zip(raw_outputs, labels)):
        if sample_mask is not None:
            # Zero the raw grids of padded samples BEFORE decode: a padded
            # (zero) image normalized by the valid samples' BN stats is
            # out-of-distribution and its raw wh can overflow exp() in
            # decode_train to inf — and inf*0 in the masked mean is NaN
            # (in the backward too).  Multiplying raw by the mask keeps the
            # pad rows' whole loss graph finite and their gradients exactly
            # zero (cotangents scale by the same 0).
            raw = raw * sample_mask.astype(raw.dtype).reshape(-1, 1, 1, 1)
        pred = decode_train(raw, anchors_grouped[i], strides[i], num_classes)
        bl, cl, pl = loss_layer(raw, pred, label, true_boxes, strides[i],
                                num_classes, iou_loss_thresh, box_iou_kind,
                                label_smoothing, sample_mask=sample_mask)
        box_l += bl
        conf_l += cl
        prob_l += pl

    box_l *= weights[0]
    conf_l *= weights[1]
    prob_l *= weights[2]
    total = box_l + conf_l + prob_l
    if return_components:
        return total, {"box": box_l, "conf": conf_l, "prob": prob_l}
    return total
