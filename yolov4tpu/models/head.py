"""Box decoding: raw head grids -> boxes/scores.

Two decode variants exist in the reference and they genuinely differ; both are
reproduced:

  - Inference decode (reference custom_layers.py:221-257):
        box_xy = ((sigmoid(xy)*xyscale) - 0.5*(xyscale-1) + grid) * stride
        box_wh = exp(wh) * anchors            # pixel units
  - Train-time decode used inside the loss (reference loss.py:191-211):
        pred_xy = (sigmoid(dxdy) + grid) * stride    # NO xyscale
        pred_wh = exp(dwdh) * anchors

Grid convention: channel 0 is the column (x) index, channel 1 the row (y)
index, matching tf.meshgrid's 'xy' indexing in the reference
(custom_layers.py:247-249, loss.py:201-204).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _xy_grid(grid_h: int, grid_w: int) -> jnp.ndarray:
    """(grid_h, grid_w, 1, 2) float grid; [...,0]=col(x), [...,1]=row(y)."""
    cols = jax.lax.broadcasted_iota(jnp.float32, (grid_h, grid_w), 1)
    rows = jax.lax.broadcasted_iota(jnp.float32, (grid_h, grid_w), 0)
    return jnp.stack([cols, rows], axis=-1)[:, :, None, :]


def get_boxes(raw, anchors, num_classes: int, stride: int, xyscale: float):
    """Inference decode for one scale (reference custom_layers.py:221-257).

    raw: (B, g, g, 3*(5+C)) raw conv output.
    anchors: (3, 2) pixel-unit anchors for this scale.
    Returns (corners_x1y1x2y2, obj_prob, class_prob, pred_xywh):
      corners (B,g,g,3,4) absolute pixels; obj (B,g,g,3,1); cls (B,g,g,3,C);
      xywh (B,g,g,3,4) with xy still in sigmoid space (reference parity:
      pred_box_xywh concatenates sigmoid(xy) with raw wh,
      custom_layers.py:245).
    """
    b, gh, gw = raw.shape[0], raw.shape[1], raw.shape[2]
    p = raw.reshape(b, gh, gw, 3, 5 + num_classes)
    box_xy = jax.nn.sigmoid(p[..., 0:2])
    box_wh = p[..., 2:4]
    obj = jax.nn.sigmoid(p[..., 4:5])
    cls = jax.nn.sigmoid(p[..., 5:])
    pred_xywh = jnp.concatenate([box_xy, box_wh], axis=-1)

    grid = _xy_grid(gh, gw)
    xy = ((box_xy * xyscale) - 0.5 * (xyscale - 1.0) + grid) * stride
    wh = jnp.exp(box_wh) * jnp.asarray(anchors, jnp.float32)
    corners = jnp.concatenate([xy - wh / 2.0, xy + wh / 2.0], axis=-1)
    return corners, obj, cls, pred_xywh


def decode_head(raw_outputs: Sequence, anchors_grouped, num_classes: int,
                strides: Sequence[int], xyscale: Sequence[float]):
    """All-scale inference decode (reference yolov4_head, custom_layers.py:201-218).

    Returns the flat 12-element list [corners0, obj0, cls0, xywh0, corners1,
    ...] the reference head emits, preserving its decomposable debug surface.
    """
    out: List = []
    for i, raw in enumerate(raw_outputs):
        out.extend(get_boxes(raw, anchors_grouped[i], num_classes,
                             strides[i], xyscale[i]))
    return out


def flatten_boxes_scores(head_outputs, img_size: int,
                         num_classes: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Concat per-scale decodes into NMS inputs (reference nms() preamble,
    custom_layers.py:269-284).

    Returns boxes (B, N, 4) normalised to [0,1] by img_size, and scores
    (B, N, C) = obj * class.
    """
    boxes, scores = [], []
    for s in range(0, len(head_outputs), 4):
        corners, obj, cls = head_outputs[s], head_outputs[s + 1], head_outputs[s + 2]
        b = corners.shape[0]
        boxes.append(corners.reshape(b, -1, 4))
        scores.append((obj * cls).reshape(b, -1, num_classes))
    boxes = jnp.concatenate(boxes, axis=1) / float(img_size)
    scores = jnp.concatenate(scores, axis=1)
    return boxes, scores


def decode_train(raw, anchors, stride: int, num_classes: int):
    """Train-time decode (reference loss.py:191-211): no xyscale.

    raw: (B, g, g, 3*(5+C)). Returns (B, g, g, 3, 5+C):
    [xywh pixels, sigmoid conf, sigmoid class probs].
    """
    b, gh, gw = raw.shape[0], raw.shape[1], raw.shape[2]
    p = raw.reshape(b, gh, gw, 3, 5 + num_classes)
    grid = _xy_grid(gh, gw)
    xy = (jax.nn.sigmoid(p[..., 0:2]) + grid) * stride
    wh = jnp.exp(p[..., 2:4]) * jnp.asarray(anchors, jnp.float32)
    conf = jax.nn.sigmoid(p[..., 4:5])
    prob = jax.nn.sigmoid(p[..., 5:])
    return jnp.concatenate([xy, wh, conf, prob], axis=-1)
