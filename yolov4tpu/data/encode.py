"""Ground-truth label encoding: boxes -> per-scale anchor grids.

Replaces the reference's python double loop over batch x boxes
(reference utils.py:256-294 — the slowest host code in that repo) with fully
vectorised numpy (host path, exact parity) and a jit/vmap-able JAX variant
(device path).

Parity notes (reference utils.py:210-303):
  - box centers use integer floor-division by 2 (``(x1+x2)//2`` on float
    arrays, reference utils.py:233);
  - grids store ABSOLUTE pixel xy/wh (not cell offsets), conf 1, one-hot
    class (reference utils.py:290-294);
  - anchor assignment: IoU of each GT wh against all 9 anchors centred at the
    origin, argmax wins, anchor's scale via mask [[0,1,2],[3,4,5],[6,7,8]];
  - collision semantics: a later box overwrites an earlier one's xy/wh/conf in
    the same (cell, anchor), but one-hot class flags accumulate (the reference
    writes field 5+class only, never clearing others);
  - unlike the reference, out-of-range grid indices (box centred exactly on
    the image edge) are clipped instead of crashing.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

ANCHOR_MASK = ((0, 1, 2), (3, 4, 5), (6, 7, 8))


def best_anchor_ious(wh: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """IoU of GT wh (..., 2) vs anchors (9, 2), both centred at origin -> (..., 9)."""
    wh_e = wh[..., None, :]
    inter = np.minimum(wh_e / 2.0, anchors / 2.0) - np.maximum(-wh_e / 2.0, -anchors / 2.0)
    inter = np.maximum(inter, 0.0)
    inter_area = inter[..., 0] * inter[..., 1]
    box_area = wh_e[..., 0] * wh_e[..., 1]
    anchor_area = anchors[:, 0] * anchors[:, 1]
    return inter_area / (box_area + anchor_area - inter_area)


def preprocess_true_boxes(
    true_boxes, input_shape, anchors, num_classes: int,
    strides: Sequence[int] = (8, 16, 32),
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Encode corner boxes into YOLO training grids (reference utils.py:210-303).

    true_boxes: (bs, max_boxes, 5) absolute [x1, y1, x2, y2, class_id];
        zero rows = padding.
    input_shape: (h, w).
    anchors: (9, 2) pixel wh.
    Returns (y_true list of (bs, g, g, 3, 5+C) float32 grids,
             y_true_boxes_xywh (bs, max_boxes, 4) absolute center-format).
    """
    true_boxes = np.asarray(true_boxes, dtype=np.float32)
    input_shape = np.asarray(input_shape, dtype=np.int32)
    anchors = np.asarray(anchors, dtype=np.float32)
    bs, max_boxes = true_boxes.shape[:2]
    num_stages = len(strides)

    xy = (true_boxes[..., 0:2] + true_boxes[..., 2:4]) // 2  # floor: parity
    wh = true_boxes[..., 2:4] - true_boxes[..., 0:2]
    # Normalised relative to (w, h) — note input_shape is (h, w), reversed
    # exactly as the reference does (utils.py:237-238).  float32 like the
    # reference's in-place store (it writes into a float32 array), so cell
    # rounding at grid boundaries matches bit-for-bit.
    norm_xy = (xy / input_shape[::-1]).astype(np.float32)

    grid_sizes = [input_shape // s for s in strides]
    y_true = [
        np.zeros((bs, g[0], g[1], 3, 5 + num_classes), dtype=np.float32)
        for g in grid_sizes
    ]
    y_true_boxes_xywh = np.concatenate([xy, wh], axis=-1)

    valid = wh[..., 0] > 0
    if not valid.any():
        return y_true, y_true_boxes_xywh

    iou = best_anchor_ious(np.where(valid[..., None], wh, 1.0), anchors)
    best_anchor = iou.argmax(axis=-1)  # (bs, max_boxes)

    for stage in range(num_stages):
        sel = valid & (best_anchor // 3 == stage)
        if not sel.any():
            continue
        # np.nonzero returns row-major order: batch asc then box asc — the
        # same order as the reference's loops, so duplicate-cell writes
        # resolve identically (last box wins).
        b_idx, box_idx = np.nonzero(sel)
        g = grid_sizes[stage]
        col = np.floor(norm_xy[b_idx, box_idx, 0] * g[1]).astype(np.int64)
        row = np.floor(norm_xy[b_idx, box_idx, 1] * g[0]).astype(np.int64)
        col = np.clip(col, 0, g[1] - 1)
        row = np.clip(row, 0, g[0] - 1)
        a_idx = best_anchor[b_idx, box_idx] % 3
        cls = true_boxes[b_idx, box_idx, 4].astype(np.int64)

        y = y_true[stage]
        y[b_idx, row, col, a_idx, 0:2] = xy[b_idx, box_idx]
        y[b_idx, row, col, a_idx, 2:4] = wh[b_idx, box_idx]
        y[b_idx, row, col, a_idx, 4] = 1.0
        y[b_idx, row, col, a_idx, 5 + cls] = 1.0

    return y_true, y_true_boxes_xywh


# ---------------------------------------------------------------------------
# Device-side (JAX) variant — jittable, for on-TPU input pipelines
# ---------------------------------------------------------------------------

def encode_labels_jax(true_boxes, input_shape: Tuple[int, int], anchors,
                      num_classes: int, strides: Sequence[int] = (8, 16, 32)):
    """JAX scatter-based label encoder (same contract as preprocess_true_boxes).

    When several boxes map to the same (cell, anchor), which box's full row
    (xy/wh/conf AND class one-hot) wins is unspecified here (XLA scatter
    semantics; the numpy twin is last-write-wins with OR-accumulated class
    flags).  Everything else matches.  Jittable and vmap-friendly — wired
    into the train step by ``YoloConfig(encode_on_device=True)``.
    """
    import jax
    import jax.numpy as jnp

    true_boxes = jnp.asarray(true_boxes, jnp.float32)
    h, w = int(input_shape[0]), int(input_shape[1])
    anchors_j = jnp.asarray(anchors, jnp.float32)
    bs, max_boxes = true_boxes.shape[:2]

    xy = jnp.floor_divide(true_boxes[..., 0:2] + true_boxes[..., 2:4], 2.0)
    wh = true_boxes[..., 2:4] - true_boxes[..., 0:2]
    norm_xy = xy / jnp.asarray([w, h], jnp.float32)
    valid = wh[..., 0] > 0

    wh_e = jnp.where(valid[..., None], wh, 1.0)[..., None, :]
    inter = (jnp.minimum(wh_e / 2, anchors_j / 2)
             - jnp.maximum(-wh_e / 2, -anchors_j / 2))
    inter = jnp.maximum(inter, 0.0)
    inter_area = inter[..., 0] * inter[..., 1]
    iou = inter_area / (wh_e[..., 0] * wh_e[..., 1]
                        + anchors_j[:, 0] * anchors_j[:, 1] - inter_area)
    best_anchor = jnp.argmax(iou, axis=-1)

    y_true = []
    cls = true_boxes[..., 4].astype(jnp.int32)
    # One full (5+C) row per box — xy/wh/conf and the class one-hot in a
    # single vector, so each scale needs ONE flat row-scatter.  The earlier
    # form (a 4-index-array slice scatter plus a separate .max scatter for
    # the class flag) lowered to two generic TPU scatters and cost ~19 ms
    # per b16 train step; this row form is an order of magnitude cheaper.
    # Collision semantics between boxes in the same (cell, anchor) remain
    # unspecified (XLA scatter), as documented above.
    row_vec = jnp.concatenate(
        [xy, wh, jnp.ones((bs, max_boxes, 1)),
         jax.nn.one_hot(cls, num_classes, dtype=jnp.float32)], axis=-1)
    for stage, s in enumerate(strides):
        gh, gw = h // s, w // s
        sel = valid & (best_anchor // 3 == stage)
        col = jnp.clip(jnp.floor(norm_xy[..., 0] * gw).astype(jnp.int32), 0, gw - 1)
        row = jnp.clip(jnp.floor(norm_xy[..., 1] * gh).astype(jnp.int32), 0, gh - 1)
        a_idx = best_anchor % 3
        # Flat cell index within each image; non-selected boxes are routed
        # out-of-range and dropped by the scatter.
        n_cell = gh * gw * 3
        flat = (row * gw + col) * 3 + a_idx
        flat = jnp.where(sel, flat, n_cell)
        y = jnp.zeros((bs, n_cell, 5 + num_classes), jnp.float32)
        y = y.at[jnp.arange(bs)[:, None], flat].set(row_vec, mode="drop")
        y_true.append(y.reshape(bs, gh, gw, 3, 5 + num_classes))

    y_true_boxes_xywh = jnp.concatenate([xy, wh], axis=-1)
    return y_true, y_true_boxes_xywh
