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


def _grid_index_table(extent: int, g: int) -> np.ndarray:
    """Exact host-semantics cell index for every integral center 0..extent.

    The host path computes ``floor(f32(v / extent) * g)`` with numpy's
    dtype promotion (f32/int -> f64 divide, cast to f32, f32*int -> f64
    multiply).  XLA folds divide-then-multiply into one multiply, which
    rounds DIFFERENTLY exactly when a center sits on a cell boundary
    (e.g. 264/416*52: host 32.99999•, device 33) — and integral centers on
    boundaries are common, not a corner case.  Box centers are integral
    (floor-div by 2), so a lookup table built with the host's own ops makes
    the device encoder bit-identical by construction.
    """
    v = np.arange(extent + 1, dtype=np.float32)
    norm = (v / np.int32(extent)).astype(np.float32)      # host's exact chain
    idx = np.floor(norm * np.int32(g))
    return np.clip(idx, 0, g - 1).astype(np.int32)


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

    Collision semantics are DETERMINISTIC and bit-identical to the host
    encoder (reference utils.py:290-294 loop order): when several boxes map
    to the same (cell, anchor), the LAST box (highest box index) wins the
    xy/wh/conf row, and the class one-hot flags of ALL colliding boxes
    accumulate (the reference writes field 5+class only, never clearing
    others).  Implemented as a pre-scatter dedup (later-box shadowing mask,
    a (max_boxes, max_boxes) comparison — trivial at 100 boxes) plus a
    scatter-max for the class flags, so no XLA scatter ever sees duplicate
    indices with conflicting updates.  Jittable and vmap-friendly — wired
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
    one_hot = jax.nn.one_hot(cls, num_classes, dtype=jnp.float32)
    # One full (5+C) row per box — xy/wh/conf and the class one-hot in a
    # single vector, so each scale needs ONE flat row-scatter.  The earlier
    # form (a 4-index-array slice scatter plus a separate .max scatter for
    # the class flag) lowered to two generic TPU scatters and cost ~19 ms
    # per b16 train step; this row form is an order of magnitude cheaper.
    row_vec = jnp.concatenate(
        [xy, wh, jnp.ones((bs, max_boxes, 1)), one_hot], axis=-1)
    box_i = jnp.arange(max_boxes)
    later = box_i[None, :] > box_i[:, None]           # (mb, mb) static
    # Integral centers, clipped into table range (host clips the final cell
    # index; out-of-range centers clamp to the edge cell either way).
    xi = jnp.clip(xy[..., 0], 0, w).astype(jnp.int32)
    yi = jnp.clip(xy[..., 1], 0, h).astype(jnp.int32)
    for stage, s in enumerate(strides):
        gh, gw = h // s, w // s
        sel = valid & (best_anchor // 3 == stage)
        col = jnp.take(jnp.asarray(_grid_index_table(w, gw)), xi, axis=0)
        row = jnp.take(jnp.asarray(_grid_index_table(h, gh)), yi, axis=0)
        a_idx = best_anchor % 3
        # Flat cell index within each image; non-selected boxes are routed
        # out-of-range and dropped by the scatter.
        n_cell = gh * gw * 3
        flat = (row * gw + col) * 3 + a_idx
        flat = jnp.where(sel, flat, n_cell)
        # Deterministic collisions (host-encoder parity): a box shadowed by
        # a LATER box in the same (cell, anchor) must not write its row —
        # only the last box's xy/wh/conf survive.  Unselected boxes sit at
        # flat == n_cell (> any selected index), so they never shadow.
        shadowed = jnp.any(
            later & (flat[:, :, None] == flat[:, None, :]), axis=-1)
        flat_row = jnp.where(shadowed, n_cell, flat)
        y = jnp.zeros((bs, n_cell, 5 + num_classes), jnp.float32)
        y = y.at[jnp.arange(bs)[:, None], flat_row].set(row_vec, mode="drop")
        # Class flags accumulate across ALL colliding boxes (the reference
        # sets field 5+class and never clears others): scatter-max of every
        # selected box's one-hot — duplicate indices are order-independent
        # under max, so this too is deterministic.
        acc = jnp.zeros((bs, n_cell, num_classes), jnp.float32)
        acc = acc.at[jnp.arange(bs)[:, None], flat].max(one_hot, mode="drop")
        y = jnp.concatenate(
            [y[..., :5], jnp.maximum(y[..., 5:], acc)], axis=-1)
        y_true.append(y.reshape(bs, gh, gw, 3, 5 + num_classes))

    y_true_boxes_xywh = jnp.concatenate([xy, wh], axis=-1)
    return y_true, y_true_boxes_xywh
