"""Combined (per-class) non-maximum suppression, TPU-native.

The reference delegates to TensorFlow's C++ CUDA/CPU kernel
``tf.image.combined_non_max_suppression`` (reference custom_layers.py:290-297)
with max 100 boxes per class, max 100 total, clip_boxes=True.  XLA has no such
op, so this module provides:

  - ``combined_nms``: an exact, fully-jittable XLA implementation (sort +
    masked greedy suppression under ``lax.fori_loop`` — static shapes, no
    data-dependent control flow), used as the correctness reference and the
    default path; and
  - a Pallas fused kernel in ``nms_pallas.py`` for the hot path (routed via
    ``use_pallas=True``).

Semantics match TF combined NMS: per-class greedy suppression over boxes
sorted by score (ties broken by lower index), score_threshold filtering,
per-class cap, then a global top-``max_total`` merge by score, outputs padded
with zeros and boxes clipped to [0,1].
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def pairwise_iou_corners(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between two corner-format box sets: (N,4),(M,4) -> (N,M)."""
    # Normalise corner order so degenerate boxes behave like TF's.
    a = jnp.concatenate([jnp.minimum(a[:, :2], a[:, 2:]),
                         jnp.maximum(a[:, :2], a[:, 2:])], axis=-1)
    b = jnp.concatenate([jnp.minimum(b[:, :2], b[:, 2:]),
                         jnp.maximum(b[:, :2], b[:, 2:])], axis=-1)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _greedy_suppress(iou: jnp.ndarray, valid: jnp.ndarray,
                     iou_threshold: float) -> jnp.ndarray:
    """Sequential greedy NMS over score-sorted candidates.

    iou: (K, K) pairwise IoU of candidates in descending-score order.
    valid: (K,) bool, candidates above the score threshold.
    Returns (K,) bool keep mask.
    """
    k = iou.shape[0]
    idx = jnp.arange(k)

    def body(i, alive):
        row = (iou[i] > iou_threshold) & (idx > i)
        return alive & ~jnp.where(alive[i], row, False)

    return lax.fori_loop(0, k, body, valid)


def _per_class_nms(boxes, scores_c, iou_threshold, score_threshold,
                   pre_top_k, max_per_class):
    """One class, one image: boxes (N,4), scores_c (N,) -> (K,), (K,4), (K,) keep."""
    k = min(pre_top_k, scores_c.shape[0])
    top_scores, top_idx = lax.top_k(scores_c, k)
    top_boxes = boxes[top_idx]
    valid = top_scores > score_threshold
    iou = pairwise_iou_corners(top_boxes, top_boxes)
    keep = _greedy_suppress(iou, valid, iou_threshold)
    # Per-class cap (TF max_output_size_per_class).
    rank = jnp.cumsum(keep.astype(jnp.int32))
    keep = keep & (rank <= max_per_class)
    return top_scores, top_boxes, keep


@functools.partial(jax.jit, static_argnames=(
    "iou_threshold", "score_threshold", "max_per_class", "max_total",
    "pre_top_k", "clip"))
def combined_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                 iou_threshold: float = 0.413, score_threshold: float = 0.3,
                 max_per_class: int = 100, max_total: int = 100,
                 pre_top_k: int = 256, clip: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched combined NMS.

    boxes: (B, N, 4) corner boxes (normalised or absolute — IoU invariant).
    scores: (B, N, C) per-class scores.
    Returns (nmsed_boxes (B,T,4), nmsed_scores (B,T), nmsed_classes (B,T),
    valid_detections (B,)) with T = max_total, zero-padded, matching the
    reference output contract (custom_layers.py:286-298).
    """
    num_classes = scores.shape[-1]

    def one_image(bx, sc):
        # vmap over classes: each gets its own top-k + greedy pass.
        per_class = jax.vmap(
            lambda s_c: _per_class_nms(bx, s_c, iou_threshold, score_threshold,
                                       pre_top_k, max_per_class),
            in_axes=1, out_axes=0)
        c_scores, c_boxes, c_keep = per_class(sc)  # (C,K), (C,K,4), (C,K)
        flat_scores = jnp.where(c_keep, c_scores, -1.0).reshape(-1)
        flat_boxes = c_boxes.reshape(-1, 4)
        k = c_scores.shape[1]
        flat_classes = (jnp.arange(num_classes * k) // k).astype(jnp.float32)

        t = min(max_total, flat_scores.shape[0])
        sel_scores, sel_idx = lax.top_k(flat_scores, t)
        sel_boxes = flat_boxes[sel_idx]
        sel_classes = flat_classes[sel_idx]
        valid = sel_scores > 0.0
        n_valid = jnp.sum(valid.astype(jnp.int32))

        sel_scores = jnp.where(valid, sel_scores, 0.0)
        sel_boxes = jnp.where(valid[:, None], sel_boxes, 0.0)
        sel_classes = jnp.where(valid, sel_classes, 0.0)
        if clip:
            sel_boxes = jnp.clip(sel_boxes, 0.0, 1.0)
        if t < max_total:
            pad = max_total - t
            sel_scores = jnp.pad(sel_scores, (0, pad))
            sel_classes = jnp.pad(sel_classes, (0, pad))
            sel_boxes = jnp.pad(sel_boxes, ((0, pad), (0, 0)))
        return sel_boxes, sel_scores, sel_classes, n_valid

    return jax.vmap(one_image)(boxes, scores)


def nms(head_outputs, img_size, num_classes: int, iou_threshold: float = 0.413,
        score_threshold: float = 0.3, max_total: int = 100,
        pre_top_k: int = 256, use_pallas: bool = False):
    """Reference-facade NMS entry point (reference custom_layers.py:261-298).

    head_outputs: the 12-element decode list from ``decode_head``.
    img_size: (H, W, C) tuple or int — boxes are normalised by its first entry.
    Returns (boxes, scores, classes, valid_detections).
    """
    from ..models.head import flatten_boxes_scores
    size = img_size[0] if hasattr(img_size, "__len__") else img_size
    boxes, scores = flatten_boxes_scores(head_outputs, size, num_classes)
    if use_pallas:
        from .nms_pallas import combined_nms_pallas
        return combined_nms_pallas(
            boxes, scores, iou_threshold=iou_threshold,
            score_threshold=score_threshold, max_total=max_total,
            pre_top_k=pre_top_k,
            interpret=jax.default_backend() != "tpu")
    return combined_nms(boxes, scores, iou_threshold=iou_threshold,
                        score_threshold=score_threshold,
                        max_per_class=max_total, max_total=max_total,
                        pre_top_k=pre_top_k)
