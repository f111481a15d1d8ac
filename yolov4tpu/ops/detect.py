"""Fused detection postprocess: raw head grids -> combined-NMS outputs.

The decomposed inference path (``models.head.decode_head`` ->
``flatten_boxes_scores`` -> ``combined_nms_fast``) materialises, for every
one of the N=10,647 anchor boxes, its decoded corners (B,N,4) and all C class
scores (B,N,C) — ~0.9 GB of HBM traffic per 128-image batch that the NMS
immediately reduces to 256 candidates.  This module fuses the reduction into
the decode (the TPU replacement for the reference's monolithic TF C++
postprocess, reference custom_layers.py:221-297):

  1. per scale: best-class score sigmoid(obj)*sigmoid(max_c logit) — a single
     (B, N_s) VPU map over the raw grid, no per-class sigmoid, no box math
     (sigmoid is monotone, so max-then-sigmoid == sigmoid-then-max);
  2. per scale top-k, then a global top-K merge of the 3*K survivors
     (the global top-K is a subset of the union of per-scale top-Ks, so this
     is exactly the same candidate set as a global top-K over all N);
  3. decode boxes and full class scores for the K candidates ONLY
     (identical formulas to models/head.get_boxes: inference decode with
     xyscale, reference custom_layers.py:251-257);
  4. the shared candidate-NMS tail (``nms_pallas.nms_from_candidates``):
     per-class ranks, VMEM-resident Pallas suppression, global merge.

Output-identical to running the decomposed path with ``combined_nms_fast``
(verified by tests/test_detect.py); both are exact vs TF combined-NMS
semantics whenever at most K boxes clear the score threshold on their best
class — always true for a trained detector at the reference operating point
(score 0.3, max 100 outputs; reference config.py:14-16).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .nms_pallas import nms_from_candidates


@functools.lru_cache(maxsize=16)
def _scale_meta(grid_h: int, grid_w: int, anchors: Tuple[Tuple[float, float], ...],
                stride: int, xyscale: float) -> np.ndarray:
    """Per-box decode constants for one scale, flattened in (row, col, anchor)
    order — the same order ``raw.reshape(B, g*g*3, 5+C)`` flattens the grid.

    Columns: [grid_x, grid_y, anchor_w, anchor_h, stride, xyscale], (N_s, 6).
    """
    ys, xs = np.meshgrid(np.arange(grid_h), np.arange(grid_w), indexing="ij")
    n_anchor = len(anchors)
    meta = np.empty((grid_h, grid_w, n_anchor, 6), np.float32)
    meta[..., 0] = xs[:, :, None]
    meta[..., 1] = ys[:, :, None]
    meta[..., 2] = np.asarray([a[0] for a in anchors], np.float32)
    meta[..., 3] = np.asarray([a[1] for a in anchors], np.float32)
    meta[..., 4] = stride
    meta[..., 5] = xyscale
    return meta.reshape(-1, 6)


def detect_fused(
    raw_outputs: Sequence[jnp.ndarray], anchors_grouped, num_classes: int,
    strides: Sequence[int], xyscale: Sequence[float], img_size: int,
    iou_threshold: float = 0.413, score_threshold: float = 0.3,
    max_per_class: int = 100, max_total: int = 100, candidates: int = 256,
    clip: bool = True, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Raw head grids -> (nmsed_boxes, nmsed_scores, nmsed_classes,
    valid_detections), decoding only the top-``candidates`` boxes.

    raw_outputs: [sbbox, mbbox, lbbox] raw (B, g, g, 3*(5+C)) conv outputs.
    anchors_grouped: (3, 3, 2) pixel-unit anchors (static).
    """
    anchors = tuple(tuple(tuple(float(v) for v in a) for a in scale)
                    for scale in np.asarray(anchors_grouped, np.float32))
    return _detect_fused(tuple(raw_outputs), anchors, num_classes,
                         tuple(int(s) for s in strides),
                         tuple(float(x) for x in xyscale), int(img_size),
                         float(iou_threshold), float(score_threshold),
                         int(max_per_class), int(max_total), int(candidates),
                         bool(clip), bool(interpret))


@functools.partial(jax.jit, static_argnums=tuple(range(1, 13)))
def _detect_fused(raw_outputs, anchors, num_classes, strides, xyscale,
                  img_size, iou_threshold, score_threshold, max_per_class,
                  max_total, candidates, clip, interpret):
    anchors_np = np.asarray(anchors, np.float32)
    k = candidates

    vals, logits, metas = [], [], []
    for i, raw in enumerate(raw_outputs):
        b, gh, gw = raw.shape[0], raw.shape[1], raw.shape[2]
        n_anchor = anchors_np.shape[1]
        flat = raw.reshape(b, gh * gw * n_anchor, 5 + num_classes)
        # Best-class candidate score: one max + two sigmoids per box.
        best = (jax.nn.sigmoid(flat[..., 4])
                * jax.nn.sigmoid(jnp.max(flat[..., 5:], axis=-1)))
        ks = min(k, flat.shape[1])
        v, idx = lax.top_k(best, ks)                       # (B, Ks)
        vals.append(v)
        logits.append(jnp.take_along_axis(flat, idx[..., None], axis=1))
        meta = jnp.asarray(_scale_meta(
            int(gh), int(gw), tuple(map(tuple, anchors_np[i])),
            int(strides[i]), float(xyscale[i])))
        metas.append(jnp.take(meta, idx, axis=0))          # (B, Ks, 6)

    vals = jnp.concatenate(vals, axis=1)                   # (B, sum Ks)
    logits = jnp.concatenate(logits, axis=1)               # (B, sum Ks, 5+C)
    metas = jnp.concatenate(metas, axis=1)                 # (B, sum Ks, 6)

    kk = min(k, vals.shape[1])
    _, sel = lax.top_k(vals, kk)                           # (B, K)
    logits = jnp.take_along_axis(logits, sel[..., None], axis=1)
    metas = jnp.take_along_axis(metas, sel[..., None], axis=1)

    # Candidate decode (reference inference decode, custom_layers.py:251-257).
    grid = metas[..., 0:2]
    anchor_wh = metas[..., 2:4]
    stride = metas[..., 4:5]
    xysc = metas[..., 5:6]
    xy = ((jax.nn.sigmoid(logits[..., 0:2]) * xysc)
          - 0.5 * (xysc - 1.0) + grid) * stride
    wh = jnp.exp(logits[..., 2:4]) * anchor_wh
    cand_boxes = jnp.concatenate([xy - wh / 2.0, xy + wh / 2.0],
                                 axis=-1) / float(img_size)
    cand_scores = (jax.nn.sigmoid(logits[..., 4:5])
                   * jax.nn.sigmoid(logits[..., 5:]))      # (B, K, C)

    return nms_from_candidates(cand_boxes, cand_scores, iou_threshold,
                               score_threshold, max_per_class, max_total,
                               clip, interpret)
