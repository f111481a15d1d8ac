"""AOT export / serving for the fused inference pipeline (``jax.export``).

The reference's deployment artifact was a keras SavedModel of the raw conv
model (reference models.py:92-93) — which still needed the Python package at
serve time to rebuild head decode + NMS around it.  The TPU-native story is
ahead-of-time export: the complete BN-folded forward + decode + combined-NMS
program, with the weights baked in as constants, serializes to ONE portable
StableHLO artifact.  Loading it needs nothing but jax — not this package,
not the original Python, not the weight files.

Typical flow::

    model = Yolov4(weight_path="yolov4.weights", class_name_path=...)
    serving.export_detector(model, "yolov4_b8.shlo", batch_size=8)
    ...
    detect = serving.load_detector("yolov4_b8.shlo")
    boxes, scores, classes, valid = detect(images)   # (8,416,416,3) float32

The exported program is specialized to one (batch, height, width) shape and
one platform (the backend it was exported under, by default) — the usual
AOT serving contract.  Export under multiple platforms with
``platforms=("tpu", "cpu")`` when the artifact must run on both.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence


def export_detector(model, path: str, batch_size: int = 1,
                    platforms: Optional[Sequence[str]] = None,
                    iou_threshold: Optional[float] = None,
                    score_threshold: Optional[float] = None,
                    input_dtype: str = "float32"):
    """Serialize ``model``'s full inference pipeline to ``path``.

    model: a built ``yolov4tpu.Yolov4``.  Its BN-folded parameters are baked
    into the artifact as constants.  Returns the ``jax.export.Exported``.

    input_dtype: "float32" ([0,1] images, the classic contract) or "uint8"
    — bakes the /255 into the artifact so serving hosts ship raw resized
    rasters, 4x less transfer per request (the uint8 wire; see
    YoloConfig.transfer_uint8).
    """
    import jax
    import jax.numpy as jnp

    if input_dtype not in ("float32", "uint8"):
        raise ValueError(
            f"input_dtype must be 'float32' or 'uint8', got {input_dtype!r}")
    cfg = model.config
    iou_t = cfg.iou_threshold if iou_threshold is None else float(iou_threshold)
    score_t = (cfg.score_threshold if score_threshold is None
               else float(score_threshold))
    if platforms is None:
        platforms = (jax.default_backend(),)
    platforms = tuple(platforms)

    # The Pallas NMS kernels lower differently per platform (Mosaic custom
    # call on TPU, interpret-mode scan elsewhere), so the interpret flag must
    # follow the artifact's TARGET platform, not the exporting host's
    # backend.  A mixed-platform export therefore cannot embed either form —
    # it needs the pure-XLA NMS.
    if cfg.nms_impl in ("fast", "pallas") and len(platforms) > 1:
        raise ValueError(
            "multi-platform export requires nms_impl='xla' (the Pallas NMS "
            f"kernel is single-platform); got nms_impl={cfg.nms_impl!r} "
            f"for platforms={platforms}")
    interpret = platforms != ("tpu",)

    from .api import build_infer_fn
    folded = model._folded
    # A quantized model (Yolov4.quantize) holds int8 params; the exported
    # artifact then bakes in the int8 program — int8 serving for free.
    infer_fn = build_infer_fn(
        cfg, model.num_classes, model._compute_dtype, interpret=interpret,
        quantized=getattr(model, "_act_scales", None),
        quantized_dataflow=getattr(model, "_q_dataflow", "int8"))

    def fn(images):
        return infer_fn(folded, images, iou_t, score_t)

    h, w, c = model.img_size
    spec = jax.ShapeDtypeStruct(
        (batch_size, h, w, c),
        jnp.uint8 if input_dtype == "uint8" else jnp.float32)
    exported = jax.export.export(jax.jit(fn),
                                 platforms=tuple(platforms))(spec)
    blob = exported.serialize()
    dirname = os.path.dirname(os.path.abspath(path))
    os.makedirs(dirname, exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return exported


def load_detector(path: str) -> Callable:
    """Load an artifact written by :func:`export_detector`.

    Returns ``detect(images) -> (boxes, scores, classes, valid_detections)``
    — same contract as ``Yolov4.predict_batch``.  The returned callable is
    jittable and composable like any JAX function, and carries the
    artifact's fixed input signature as ``detect.input_shape`` /
    ``detect.input_dtype`` (``jax.export`` enforces both strictly — a
    uint8-wire artifact rejects float input and vice versa, so callers
    must build their batch from these instead of guessing).
    """
    import jax
    import numpy as np

    with open(path, "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))

    def detect(images):
        return exported.call(images)

    aval = exported.in_avals[0]
    detect.input_shape = tuple(int(d) for d in aval.shape)
    detect.input_dtype = np.dtype(aval.dtype)
    return detect
