"""Post-training int8 quantization for the inference path.

TPU v5e's MXU runs int8xint8->int32 at twice the bf16 rate (measured on this
stack: a representative 3x3 s1 conv hits 272 TOP/s int8 vs 150 TFLOP/s bf16,
1.8x).  This module turns the BN-folded inference params (network.fold_bn)
into an int8 program:

  - weights: per-output-channel symmetric int8 (scale = max|w[...,c]| / 127),
  - activations: per-tensor symmetric int8 with STATIC scales calibrated by
    running representative images through the bf16 folded model and recording
    the max-abs input of every conv (``calibrate``),
  - each eligible conv becomes  quantize -> int8 conv (int32 accumulate) ->
    dequantize+bias+activation  in one XLA fusion; the tensors BETWEEN ops
    stay in ``compute_dtype``, so routes/concats/maxpools are untouched.

Kept in high precision (standard PTQ practice, and cheap — they are a tiny
share of the FLOPs): the two stem convs (tiny channel counts; also keeps the
space-to-depth stem reparametrisation available) and the three bias-carrying
head convs (raw logits feed the decode that must stay accurate).

This is an OPT-IN speed path: int8 does not meet the 1e-3 per-box golden
fidelity contract the bf16 path honors (reference custom_layers.py:201-298);
accuracy is validated detection-level instead (tests/test_quantize.py: same
classes, high box IoU vs the bf16 path on calibrated detectors).

The reference has no quantization story; this is north-star work
(BASELINE.json: "Target: >=5k 416^2 images/sec end-to-end").
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import topology
from .network import Params, _FoldedApplyOps, conv_specs

# Symmetric int8 range.  -127..127 (not -128): keeps the code symmetric and
# loses nothing measurable.
QMAX = 127.0


def _eligible(index: int, batch_norm: bool) -> bool:
    """Quantize every BN conv except the two stem convs; the head convs
    (batch_norm=False in the topology) stay high-precision."""
    return batch_norm and index >= 2


# ---------------------------------------------------------------------------
# Calibration: record per-conv input max-abs through the folded forward
# ---------------------------------------------------------------------------

class _CalibApplyOps(_FoldedApplyOps):
    """Folded apply that also records max|input| of every conv call.

    amax entries are traced scalars, so the whole calibration pass is one
    jittable program per batch.  Runs with the s2d stem fusion OFF so the
    record is exactly one entry per conv in serial order.
    """

    def __init__(self, params, compute_dtype=jnp.float32, s2d_stem=False):
        assert not s2d_stem, "calibration needs the plain 1:1 conv order"
        super().__init__(params, compute_dtype, s2d_stem=False)
        self.amax: List[jnp.ndarray] = []

    def conv(self, x, filters, kernel_size, downsampling=False,
             activation="leaky", batch_norm=True):
        self.amax.append(jnp.max(jnp.abs(x)).astype(jnp.float32))
        return super().conv(x, filters, kernel_size,
                            downsampling=downsampling,
                            activation=activation, batch_norm=batch_norm)


def calibrate(folded_params: Params, images, num_classes: int,
              compute_dtype=jnp.bfloat16,
              csp_repeats=topology.DEFAULT_CSP_REPEATS,
              batch_size: int = 8) -> np.ndarray:
    """Per-conv activation scales from representative images.

    images: (N,H,W,3) float [0,1] — a few dozen frames from the target
    distribution suffice for max-abs calibration.  Returns float32
    ``act_scales`` of shape (num_convs,): max|conv input| / 127, the
    elementwise max over all calibration batches.
    """
    @jax.jit
    def one_batch(folded, imgs):
        ops = _CalibApplyOps(folded, compute_dtype, s2d_stem=False)
        topology.yolov4(ops, imgs, num_classes, csp_repeats)
        return jnp.stack(ops.amax)

    images = np.asarray(images, np.float32)
    amax = None
    for s in range(0, len(images), batch_size):
        a = np.asarray(one_batch(folded_params,
                                 jnp.asarray(images[s:s + batch_size])))
        amax = a if amax is None else np.maximum(amax, a)
    # Guard all-zero inputs (dead calibration set): scale 1 keeps the
    # quantizer well-defined.
    amax = np.where(amax > 0, amax, QMAX)
    return (amax / QMAX).astype(np.float32)


# ---------------------------------------------------------------------------
# Weight quantization
# ---------------------------------------------------------------------------

def quantize_folded(folded_params: Params, act_scales,
                    num_classes: int,
                    csp_repeats=topology.DEFAULT_CSP_REPEATS) -> Params:
    """Folded params + calibrated activation scales -> int8 param pytree.

    Eligible convs become ``{"wq": int8 HWIO, "b": f32, "out_scale":
    f32[c_out] (= act_scale * w_scale[c]), "inv_sx": f32 scalar}``; the rest
    keep their float ``{"w", "b"}`` and run exactly as in apply_folded.
    """
    specs = conv_specs(num_classes, tuple(csp_repeats))
    act_scales = np.asarray(act_scales, np.float32)
    if len(act_scales) != len(specs):
        raise ValueError(f"act_scales has {len(act_scales)} entries, "
                         f"topology has {len(specs)} convs")
    out = []
    for spec, p, sx in zip(specs, folded_params["convs"], act_scales):
        if not _eligible(spec.index, spec.batch_norm):
            out.append({"w": p["w"], "b": p["b"]})
            continue
        w = np.asarray(p["w"], np.float32)
        sw = np.max(np.abs(w), axis=(0, 1, 2)) / QMAX           # per out-ch
        sw = np.where(sw > 0, sw, 1.0).astype(np.float32)
        wq = np.clip(np.rint(w / sw[None, None, None, :]),
                     -QMAX, QMAX).astype(np.int8)
        out.append({
            "wq": jnp.asarray(wq),
            "b": jnp.asarray(p["b"], jnp.float32),
            "out_scale": jnp.asarray(sx * sw, jnp.float32),
            "inv_sx": jnp.float32(1.0 / sx),
        })
    return {"convs": out}


# ---------------------------------------------------------------------------
# Quantized apply
# ---------------------------------------------------------------------------

class _QuantizedApplyOps(_FoldedApplyOps):
    """Apply backend over quantize_folded params.

    int8 convs: the input is scaled/rounded to int8 in the conv's prologue,
    accumulated in int32 on the MXU's double-rate path, and dequantized in
    the epilogue (one multiply by the combined scale, bias add, activation)
    — all fused by XLA around the conv.  The symmetric zero point means the
    darknet downsample zero-padding is exact in the quantized domain.
    """

    def conv(self, x, filters, kernel_size, downsampling=False,
             activation="leaky", batch_norm=True):
        # The s2d stem fusion consumes TWO convs in one call and marks the
        # next topology call as activation-only (_skip_next); that bookkeeping
        # lives in the parent — it must run before any param peeking here.
        if "wq" not in self.convs[self.i] or getattr(self, "_skip_next", False):
            return super().conv(x, filters, kernel_size,
                                downsampling=downsampling,
                                activation=activation, batch_norm=batch_norm)
        p = self.convs[self.i]
        self.i += 1
        if downsampling:
            stride, padding = 2, ((1, 0), (1, 0))
        else:
            stride, padding = 1, "SAME"
        # Prologue: static-scale symmetric quantization.  Saturating clip to
        # +-127; round-to-nearest(-even, matching the host-side weight rint).
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * p["inv_sx"]),
                      -QMAX, QMAX).astype(jnp.int8)
        y = lax.conv_general_dilated(
            xq, p["wq"], window_strides=(stride, stride), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        # Epilogue: dequantize + bias in f32, then down to compute dtype.
        y = (y.astype(jnp.float32) * p["out_scale"] + p["b"]).astype(self.dtype)
        if activation == "mish":
            from .network import _mish
            y = _mish(y)
        elif activation == "leaky":
            y = jax.nn.leaky_relu(y, negative_slope=0.1)
        return y


def apply_quantized(qparams: Params, images, num_classes: int,
                    compute_dtype=jnp.bfloat16,
                    csp_repeats=topology.DEFAULT_CSP_REPEATS,
                    s2d_stem: bool = True):
    """Inference forward over int8 params: images -> [sbbox, mbbox, lbbox].

    Drop-in for network.apply_folded (same raw-grid contract, reference
    custom_layers.py:141-198); the s2d stem still applies because the stem
    convs are kept in float.
    """
    ops = _QuantizedApplyOps(qparams, compute_dtype, s2d_stem=s2d_stem)
    outs = topology.yolov4(ops, images, num_classes, csp_repeats)
    return [o.astype(jnp.float32) for o in outs]


def quantize(folded_params: Params, calib_images, num_classes: int,
             compute_dtype=jnp.bfloat16,
             csp_repeats=topology.DEFAULT_CSP_REPEATS) -> Tuple[Params, np.ndarray]:
    """One-call PTQ: calibrate activation scales, quantize weights.

    Returns (qparams, act_scales); keep act_scales to re-quantize after a
    weight update (api.Yolov4.sync_params does) without re-running
    calibration.
    """
    scales = calibrate(folded_params, calib_images, num_classes,
                       compute_dtype, csp_repeats)
    return quantize_folded(folded_params, scales, num_classes,
                           csp_repeats), scales
