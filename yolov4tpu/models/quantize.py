"""Post-training int8 quantization for the inference path.

TPU v5e's MXU runs int8xint8->int32 at twice the bf16 rate (measured on this
stack: a representative 3x3 s1 conv hits 272 TOP/s int8 vs 150 TFLOP/s bf16,
1.8x).  This module turns the BN-folded inference params (network.fold_bn)
into an int8 program.  Two dataflows share one calibration:

- ``dataflow="bf16"``: tensors BETWEEN ops stay in compute dtype; each
  eligible conv quantizes its input in its prologue and dequantizes in its
  epilogue.  Simple, and routes/concats/maxpools are untouched — but every
  activation still crosses HBM at 2 bytes.
- ``dataflow="int8"`` (default): tensors between ops are int8 with a STATIC
  per-tensor scale — conv epilogues requantize directly to the output
  tensor's calibrated scale, consumers take int8 input with no prologue,
  maxpool/upsample run natively on int8 (monotone ops commute with
  symmetric quantization), concat rescales branches to the max branch scale,
  residual adds dequant-add-requant.  Activation HBM traffic halves.

Scales: weights per-output-channel symmetric (max|w[...,c]|/127);
activations per-tensor symmetric with STATIC scales calibrated by running
representative images through the float folded model and recording per-conv
input/output and per-add output max-abs (``calibrate``).

Kept in high precision (standard PTQ practice, and cheap — they are a tiny
share of the FLOPs): the two stem convs (tiny channel counts; also keeps the
space-to-depth stem reparametrisation available) and the three bias-carrying
head convs (raw logits feed the decode that must stay accurate).

This is an OPT-IN speed path: int8 does not meet the 1e-3 per-box golden
fidelity contract the bf16 path honors (reference custom_layers.py:201-298);
accuracy is validated detection-level (tests/test_quantize.py) and through
the trained-model mAP check in benchmarks/sanity_overfit.py.

The reference has no quantization story; this is north-star work
(BASELINE.json: "Target: >=5k 416^2 images/sec end-to-end").
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import topology
from .network import Params, _FoldedApplyOps, _mish, conv_specs

# Symmetric int8 range.  -127..127 (not -128): keeps the code symmetric and
# loses nothing measurable.
QMAX = 127.0


def _eligible(index: int, batch_norm: bool) -> bool:
    """Quantize every BN conv except the two stem convs; the head convs
    (batch_norm=False in the topology) stay high-precision."""
    return batch_norm and index >= 2


def _act(y, activation):
    if activation == "mish":
        return _mish(y)
    if activation == "leaky":
        return jax.nn.leaky_relu(y, negative_slope=0.1)
    return y


# ---------------------------------------------------------------------------
# Calibration: record per-tensor max-abs through the folded forward
# ---------------------------------------------------------------------------

class _CalibApplyOps(_FoldedApplyOps):
    """Folded apply that records max|x| of every conv input/output and every
    residual-add output, in deterministic traversal order.

    The records are traced scalars, so the whole calibration pass is one
    jittable program per batch.  Runs with the s2d stem fusion OFF so the
    conv records are exactly one entry per conv in serial order.
    """

    def __init__(self, params, compute_dtype=jnp.float32, s2d_stem=False,
                 quantile: Optional[float] = None):
        assert not s2d_stem, "calibration needs the plain 1:1 conv order"
        super().__init__(params, compute_dtype, s2d_stem=False)
        self.conv_in: List[jnp.ndarray] = []
        self.conv_out: List[jnp.ndarray] = []
        self.add_out: List[jnp.ndarray] = []
        # None -> exact max-abs; q in (0,1] -> that quantile of |x| (clips
        # the outlier tail — max-abs is fragile on heavy-tailed trained
        # activations, where one spike inflates the scale and crushes the
        # resolution of everything else).
        self.quantile = quantile

    def _amax(self, x):
        ax = jnp.abs(x).astype(jnp.float32)
        if self.quantile is None:
            return jnp.max(ax)
        flat = ax.ravel()
        if flat.size > 65536:
            # Deterministic strided subsample: a tail quantile needs the
            # distribution's shape, not every element — full sorts of
            # multi-MB activations would dominate the (offline) pass.
            flat = flat[::-(-flat.size // 65536)]
        return jnp.quantile(flat, self.quantile)

    def conv(self, x, filters, kernel_size, downsampling=False,
             activation="leaky", batch_norm=True):
        self.conv_in.append(self._amax(x))
        y = super().conv(x, filters, kernel_size,
                         downsampling=downsampling,
                         activation=activation, batch_norm=batch_norm)
        self.conv_out.append(self._amax(y))
        return y

    def add(self, a, b):
        y = super().add(a, b)
        self.add_out.append(self._amax(y))
        return y


def calibrate(folded_params: Params, images, num_classes: int,
              compute_dtype=jnp.bfloat16,
              csp_repeats=topology.DEFAULT_CSP_REPEATS,
              batch_size: int = 8,
              method: str = "max",
              percentile: float = 99.9) -> Dict[str, np.ndarray]:
    """Per-tensor activation scales from representative images.

    images: (N,H,W,3) float [0,1] — a few dozen frames from the target
    distribution suffice.  Returns float32 scale arrays
    ``{"conv_in": (n_convs,), "conv_out": (n_convs,), "add_out":
    (n_adds,)}``, elementwise max over all calibration batches of:

    - ``method="max"``: max|tensor| / 127 (exact range; fragile when a
      trained distribution has a heavy outlier tail — one spike inflates
      the scale and quantization resolution collapses for the bulk).
    - ``method="percentile"``: the ``percentile`` (default 99.9) quantile
      of |tensor| / 127 — saturates the outlier tail instead, trading a
      few clipped activations for 8-bit resolution where the mass is.
    """
    if method == "max":
        q = None
    elif method == "percentile":
        if not 0.0 < percentile <= 100.0:
            raise ValueError(f"percentile must be in (0, 100], "
                             f"got {percentile}")
        q = percentile / 100.0
    else:
        raise ValueError(
            f"method must be 'max' or 'percentile', got {method!r}")

    @jax.jit
    def one_batch(folded, imgs):
        ops = _CalibApplyOps(folded, compute_dtype, s2d_stem=False,
                             quantile=q)
        topology.yolov4(ops, imgs, num_classes, csp_repeats)
        return (jnp.stack(ops.conv_in), jnp.stack(ops.conv_out),
                jnp.stack(ops.add_out) if ops.add_out
                else jnp.zeros((0,), jnp.float32))

    images = np.asarray(images, np.float32)
    amax = None
    for s in range(0, len(images), batch_size):
        rec = [np.asarray(a) for a in
               one_batch(folded_params, jnp.asarray(images[s:s + batch_size]))]
        amax = rec if amax is None else [np.maximum(a, b)
                                         for a, b in zip(amax, rec)]

    def to_scale(a):
        # Guard all-zero tensors (dead calibration set): scale 1 keeps the
        # quantizer well-defined.
        a = np.where(a > 0, a, QMAX)
        return (a / QMAX).astype(np.float32)

    return {"conv_in": to_scale(amax[0]), "conv_out": to_scale(amax[1]),
            "add_out": to_scale(amax[2])}


# ---------------------------------------------------------------------------
# Weight quantization
# ---------------------------------------------------------------------------

def quantize_folded(folded_params: Params, act_scales: Dict[str, np.ndarray],
                    num_classes: int,
                    csp_repeats=topology.DEFAULT_CSP_REPEATS) -> Params:
    """Folded params + calibrated activation scales -> int8 param pytree.

    Eligible convs become ``{"wq": int8 HWIO, "b": f32, "sw": f32[c_out]
    (per-channel weight scales)}``; the rest keep their float ``{"w", "b"}``
    and run exactly as in apply_folded.  The activation scales ride along
    as ``qparams["scales"]`` for checkpointing; apply takes them STATICALLY
    (closed into the jit) so requantization factors and concat-rescale
    decisions constant-fold.
    """
    specs = conv_specs(num_classes, tuple(csp_repeats))
    n = len(specs)
    if len(act_scales["conv_in"]) != n or len(act_scales["conv_out"]) != n:
        raise ValueError(
            f"act_scales cover {len(act_scales['conv_in'])} convs, "
            f"topology has {n}")
    out = []
    for spec, p in zip(specs, folded_params["convs"]):
        if not _eligible(spec.index, spec.batch_norm):
            out.append({"w": p["w"], "b": p["b"]})
            continue
        w = np.asarray(p["w"], np.float32)
        sw = np.max(np.abs(w), axis=(0, 1, 2)) / QMAX           # per out-ch
        sw = np.where(sw > 0, sw, 1.0).astype(np.float32)
        wq = np.clip(np.rint(w / sw[None, None, None, :]),
                     -QMAX, QMAX).astype(np.int8)
        out.append({"wq": jnp.asarray(wq),
                    "b": jnp.asarray(p["b"], jnp.float32),
                    "sw": jnp.asarray(sw)})
    return {"convs": out,
            "scales": {k: np.asarray(v, np.float32)
                       for k, v in act_scales.items()}}


# ---------------------------------------------------------------------------
# Quantized apply — bf16 dataflow (v1): quantize/dequantize around each conv
# ---------------------------------------------------------------------------

class _QuantizedApplyOps(_FoldedApplyOps):
    """int8 convs with compute-dtype tensors between ops.

    Each eligible conv: prologue static-scale quantize -> int8 conv (int32
    accumulate on the MXU's double-rate path) -> epilogue dequant + bias +
    activation — all fused by XLA around the conv.  The symmetric zero
    point means the darknet downsample zero-padding is exact in the
    quantized domain.
    """

    def __init__(self, params, scales, compute_dtype=jnp.float32,
                 s2d_stem=False):
        super().__init__(params, compute_dtype, s2d_stem=s2d_stem)
        self.scales = scales

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
        s_in = float(self.scales["conv_in"][self.i])
        self.i += 1
        stride, padding = ((2, ((1, 0), (1, 0))) if downsampling
                           else (1, "SAME"))
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s_in)),
                      -QMAX, QMAX).astype(jnp.int8)
        y = lax.conv_general_dilated(
            xq, p["wq"], window_strides=(stride, stride), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * (s_in * p["sw"]) + p["b"]).astype(self.dtype)
        return _act(y, activation)


# ---------------------------------------------------------------------------
# Quantized apply — int8 dataflow: tensors between ops stay int8
# ---------------------------------------------------------------------------

class _QVal:
    """int8 tensor + its static per-tensor scale (a Python float, so every
    scale factor constant-folds at trace time)."""

    __slots__ = ("q", "scale")

    def __init__(self, q, scale: float):
        self.q = q
        self.scale = float(scale)

    @property
    def shape(self):
        return self.q.shape


class _QuantizedFlowOps(_FoldedApplyOps):
    """int8 convs AND int8 inter-op tensors.

    Values are either _QVal (int8 + static scale) in the quantized region or
    plain compute-dtype arrays at the float boundaries (stem, heads).  Conv
    epilogues requantize straight to the output tensor's calibrated scale;
    maxpool/upsample act on int8 natively (monotone / data-movement — they
    commute with symmetric quantization exactly); concat rescales the
    non-max branches; residual adds dequant-add-requant.  Inter-op HBM
    traffic is 1 byte/element instead of 2.
    """

    def __init__(self, params, scales, compute_dtype=jnp.float32,
                 s2d_stem=False):
        super().__init__(params, compute_dtype, s2d_stem=s2d_stem)
        self.scales = scales
        self.add_i = 0

    def _deq(self, x):
        return (x.q.astype(self.dtype) * jnp.asarray(x.scale, self.dtype)
                if isinstance(x, _QVal) else x)

    @staticmethod
    def _requant(f, scale: float):
        q = jnp.clip(jnp.round(f.astype(jnp.float32) * (1.0 / scale)),
                     -QMAX, QMAX).astype(jnp.int8)
        return _QVal(q, scale)

    def conv(self, x, filters, kernel_size, downsampling=False,
             activation="leaky", batch_norm=True):
        if "wq" not in self.convs[self.i] or getattr(self, "_skip_next", False):
            return super().conv(self._deq(x), filters, kernel_size,
                                downsampling=downsampling,
                                activation=activation, batch_norm=batch_norm)
        p = self.convs[self.i]
        i = self.i
        self.i += 1
        if isinstance(x, _QVal):
            q, s_in = x.q, x.scale
        else:
            s_in = float(self.scales["conv_in"][i])
            q = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s_in)),
                         -QMAX, QMAX).astype(jnp.int8)
        stride, padding = ((2, ((1, 0), (1, 0))) if downsampling
                           else (1, "SAME"))
        y = lax.conv_general_dilated(
            q, p["wq"], window_strides=(stride, stride), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        f = (y.astype(jnp.float32) * (s_in * p["sw"]) + p["b"]).astype(self.dtype)
        return self._requant(_act(f, activation),
                             float(self.scales["conv_out"][i]))

    def maxpool(self, x, pool: int):
        if not isinstance(x, _QVal):
            return super().maxpool(x, pool)
        # max commutes with the (monotone, zero-point-0) dequantization, so
        # pooling runs natively on int8 — 1-byte window traffic.
        q = lax.reduce_window(
            x.q, np.int8(-128), lax.max, window_dimensions=(1, pool, pool, 1),
            window_strides=(1, 1, 1, 1), padding="SAME")
        return _QVal(q, x.scale)

    def upsample(self, x):
        if not isinstance(x, _QVal):
            return super().upsample(x)
        return _QVal(super().upsample(x.q), x.scale)

    def concat(self, xs):
        if not all(isinstance(v, _QVal) for v in xs):
            return super().concat([self._deq(v) for v in xs])
        s_cat = max(v.scale for v in xs)
        parts = []
        for v in xs:
            if v.scale == s_cat:
                parts.append(v.q)
            else:
                # rebin to the common scale; |q'| <= |q| since scale grows,
                # so no clip is needed
                r = jnp.asarray(v.scale / s_cat, jnp.float32)
                parts.append(jnp.round(v.q.astype(jnp.float32) * r)
                             .astype(jnp.int8))
        return _QVal(jnp.concatenate(parts, axis=-1), s_cat)

    def add(self, a, b):
        i = self.add_i
        self.add_i += 1
        if not (isinstance(a, _QVal) and isinstance(b, _QVal)):
            return super().add(self._deq(a), self._deq(b))
        f = (a.q.astype(self.dtype) * jnp.asarray(a.scale, self.dtype)
             + b.q.astype(self.dtype) * jnp.asarray(b.scale, self.dtype))
        return self._requant(f, float(self.scales["add_out"][i]))


def apply_quantized(qparams: Params, images, num_classes: int,
                    compute_dtype=jnp.bfloat16,
                    csp_repeats=topology.DEFAULT_CSP_REPEATS,
                    s2d_stem: bool = True,
                    scales: Optional[Dict[str, np.ndarray]] = None,
                    dataflow: str = "int8"):
    """Inference forward over int8 params: images -> [sbbox, mbbox, lbbox].

    Drop-in for network.apply_folded (same raw-grid contract, reference
    custom_layers.py:141-198); the s2d stem still applies because the stem
    convs are kept in float.

    scales: the calibration dict, used STATICALLY — pass concrete numpy
    values (e.g. the ones stored in ``qparams["scales"]`` BEFORE any
    device_put/jit boundary turns them into tracers).  None reads them from
    qparams, which therefore must hold concrete arrays.
    dataflow: "int8" keeps inter-op tensors int8 (see _QuantizedFlowOps);
    "bf16" is the conservative per-conv scheme.
    """
    if scales is None:
        scales = qparams["scales"]
    scales = {k: np.asarray(v) for k, v in scales.items()}
    cls = {"int8": _QuantizedFlowOps, "bf16": _QuantizedApplyOps}[dataflow]
    ops = cls(qparams, scales, compute_dtype, s2d_stem=s2d_stem)
    outs = topology.yolov4(ops, images, num_classes, csp_repeats)
    return [o.astype(jnp.float32) for o in outs]


def quantize(folded_params: Params, calib_images, num_classes: int,
             compute_dtype=jnp.bfloat16,
             csp_repeats=topology.DEFAULT_CSP_REPEATS,
             ) -> Tuple[Params, Dict[str, np.ndarray]]:
    """One-call PTQ: calibrate activation scales, quantize weights.

    Returns (qparams, act_scales); keep act_scales to re-quantize after a
    weight update (api.Yolov4.sync_params does) without re-running
    calibration.
    """
    scales = calibrate(folded_params, calib_images, num_classes,
                       compute_dtype, csp_repeats)
    return quantize_folded(folded_params, scales, num_classes,
                           csp_repeats), scales
