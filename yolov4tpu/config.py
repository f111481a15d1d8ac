"""Typed, frozen configuration for the YOLOv4-TPU framework.

The reference keeps a single mutable module-global dict (``yolo_config``,
reference config.py:1-17) that is silently shared by the model facade and the
data pipeline (reference models.py:26-36, utils.py:135-138).  Here the config
is one frozen dataclass threaded explicitly through model, data pipeline and
trainer, so two consumers can never disagree.

Default values reproduce reference config.py:1-17 exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    """Hyperparameters for model topology, training and inference."""

    # --- Basic (reference config.py:3-6) ---
    img_size: Tuple[int, int, int] = (416, 416, 3)
    anchors: Tuple[int, ...] = (
        12, 16, 19, 36, 40, 28, 36, 75, 76, 55, 72, 146, 142, 110, 192, 243,
        459, 401,
    )
    strides: Tuple[int, ...] = (8, 16, 32)
    xyscale: Tuple[float, ...] = (1.2, 1.1, 1.05)

    # --- Training (reference config.py:9-11) ---
    iou_loss_thresh: float = 0.5
    batch_size: int = 8
    num_devices: int = 1  # reference calls this num_gpu; here: mesh data-axis size
    learning_rate: float = 1e-4  # reference models.py:83
    # Loss term weights (reference loss.py:131-133).
    loss_box_weight: float = 3.54
    loss_conf_weight: float = 64.3
    loss_prob_weight: float = 1.0
    # Optional extras the reference lists as TODOs (README.md:10-13).
    label_smoothing: float = 0.0
    use_mosaic: bool = False
    use_cutmix: bool = False
    # Darknet-style geometric/photometric train-time augmentation (the
    # reference implemented none): random horizontal flip with box remap,
    # HSV hue/saturation/exposure jitter.
    use_hflip: bool = False
    use_color_jitter: bool = False

    # Multi-scale training (darknet's random-resize schedule): every
    # multi_scale_interval batches the DataGenerator picks a square size
    # uniformly from [lo, hi] in steps of 32 (e.g. (320, 608)).  The jitted
    # train step retraces per distinct size (compile cache keeps it cheap).
    # The reference hard-coded its 52/26/13 label grids (models.py:56-58),
    # making this impossible there.  None disables.
    multi_scale: Optional[Tuple[int, int]] = None
    multi_scale_interval: int = 10
    # Self-adversarial training (reference README.md TODO): FGSM image
    # perturbation of strength sat_epsilon (in [0,1] pixel units) before the
    # weight update.  0 disables.
    sat_epsilon: float = 0.0

    # Gradient accumulation: the train step scans this many micro-batches
    # (batch pre-chunked by train.chunk_batch), averaging gradients — an
    # accum-times-larger effective batch at constant activation memory.
    grad_accum_steps: int = 1

    # On-device label encoding: the DataGenerator ships raw (B,max_boxes,5)
    # boxes and the jitted train step encodes the three anchor grids on the
    # accelerator (data.encode.encode_labels_jax) — the host pipeline stops
    # paying for the grid scatter (the reference's slowest host code,
    # reference utils.py:210-303) and the host->device transfer shrinks
    # ~45x (3 label grids -> one 100x5 box table per image).  Composes with
    # multi_scale: the step retraces per drawn size and the encoder's grid
    # shapes key off each trace's static image shape.
    encode_on_device: bool = False

    # Ship images to the device as uint8 and normalize (/255) INSIDE the
    # jitted step instead of sending host-normalized float32: 4x less
    # host->device traffic per batch (with encode_on_device, a 416^2 b64
    # batch drops ~200 MB -> ~33 MB on the wire).  Value-preserving: the
    # python path's cv2-resize output is uint8-quantized before the /255
    # anyway, so device-side /255 feeds the network the same values (the
    # u8 program fuses the /255, so compiled-program reassociation can
    # differ by ~1e-6 relative; the native fused path re-quantizes its
    # continuous f32 resize, <=1/510 per pixel).
    # Augmented (color-jittered/mosaic) samples re-quantize to uint8 — a
    # <=1/510 perturbation, below augmentation noise.  The train step
    # auto-detects the dtype, so hand-built uint8 batches work without
    # this flag; it switches what DataGenerator emits AND what the
    # inference loaders ship (predict_paths / export_prediction send
    # resized uint8 rasters — the float path resizes in uint8 BEFORE
    # dividing, so the device-side /255 sees the identical raster and
    # lands within 1 ulp of the host divide; letterbox
    # keeps the float wire, its gray-pad compositing is float).
    # predict_batch likewise auto-detects: pass a uint8 array, ride the
    # uint8 wire.
    transfer_uint8: bool = False

    # Flat-vector Adam (train.fused_adam): one raveled moment buffer instead
    # of ~330 leaf-wise kernels.  2x faster as a standalone update, but OFF
    # by default: inside the full train step the ravel is a barrier that
    # stops the update overlapping the backward pass tail, a net loss
    # (measured 36.5 -> 43 ms/step at 416^2 b8; see benchmarks/PERF_NOTES.md).
    # Useful where the update runs alone (e.g. gradient-accumulation reduce).
    fused_optimizer: bool = False

    # BN batch-statistic gradients: True (default) backprops through the
    # batch mean/var like keras BatchNormalization (reference parity math).
    # False treats the stats as constants in the backward pass — an opt-in
    # ~+10% train-step throughput (measured 212->237 img/s, 416^2 b16 bf16
    # on v5e); scale/shift still learn.  CONVERGENCE A/B (2026-08-19,
    # benchmarks/int8_realistic.py --bn-stats-gradient off, same seeds):
    # the default converged to 0.826/0.883 mAP (peak LR 2e-3/5e-4) while
    # False DIVERGED to NaN within 500 steps at 2e-3 and stalled at mAP
    # 0.002 (final loss 206) at 5e-4 — the stat-gradient chain is BN's
    # self-stabilizer (it shrinks the effective gradient of activations
    # that grow the batch variance).  Treat False as EXPERIMENT-ONLY: it
    # failed from-scratch training at every tested LR; see
    # benchmarks/PERF_NOTES.md "bn_stats_gradient A/B".
    bn_stats_gradient: bool = True

    # Pallas weight-gradient kernel for the 3x3 stride-1 convs in training:
    # the backward's wgrad convolutions (batch-space reductions into a tiny
    # 3x3 kernel) are XLA's weakest conv shape; the Pallas tap-GEMM kernel
    # (ops/wgrad_pallas.py) reads each activation slab once and keeps all
    # nine (Ci,Co) accumulators in VMEM.  Forward and data-gradient stay
    # XLA; numerics match XLA's wgrad (bf16 operands, f32 accumulation).
    pallas_wgrad: bool = False

    # Aspect-preserving letterbox resize (gray padding) instead of the
    # reference's stretch resize (reference utils.py:195).  Off by default
    # for parity; affects training pipeline, inference and eval export alike.
    letterbox: bool = False

    # --- Host ingest (SURVEY §7 hard part #4: the host must FEED the chip) ---
    # Parallel per-image host workers for decode+augment (cv2/libjpeg release
    # the GIL, so threads scale with cores).  None = os.cpu_count().  The
    # random stream is per-sample-seeded, so results are deterministic for a
    # given generator seed regardless of worker count or scheduling.
    num_workers: Optional[int] = None
    # Allow libjpeg DCT-domain 1/2,1/4,1/8 downscaling in the fused native
    # ingest when the source is much larger than the model input — large
    # photos decode up to ~8x faster (measured 14.5x end-to-end on a 4000px
    # photo -> 416^2).  Pixel values then differ slightly from full-decode +
    # resize (the IDCT acts as the anti-alias low-pass); set False for
    # bit-compatibility with the cv2 decode path.
    fast_decode: bool = True

    # Space-to-depth stem for BN-folded inference: runs the two stem convs
    # (3->32, 32->64 downsample) as dense block-space convs — exact
    # reparametrisation; ~6% faster small-batch latency, neutral at batch
    # 128 (network._s2d_stem_kernels).
    s2d_stem: bool = True

    # --- Inference (reference config.py:14-16) ---
    max_boxes: int = 100
    iou_threshold: float = 0.413
    score_threshold: float = 0.3

    # --- TPU-specific knobs (no reference equivalent) ---
    # Residual depth of the five CSP stages; (1,2,8,8,4) is the reference
    # CSPDarknet53 (custom_layers.py:108-128).  Smaller values give shallow
    # YOLOv4-style variants (same routes/strides/anchors) — fast dry runs,
    # light deployments.  Darknet .weights import requires the full depth.
    csp_repeats: Tuple[int, ...] = (1, 2, 8, 8, 4)
    compute_dtype: str = "float32"  # "bfloat16" for fast inference/training
    nms_pre_top_k: int = 256  # per-class candidates considered by NMS
    # NMS implementation: "fast" = global candidate reduction + Pallas
    # suppression kernel (production; exact at the reference operating point),
    # "pallas" = per-class top-k + Pallas kernel (TF-semantics-exact),
    # "xla" = pure-XLA reference implementation (runs anywhere, slowest).
    nms_impl: str = "fast"

    def __post_init__(self):
        # Same invariants the reference asserts (models.py:23-24).
        if self.img_size[0] != self.img_size[1]:
            raise ValueError("img_size must be square")
        if self.img_size[0] % self.strides[-1] != 0:
            raise ValueError("img_size must be a multiple of the last stride")
        if len(self.anchors) != 18:
            raise ValueError("expected 9 anchor (w, h) pairs")

    # --- Derived quantities ---
    @property
    def num_scales(self) -> int:
        return len(self.strides)

    @property
    def anchors_grouped(self) -> np.ndarray:
        """Anchors as (num_scales, 3, 2) pixel-unit array (reference models.py:29)."""
        return np.asarray(self.anchors, dtype=np.float32).reshape(3, 3, 2)

    @property
    def anchors_flat(self) -> np.ndarray:
        """Anchors as (9, 2) for label encoding (reference utils.py:138)."""
        return np.asarray(self.anchors, dtype=np.float32).reshape(9, 2)

    def grid_sizes(self, img_size: int | None = None) -> Tuple[int, ...]:
        """Feature-grid side length per scale.

        The reference hard-codes 52/26/13 in its training model
        (models.py:56-58); here they are always derived from img_size so any
        /32-divisible resolution trains.
        """
        side = self.img_size[0] if img_size is None else img_size
        return tuple(side // s for s in self.strides)

    def replace(self, **kw) -> "YoloConfig":
        return dataclasses.replace(self, **kw)


# Reference-parity default instance (mirrors reference config.py yolo_config).
DEFAULT_CONFIG = YoloConfig()
