"""ctypes bindings for the native host-pipeline library (native/yolodata.cpp).

pybind11 is not in the image, so the C++ library exposes a plain C ABI and is
consumed through ctypes.  The shared object is built lazily with g++ on first
use and cached next to the source; every entry point has a numpy fallback so
the framework works (slower) on hosts without a toolchain.

Usage: ``from yolov4tpu import native; native.available()`` then
``native.resize_bilinear_batch`` / ``native.encode_labels_batch`` /
``native.assemble_batch``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "yolodata.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "build", "libyolodata.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        # Retry without OpenMP (toolchains missing libgomp).
        try:
            subprocess.run([c for c in cmd if c != "-fopenmp"], check=True,
                           capture_output=True, timeout=120)
            return True
        except (subprocess.SubprocessError, FileNotFoundError):
            return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        u8pp = ctypes.POINTER(ctypes.c_char_p)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.resize_bilinear_batch.argtypes = [
            u8pp, i32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.encode_labels_batch.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, i32p, ctypes.POINTER(f32p), f32p]
        lib.assemble_batch.argtypes = [
            u8pp, i32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.yolodata_num_threads.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    """True if the native library is built and loadable."""
    return _load() is not None


def num_threads() -> int:
    lib = _load()
    return lib.yolodata_num_threads() if lib is not None else 1


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _src_ptrs(images: Sequence[np.ndarray]):
    """Pack uint8 HWC images into (ptr array, hw array); keeps refs alive."""
    contig = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    ptrs = (ctypes.c_char_p * len(contig))(
        *[im.ctypes.data_as(ctypes.c_char_p) for im in contig])
    hw = np.asarray([[im.shape[0], im.shape[1]] for im in contig],
                    dtype=np.int32)
    return contig, ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_char_p)), hw


def resize_bilinear_batch(images: Sequence[np.ndarray],
                          target_hw: Tuple[int, int]) -> np.ndarray:
    """uint8 HWC images (any sizes) -> (B, H, W, 3) float32 in [0,1].

    cv2-compatible bilinear sampling; native when available, numpy+cv2
    fallback otherwise.
    """
    dh, dw = target_hw
    lib = _load()
    if lib is None:
        import cv2
        out = np.empty((len(images), dh, dw, 3), np.float32)
        for i, im in enumerate(images):
            out[i] = cv2.resize(im, (dw, dh)).astype(np.float32) / 255.0
        return out
    contig, ptrs, hw = _src_ptrs(images)
    out = np.empty((len(images), dh, dw, 3), np.float32)
    lib.resize_bilinear_batch(
        ptrs, hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), _f32p(out),
        len(contig), dh, dw)
    return out


def encode_labels_batch(true_boxes: np.ndarray, input_shape: Tuple[int, int],
                        anchors: np.ndarray, num_classes: int,
                        strides: Sequence[int] = (8, 16, 32)
                        ) -> Tuple[List[np.ndarray], np.ndarray]:
    """Native GT label encoder; same contract as data.encode.preprocess_true_boxes."""
    lib = _load()
    if lib is None:
        from .data.encode import preprocess_true_boxes
        return preprocess_true_boxes(true_boxes, input_shape, anchors,
                                     num_classes, strides)
    boxes = np.ascontiguousarray(true_boxes, np.float32)
    bs, max_boxes = boxes.shape[:2]
    h, w = int(input_shape[0]), int(input_shape[1])
    anchors = np.ascontiguousarray(anchors, np.float32)
    strides_a = np.asarray(strides, np.int32)
    grids = [np.zeros((bs, h // s, w // s, 3, 5 + num_classes), np.float32)
             for s in strides]
    xywh = np.empty((bs, max_boxes, 4), np.float32)
    grid_ptrs = (ctypes.POINTER(ctypes.c_float) * 3)(
        *[_f32p(g) for g in grids])
    lib.encode_labels_batch(
        _f32p(boxes), bs, max_boxes, h, w, _f32p(anchors), num_classes,
        strides_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), grid_ptrs,
        _f32p(xywh))
    return grids, xywh


def assemble_batch(images: Sequence[np.ndarray], boxes: np.ndarray,
                   target_hw: Tuple[int, int]
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Fused resize+normalise+box-rescale for a batch.

    images: list of uint8 HWC arrays; boxes: (B, max_boxes, 5) absolute
    coords in each source image.  Returns ((B,H,W,3) f32, rescaled boxes).
    """
    dh, dw = target_hw
    lib = _load()
    out_boxes = np.ascontiguousarray(boxes, np.float32).copy()
    if lib is None:
        import cv2
        imgs = np.empty((len(images), dh, dw, 3), np.float32)
        for i, im in enumerate(images):
            sh, sw = im.shape[:2]
            imgs[i] = cv2.resize(im, (dw, dh)).astype(np.float32) / 255.0
            out_boxes[i, :, [0, 2]] *= dw / sw
            out_boxes[i, :, [1, 3]] *= dh / sh
        return imgs, out_boxes
    contig, ptrs, hw = _src_ptrs(images)
    imgs = np.empty((len(images), dh, dw, 3), np.float32)
    lib.assemble_batch(
        ptrs, hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), _f32p(imgs),
        _f32p(out_boxes), len(contig), boxes.shape[1], dh, dw)
    return imgs, out_boxes
