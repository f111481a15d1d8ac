"""Darknet ``.weights`` import/export <-> param pytree.

Byte-layout parity with the reference loader (reference utils.py:12-53):

  header: 5 x int32 [major, minor, revision, seen, _]
  then, for each of the 110 conv layers in serial (creation) order:
    - BN layers: 4*filters float32 in darknet order [beta, gamma, mean, var]
    - bias layers (head convs, serial indices {93, 101, 109}): filters float32
    - conv kernel: filters*in_ch*k*k float32 in (out, in, h, w) order

The reference mapped file order onto Keras auto-generated layer names
(utils.py:20-21); here the mapping is an explicit ordered layout table built
from the topology trace (models/network.conv_specs), so it cannot silently
skew.  One pass builds the whole pytree host-side; a single ``device_put``
uploads it (the reference did 110 sequential host->device ``set_weights``
round trips, SURVEY §3.1).
"""

from __future__ import annotations

import io
from typing import BinaryIO, Tuple

import numpy as np

from .models.network import conv_specs


def _read(f: BinaryIO, count: int) -> np.ndarray:
    buf = f.read(count * 4)
    if len(buf) != count * 4:
        raise ValueError(
            f"truncated .weights file: wanted {count} floats, got {len(buf) // 4}")
    return np.frombuffer(buf, dtype=np.float32, count=count)


def load_darknet_weights(path_or_file, num_classes: int,
                         strict: bool = True) -> Tuple[dict, dict]:
    """Parse a darknet .weights file into (params, state) pytrees.

    Matches reference utils.py:12-53 byte-for-byte, including the BN reorder
    [beta,gamma,mean,var] -> [gamma,beta,mean,var] and the (out,in,h,w) ->
    (h,w,in,out) kernel transpose.  With strict=True, asserts the file is
    fully consumed (the reference's only integrity check, utils.py:50-53).
    """
    if hasattr(path_or_file, "read"):
        f = path_or_file
        close = False
    else:
        f = open(path_or_file, "rb")
        close = True
    try:
        header = np.frombuffer(f.read(5 * 4), dtype=np.int32, count=5)
        if len(header) != 5:
            raise ValueError("truncated .weights header")

        convs, bn_state = [], []
        for spec in conv_specs(num_classes):
            p = {}
            if spec.batch_norm:
                bn = _read(f, 4 * spec.filters).reshape(4, spec.filters)
                # darknet order: beta, gamma, mean, var
                p["gamma"] = bn[1].copy()
                p["beta"] = bn[0].copy()
                bn_state.append({"mean": bn[2].copy(), "var": bn[3].copy()})
            else:
                p["b"] = _read(f, spec.filters).copy()
                bn_state.append(None)
            k, cin, cout = spec.kernel_size, spec.in_ch, spec.filters
            w = _read(f, cout * cin * k * k).reshape(cout, cin, k, k)
            p["w"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
            convs.append(p)

        remainder = f.read()
        if strict and remainder:
            raise ValueError(
                f".weights file not fully consumed: {len(remainder)} bytes left "
                f"(wrong num_classes?)")
    finally:
        if close:
            f.close()

    return {"convs": convs}, {"bn": bn_state}


def save_darknet_weights(params: dict, state: dict, path,
                         header=(0, 2, 5, 0, 0)) -> None:
    """Serialise (params, state) back to darknet .weights byte layout."""
    with open(path, "wb") as f:
        np.asarray(header, dtype=np.int32).tofile(f)
        for p, bn in zip(params["convs"], state["bn"]):
            w = np.asarray(p["w"], np.float32)
            if bn is not None:
                stack = np.stack([
                    np.asarray(p["beta"], np.float32),
                    np.asarray(p["gamma"], np.float32),
                    np.asarray(bn["mean"], np.float32),
                    np.asarray(bn["var"], np.float32),
                ])
                stack.astype(np.float32).tofile(f)
            else:
                np.asarray(p["b"], np.float32).tofile(f)
            # (h, w, in, out) -> (out, in, h, w)
            w.transpose(3, 2, 0, 1).astype(np.float32).tofile(f)


def random_darknet_bytes(num_classes: int, seed: int = 0) -> bytes:
    """Build a synthetic, correctly-sized .weights byte stream (for tests)."""
    rng = np.random.default_rng(seed)
    out = io.BytesIO()
    out.write(np.asarray([0, 2, 5, 0, 0], dtype=np.int32).tobytes())
    for spec in conv_specs(num_classes):
        if spec.batch_norm:
            n = 4 * spec.filters
        else:
            n = spec.filters
        out.write(rng.standard_normal(n, dtype=np.float32).tobytes())
        k = spec.kernel_size
        out.write(rng.standard_normal(spec.filters * spec.in_ch * k * k,
                                      dtype=np.float32).tobytes())
    return out.getvalue()
