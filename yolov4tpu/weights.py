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


def load_keras_h5(path: str, num_classes: int) -> Tuple[dict, dict]:
    """Migration reader for reference-era keras ``.h5`` weight files.

    The reference intended to restore ``.h5`` checkpoints but its load branch
    was dead code (reference models.py:75-81); users still have such files.
    Reads legacy keras HDF5 weight layouts (both ``save_weights`` files and
    full-model saves with a ``model_weights`` group) by the same auto-name
    scheme the reference's loader used (``conv2d``/``conv2d_{i}`` with a
    separate ``batch_normalization_{j}`` counter, reference utils.py:19-24).
    """
    import h5py

    def names(group):
        return [n.decode() if isinstance(n, bytes) else n
                for n in group.attrs["weight_names"]]

    def arrays(group):
        return {n.rsplit("/", 1)[-1].split(":")[0]: np.asarray(group[n])
                for n in names(group)}

    with h5py.File(path, "r") as f:
        g = f["model_weights"] if "model_weights" in f else f
        convs, bn_state = [], []
        bn_idx = 0
        for i, spec in enumerate(conv_specs(num_classes)):
            cname = f"conv2d_{i}" if i > 0 else "conv2d"
            carr = arrays(g[cname])
            p = {"w": carr["kernel"].astype(np.float32)}
            if spec.batch_norm:
                bname = (f"batch_normalization_{bn_idx}" if bn_idx > 0
                         else "batch_normalization")
                barr = arrays(g[bname])
                p["gamma"] = barr["gamma"].astype(np.float32)
                p["beta"] = barr["beta"].astype(np.float32)
                bn_state.append({
                    "mean": barr["moving_mean"].astype(np.float32),
                    "var": barr["moving_variance"].astype(np.float32)})
                bn_idx += 1
            else:
                p["b"] = carr["bias"].astype(np.float32)
                bn_state.append(None)
            if p["w"].shape != (spec.kernel_size, spec.kernel_size,
                                spec.in_ch, spec.filters):
                raise ValueError(
                    f"{cname}: kernel shape {p['w'].shape} does not match "
                    f"spec {spec} (wrong num_classes?)")
            convs.append(p)
    return {"convs": convs}, {"bn": bn_state}


def random_darknet_bytes(num_classes: int, seed: int = 0) -> bytes:
    """Build a synthetic, correctly-sized .weights byte stream (for tests).

    Values are well-conditioned (positive BN variance, ~unit-gain kernels) so
    a network loaded from them computes finite, comparable activations.
    """
    rng = np.random.default_rng(seed)
    out = io.BytesIO()
    out.write(np.asarray([0, 2, 5, 0, 0], dtype=np.int32).tobytes())
    for spec in conv_specs(num_classes):
        f = spec.filters
        if spec.batch_norm:
            beta = rng.normal(0.0, 0.1, f)
            gamma = rng.uniform(0.8, 1.2, f)
            mean = rng.normal(0.0, 0.1, f)
            var = rng.uniform(0.5, 1.5, f)
            out.write(np.concatenate([beta, gamma, mean, var])
                      .astype(np.float32).tobytes())
        else:
            out.write(rng.normal(0.0, 0.1, f).astype(np.float32).tobytes())
        k = spec.kernel_size
        fan_in = k * k * spec.in_ch
        w = rng.normal(0.0, 1.0 / np.sqrt(fan_in), f * spec.in_ch * k * k)
        out.write(w.astype(np.float32).tobytes())
    return out.getvalue()


def calibrate_detection_density(params: dict, raw_outputs, num_classes: int,
                                score_threshold: float = 0.3,
                                target_per_image: float = 120.0,
                                spread: float = None):
    """Shift the head-conv obj/class biases so a random-init detector emits a
    realistic detection density (~``target_per_image`` boxes whose best-class
    score clears ``score_threshold``).

    Random-init logits hover near 0, so best-class scores sit at
    ~sigmoid(0)^2 = 0.25 — just UNDER the reference's 0.3 threshold: every
    scene looks empty and NMS degenerates to a no-op.  The head convs are
    the network's last layer with no BN and no activation, so adding a
    scalar ``delta`` to their obj/class biases shifts those output logits by
    EXACTLY ``delta``; the right delta is found by bisection on the
    ``raw_outputs`` the CURRENT params produced (no re-forward needed).

    Returns ``(new_params, delta)`` — new_params is a deep-copied pytree with
    each biased head conv's [dx,dy,dw,dh,obj,classes...] blocks shifted on
    obj+classes.  Used by the end-to-end golden-parity test and the
    busy-scene bench (VERDICT r1 items 1-2).

    spread: also rescale the obj/class logit distributions to this standard
    deviation (exactly — logits are linear in the head-conv weight rows, so
    ``l' = k*(l-mean)+mean`` is ``w' = k*w, b' = k*b+(1-k)*mean``).  Random
    init leaves those logits clustered so tightly (std ~0.05) that the
    target quantile sits on a knife edge: even bf16 rounding of the shifted
    bias (~2e-3 in logit space) flips the whole candidate population across
    the threshold — measured on v5e: the "calibrated-busy" detector emitted
    0 candidates when re-forwarded in bf16.  With spread ~1.0 the density
    responds smoothly to delta and survives low-precision re-forwarding;
    leave None for f32 cross-framework parity tests, where exactness of the
    UNSCALED logits matters more.
    """
    obj_logits, cls_logits = [], []
    for raw in raw_outputs:
        r = np.asarray(raw, np.float32)
        flat = r.reshape(r.shape[0], -1, 5 + num_classes)
        obj_logits.append(flat[..., 4])
        cls_logits.append(flat[..., 5:].max(-1))
    obj = np.concatenate(obj_logits, axis=1)
    mcls = np.concatenate(cls_logits, axis=1)
    n_img = obj.shape[0]

    k_obj = k_cls = 1.0
    mu_obj = mu_cls = 0.0
    if spread is not None:
        mu_obj, mu_cls = float(obj.mean()), float(mcls.mean())
        k_obj = min(spread / max(float(obj.std()), 1e-6), 1e3)
        k_cls = min(spread / max(float(mcls.std()), 1e-6), 1e3)
        obj = k_obj * (obj - mu_obj) + mu_obj
        # max over classes commutes with the monotone per-logit transform,
        # so transforming the max IS transforming each class logit
        mcls = k_cls * (mcls - mu_cls) + mu_cls

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    def count(delta):
        s = sigmoid(obj + delta) * sigmoid(mcls + delta)
        return float((s > score_threshold).sum()) / n_img

    lo, hi = -30.0, 30.0
    if count(lo) > target_per_image or count(hi) < target_per_image:
        raise ValueError("target density unreachable by a scalar bias shift")
    for _ in range(60):  # monotone in delta -> plain bisection
        mid = 0.5 * (lo + hi)
        if count(mid) < target_per_image:
            lo = mid
        else:
            hi = mid
    delta = 0.5 * (lo + hi)

    # Bisection converges to a delta where some box sits EXACTLY at the
    # threshold (the count step it hunts IS a score crossing 0.3) — that
    # box then flips in/out under ~1e-7 cross-framework noise and breaks
    # valid-count comparisons.  Scan nearby deltas and keep the one whose
    # nearest score is FARTHEST from the threshold while the density stays
    # in [0.5, 1.5]x target.
    best = None
    for off in np.linspace(-0.1, 0.1, 201):
        d = delta + off
        s = sigmoid(obj + d) * sigmoid(mcls + d)
        c = float((s > score_threshold).sum()) / n_img
        if not (0.5 * target_per_image <= c <= 1.5 * target_per_image):
            continue
        margin = float(np.abs(s - score_threshold).min())
        if best is None or margin > best[0]:
            best = (margin, d)
    delta = best[1] if best is not None else delta

    new_convs = []
    for p in params["convs"]:
        p = dict(p)
        if "b" in p:
            b = np.array(p["b"], np.float32).reshape(3, 5 + num_classes)
            b[:, 4] = k_obj * b[:, 4] + (1 - k_obj) * mu_obj + delta
            b[:, 5:] = k_cls * b[:, 5:] + (1 - k_cls) * mu_cls + delta
            p["b"] = b.ravel()
            if spread is not None:
                w = np.array(p["w"], np.float32)
                wr = w.reshape(*w.shape[:3], 3, 5 + num_classes)
                wr[..., 4] *= k_obj
                wr[..., 5:] *= k_cls
                p["w"] = wr.reshape(w.shape)
        new_convs.append(p)
    return {**params, "convs": new_convs}, delta


def force_busy_heads(params: dict, num_classes: int,
                     hot=((2, 0, 0), (2, 1, 1)),
                     on_logit: float = 2.0, off_logit: float = -6.0):
    """Overwrite head-conv obj/class biases so chosen channels fire at EVERY
    grid cell — a deterministic, precision-proof busy scene for benchmarks.

    ``calibrate_detection_density`` needs logit VARIANCE to place a robust
    quantile, and the reference's N(0,0.01) init has none: activations decay
    multiplicatively through the 110-conv depth to ~1e-22, so head logits
    equal their biases almost exactly and the bisected threshold sits on a
    knife edge — measured on v5e, the "calibrated" detector emits 0
    candidates when re-forwarded in bf16.  This helper instead SETS the
    outcome: each ``(head, anchor, cls)`` in ``hot`` (head 0/1/2 = the
    52/26/13-grid head convs in serial order, reference
    custom_layers.py:171-196) gets obj and that class's bias ``on_logit``
    (score = sigmoid(on)^2, e.g. 0.77 at 2.0 — clears the 0.3 threshold by
    a margin no dtype can erase); everything else gets ``off_logit``
    (score ~ 0).  Candidates/image = sum of the hot heads' grid cells
    (169/channel at 13^2 for 416 input); their boxes are anchor-sized
    overlapping neighbors, so the NMS suppression loop does trained-model
    work.  Returns new params (deep-copied head convs).

    Entries in ``hot`` may also be 4-tuples ``(head, anchor, cls, logit)``
    to give each channel its own on-logit — lets a bench spread candidates
    across all three heads with controlled score ordering (e.g. 13^2-grid
    boxes outrank 52^2 ones in the fused path's global top-k).
    """
    new_convs, head_i = [], 0
    for p in params["convs"]:
        p = dict(p)
        if "b" in p:
            b = np.array(p["b"], np.float32).reshape(3, 5 + num_classes)
            b[:, 4:] = off_logit
            for entry in hot:
                h, anchor, cls = entry[0], entry[1], entry[2]
                logit = entry[3] if len(entry) > 3 else on_logit
                if h == head_i:
                    # obj bias: max over this channel's hot entries so the
                    # strongest class sets the candidate ranking score.
                    b[anchor, 4] = max(b[anchor, 4], logit) \
                        if b[anchor, 4] > off_logit else logit
                    b[anchor, 5 + cls] = logit
            p["b"] = b.ravel()
            head_i += 1
        new_convs.append(p)
    return {**params, "convs": new_convs}
