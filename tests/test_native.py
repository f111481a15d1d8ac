"""Native (C++) host-pipeline kernels vs their numpy/cv2 references."""

import numpy as np
import pytest

from yolov4tpu import native
from yolov4tpu.config import YoloConfig
from yolov4tpu.data.encode import preprocess_true_boxes

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_resize_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(100, 80), (37, 53), (64, 64)]]
    out = native.resize_bilinear_batch(imgs, (48, 48))
    assert out.shape == (3, 48, 48, 3)
    for i, im in enumerate(imgs):
        ref = cv2.resize(im, (48, 48)).astype(np.float32) / 255.0
        # cv2 INTER_LINEAR is fixed-point; allow ~1 quantisation step.
        assert np.abs(out[i] - ref).max() < 2.5 / 255.0


def test_encode_labels_matches_numpy(rng):
    cfg = YoloConfig()
    bs, mb = 4, 20
    boxes = np.zeros((bs, mb, 5), np.float32)
    for b in range(bs):
        n = rng.integers(1, mb)
        x1 = rng.uniform(0, 380, n)
        y1 = rng.uniform(0, 380, n)
        w = rng.uniform(4, 200, n)
        h = rng.uniform(4, 200, n)
        boxes[b, :n] = np.stack(
            [x1, y1, np.minimum(x1 + w, 415), np.minimum(y1 + h, 415),
             rng.integers(0, 3, n)], axis=-1)
    ref_grids, ref_xywh = preprocess_true_boxes(
        boxes, (416, 416), cfg.anchors_flat, 3)
    nat_grids, nat_xywh = native.encode_labels_batch(
        boxes, (416, 416), cfg.anchors_flat, 3)
    np.testing.assert_array_equal(nat_xywh, ref_xywh)
    for g_ref, g_nat in zip(ref_grids, nat_grids):
        np.testing.assert_array_equal(g_nat, g_ref)


def test_assemble_batch_fused(rng):
    imgs = [rng.integers(0, 256, (60, 90, 3), dtype=np.uint8),
            rng.integers(0, 256, (120, 40, 3), dtype=np.uint8)]
    boxes = np.zeros((2, 4, 5), np.float32)
    boxes[0, 0] = [9, 6, 45, 30, 1]
    boxes[1, 0] = [10, 20, 30, 100, 0]
    out_imgs, out_boxes = native.assemble_batch(imgs, boxes, (48, 48))
    assert out_imgs.shape == (2, 48, 48, 3)
    # Boxes rescaled by (dw/sw, dh/sh): img0 is 90x60 -> 48x48.
    np.testing.assert_allclose(
        out_boxes[0, 0, :4],
        [9 * 48 / 90, 6 * 48 / 60, 45 * 48 / 90, 30 * 48 / 60], rtol=1e-6)
    # Padding rows stay zero.
    assert np.all(out_boxes[:, 1:, :] == 0)
    ref = native.resize_bilinear_batch(imgs, (48, 48))
    np.testing.assert_allclose(out_imgs, ref, atol=1e-7)


def test_imread_bit_identical_to_cv2(tmp_path, rng):
    """Native libjpeg decode (full resolution) is bit-identical to
    cv2.imread (both are libjpeg-turbo)."""
    cv2 = pytest.importorskip("cv2")
    if not native.has_jpeg():
        pytest.skip("native libjpeg unavailable")
    img = cv2.GaussianBlur(
        rng.integers(0, 256, (120, 160, 3), np.uint8), (15, 15), 5)
    p = str(tmp_path / "a.jpg")
    cv2.imwrite(p, img)
    ref = cv2.imread(p)[:, :, ::-1]
    got = native.imread(p)
    assert got is not None and got.dtype == np.uint8
    np.testing.assert_array_equal(got, ref)
    # Non-JPEG -> None (caller falls back to cv2).
    p2 = str(tmp_path / "b.png")
    cv2.imwrite(p2, img)
    assert native.imread(p2) is None
    assert native.imread(str(tmp_path / "missing.jpg")) is None


def test_imread_dct_scaling(tmp_path, rng):
    """min_hw triggers libjpeg 1/2,1/4,1/8 DCT-domain decode: dims shrink by
    the largest factor that still covers the minimum."""
    cv2 = pytest.importorskip("cv2")
    if not native.has_jpeg():
        pytest.skip("native libjpeg unavailable")
    img = rng.integers(0, 256, (400, 640, 3), np.uint8)
    p = str(tmp_path / "big.jpg")
    cv2.imwrite(p, img)
    full = native.imread(p)
    assert full.shape == (400, 640, 3)
    half = native.imread(p, min_hw=(100, 160))
    assert half.shape == (100, 160, 3)  # denom 4: 400/4, 640/4
    tiny = native.imread(p, min_hw=(20, 20))
    assert tiny.shape == (50, 80, 3)  # denom 8 floor


def test_ingest_batch_mixed_formats(tmp_path, rng):
    """Fused ingest: JPEGs decode natively, PNGs fall back to cv2 per-image;
    boxes rescale by FULL source dims in both cases; missing files raise."""
    cv2 = pytest.importorskip("cv2")
    a = rng.integers(0, 256, (60, 90, 3), np.uint8)
    b = rng.integers(0, 256, (120, 40, 3), np.uint8)
    pa = str(tmp_path / "a.jpg")
    pb = str(tmp_path / "b.png")
    cv2.imwrite(pa, a)
    cv2.imwrite(pb, b)
    boxes = np.zeros((2, 4, 5), np.float32)
    boxes[0, 0] = [9, 6, 45, 30, 1]
    boxes[1, 0] = [10, 20, 30, 100, 0]
    imgs, ob = native.ingest_batch([pa, pb], boxes, (48, 48))
    assert imgs.shape == (2, 48, 48, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    np.testing.assert_allclose(
        ob[0, 0, :4],
        [9 * 48 / 90, 6 * 48 / 60, 45 * 48 / 90, 30 * 48 / 60], rtol=1e-5)
    np.testing.assert_allclose(
        ob[1, 0, :4],
        [10 * 48 / 40, 20 * 48 / 120, 30 * 48 / 40, 100 * 48 / 120],
        rtol=1e-5)
    assert np.all(ob[:, 1:, :] == 0)  # padding rows stay zero
    # exact mode matches the cv2 decode + native resize reference closely
    jref = cv2.imread(pa)[:, :, ::-1]
    imgs_x, _ = native.ingest_batch([pa], boxes[:1], (48, 48),
                                    dct_scale=False)
    ref = native.resize_bilinear_batch([jref], (48, 48))[0]
    np.testing.assert_allclose(imgs_x[0], ref, atol=1e-6)
    with pytest.raises(FileNotFoundError):
        native.ingest_batch([str(tmp_path / "nope.jpg")], boxes[:1], (48, 48))


def _insert_exif_orientation(jpeg_bytes: bytes, orientation: int) -> bytes:
    """Insert a minimal EXIF APP1 segment (little-endian TIFF, one IFD0
    entry: tag 0x0112 = orientation) right after SOI."""
    tiff = (b"II" + (0x2A).to_bytes(2, "little") + (8).to_bytes(4, "little")
            + (1).to_bytes(2, "little")
            + (0x0112).to_bytes(2, "little") + (3).to_bytes(2, "little")
            + (1).to_bytes(4, "little")
            + orientation.to_bytes(2, "little") + b"\x00\x00"
            + (0).to_bytes(4, "little"))
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    assert jpeg_bytes[:2] == b"\xff\xd8"
    return jpeg_bytes[:2] + app1 + jpeg_bytes[2:]


def test_exif_rotated_jpeg_routes_to_cv2(tmp_path, rng):
    """EXIF orientation != 1: cv2.imread auto-rotates such JPEGs, the raw
    libjpeg raster is unrotated — the native decoder must DETECT the tag
    and defer to the cv2 fallback so image content and box geometry stay
    consistent (decoding raw would silently train rotated pixels against
    unrotated boxes).  Orientation == 1 tags stay on the native path."""
    cv2 = pytest.importorskip("cv2")
    if not native.has_jpeg():
        pytest.skip("native libjpeg unavailable")
    img = rng.integers(0, 256, (60, 90, 3), dtype=np.uint8)
    plain = str(tmp_path / "plain.jpg")
    cv2.imwrite(plain, img)
    raw = open(plain, "rb").read()

    rotated = str(tmp_path / "rot6.jpg")
    open(rotated, "wb").write(_insert_exif_orientation(raw, 6))
    upright = str(tmp_path / "or1.jpg")
    open(upright, "wb").write(_insert_exif_orientation(raw, 1))

    # cv2 rotates 90deg (60x90 -> 90x60); native must refuse the file...
    assert cv2.imread(rotated).shape[:2] == (90, 60)
    assert native.imread(rotated) is None
    # ...but keep decoding an orientation=1 tag natively, bit-identically.
    nat = native.imread(upright)
    assert nat is not None
    np.testing.assert_array_equal(nat, cv2.imread(upright)[:, :, ::-1])

    # Fused batch ingest: the EXIF image falls back to cv2 per-image with
    # boxes rescaled by the ROTATED (displayed) dims cv2 reports.
    boxes = np.zeros((2, 4, 5), np.float32)
    boxes[0, 0] = [9, 6, 45, 30, 1]   # authored in displayed 60x90 frame
    boxes[1, 0] = [9, 6, 45, 30, 1]   # displayed frame is rotated: 90x60
    imgs, ob = native.ingest_batch([plain, rotated], boxes, (48, 48))
    ref_rot = cv2.resize(cv2.imread(rotated)[:, :, ::-1],
                         (48, 48)).astype(np.float32) / 255.0
    assert np.abs(imgs[1] - ref_rot).max() < 2.5 / 255.0
    np.testing.assert_allclose(
        ob[0, 0, :4],
        [9 * 48 / 90, 6 * 48 / 60, 45 * 48 / 90, 30 * 48 / 60], rtol=1e-5)
    np.testing.assert_allclose(
        ob[1, 0, :4],
        [9 * 48 / 60, 6 * 48 / 90, 45 * 48 / 60, 30 * 48 / 90], rtol=1e-5)

    # The generic reader (what DataGenerator uses) returns the rotated
    # raster for EXIF files via its cv2 fallback.
    from yolov4tpu.data.pipeline import read_image_rgb
    assert read_image_rgb(rotated).shape[:2] == (90, 60)


def test_exif_after_xmp_app1_still_detected(tmp_path, rng):
    """Real-world JPEGs (Adobe tools, many phones) put an XMP APP1 BEFORE
    the Exif APP1.  The orientation scanner must skip non-Exif APP1
    segments and keep walking the marker chain — aborting at the XMP
    segment would mis-route a rotated file onto the raw native decode
    (unrotated pixels against rotated-frame boxes)."""
    cv2 = pytest.importorskip("cv2")
    if not native.has_jpeg():
        pytest.skip("native libjpeg unavailable")
    img = rng.integers(0, 256, (60, 90, 3), dtype=np.uint8)
    plain = str(tmp_path / "plain.jpg")
    cv2.imwrite(plain, img)
    raw = open(plain, "rb").read()

    def with_xmp_first(jpeg: bytes) -> bytes:
        xmp_payload = b"http://ns.adobe.com/xap/1.0/\x00" + b"<x:xmpmeta/>"
        xmp = (b"\xff\xe1" + (len(xmp_payload) + 2).to_bytes(2, "big")
               + xmp_payload)
        assert jpeg[:2] == b"\xff\xd8"
        return jpeg[:2] + xmp + jpeg[2:]

    rotated = str(tmp_path / "xmp_rot6.jpg")
    open(rotated, "wb").write(
        with_xmp_first(_insert_exif_orientation(raw, 6)))
    upright = str(tmp_path / "xmp_or1.jpg")
    open(upright, "wb").write(
        with_xmp_first(_insert_exif_orientation(raw, 1)))

    # Orientation=6 behind an XMP segment: native must refuse (cv2 rotates).
    assert cv2.imread(rotated).shape[:2] == (90, 60)
    assert native.imread(rotated) is None
    # Orientation=1 behind an XMP segment: native path stays usable.
    nat = native.imread(upright)
    assert nat is not None
    np.testing.assert_array_equal(nat, cv2.imread(upright)[:, :, ::-1])

    # Batch ingest must route the rotated file to its cv2 fallback too.
    boxes = np.zeros((1, 1, 5), np.float32)
    boxes[0, 0] = [9, 6, 45, 30, 1]  # authored in displayed 90x60 frame
    imgs, ob = native.ingest_batch([rotated], boxes, (48, 48))
    ref_rot = cv2.resize(cv2.imread(rotated)[:, :, ::-1],
                         (48, 48)).astype(np.float32) / 255.0
    assert np.abs(imgs[0] - ref_rot).max() < 2.5 / 255.0
    np.testing.assert_allclose(
        ob[0, 0, :4],
        [9 * 48 / 60, 6 * 48 / 90, 45 * 48 / 60, 30 * 48 / 90], rtol=1e-5)
