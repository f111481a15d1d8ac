"""Letterbox (aspect-preserving) resize: geometry, box round-trip, pipeline
and eval-export integration.  Off by default (the reference stretches,
reference utils.py:195); these tests cover the opt-in path."""

import numpy as np
import pytest

from yolov4tpu.config import YoloConfig
from yolov4tpu.data.pipeline import (DataGenerator, letterbox_resize,
                                     letterbox_transform)


def test_letterbox_geometry_and_box_mapping():
    img = np.random.default_rng(0).uniform(
        0, 255, (100, 200, 3)).astype(np.uint8)  # wide 2:1
    boxes = np.array([[0, 0, 200, 100, 1]], np.float32)
    out, b, (s, dx, dy) = letterbox_resize(img, (64, 64), boxes)
    assert out.shape == (64, 64, 3)
    assert s == pytest.approx(64 / 200)
    assert dx == 0 and dy == (64 - 32) // 2
    # Gray bars above and below, content in the middle band.
    assert np.allclose(out[0], 0.5) and np.allclose(out[-1], 0.5)
    assert not np.allclose(out[32], 0.5)
    # The full-image box maps exactly onto the content band.
    np.testing.assert_allclose(b[0, :4], [0, dy, 64, dy + 32], atol=0.51)
    # Round trip back to raw coords.
    x_raw = (b[0, [0, 2]] - dx) / s
    y_raw = (b[0, [1, 3]] - dy) / s
    np.testing.assert_allclose(x_raw, [0, 200], atol=2)
    np.testing.assert_allclose(y_raw, [0, 100], atol=2)


def test_letterbox_transform_tall():
    s, dx, dy = letterbox_transform((400, 100), (64, 64))  # tall 1:4
    assert s == pytest.approx(64 / 400)
    assert dy == 0 and dx == (64 - 16) // 2


def test_get_detection_data_letterbox_unmap():
    from yolov4tpu.utils.visualize import get_detection_data
    raw = np.zeros((100, 200, 3), np.uint8)
    s, dx, dy = letterbox_transform((100, 200), (64, 64))
    # A detection covering the whole content band in model space.
    boxes = np.array([[[0.0, dy / 64, 1.0, (dy + 32) / 64]]], np.float32)
    scores = np.array([[0.9]], np.float32)
    classes = np.array([[1.0]], np.float32)
    valid = np.array([1], np.int32)
    df = get_detection_data(raw, (boxes, scores, classes, valid),
                            ["a", "b"], letterbox_transform=((s, dx, dy),
                                                             (64, 64)))
    assert df.iloc[0].class_name == "b"
    assert abs(df.iloc[0].x1 - 0) <= 2 and abs(df.iloc[0].x2 - 200) <= 2
    assert abs(df.iloc[0].y1 - 0) <= 2 and abs(df.iloc[0].y2 - 100) <= 2


def test_letterbox_pads_stay_gray_under_jitter(tmp_path, rng):
    """Color jitter runs on the raw image BEFORE padding, so the letterbox
    bars remain the exact 0.5 gray that inference uses."""
    import cv2
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    img = rng.uniform(0, 255, (100, 200, 3)).astype(np.uint8)  # wide
    cv2.imwrite(str(img_dir / "im0.jpg"), img)
    classes = tmp_path / "classes.txt"
    classes.write_text("a\n")
    cfg = YoloConfig(img_size=(64, 64, 3), batch_size=1, letterbox=True,
                     use_color_jitter=True)
    gen = DataGenerator(["im0.jpg 10,10,180,90,0\n"], str(classes),
                        str(img_dir), config=cfg, seed=0)
    b = gen.get_batch(0)
    assert np.allclose(b["image"][:, 0], 0.5)   # top bar untouched
    assert np.allclose(b["image"][:, -1], 0.5)  # bottom bar untouched


def test_letterbox_unmap_roundtrip():
    from yolov4tpu.data.pipeline import letterbox_resize, letterbox_unmap
    raw = np.zeros((100, 200, 3), np.uint8)
    boxes = np.array([[20, 10, 180, 90, 0]], np.float32)
    _, mapped, t = letterbox_resize(raw, (64, 64), boxes)
    norm = mapped[:, :4] / 64.0
    back = letterbox_unmap(norm, t, (64, 64), (100, 200))
    np.testing.assert_allclose(back, boxes[:, :4], atol=2)


def test_generator_letterbox_batches(tmp_path, rng):
    import cv2
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    lines = []
    for i in range(4):
        img = rng.uniform(0, 255, (100, 200, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        lines.append(f"im{i}.jpg 10,10,180,90,0\n")
    classes = tmp_path / "classes.txt"
    classes.write_text("a\nb\n")
    cfg = YoloConfig(img_size=(64, 64, 3), batch_size=2, letterbox=True)
    gen = DataGenerator(lines, str(classes), str(img_dir), config=cfg, seed=0)
    b = gen.get_batch(0)
    assert b["image"].shape == (2, 64, 64, 3)
    # Gray letterbox bars present (wide image -> top/bottom padding).
    assert np.allclose(b["image"][:, 0], 0.5)
    # Encoded boxes land inside the content band: y centers in [16, 48] px.
    ys = b["boxes"][..., 1]
    ys = ys[ys > 0]
    assert len(ys) and ys.min() >= 16 and ys.max() <= 48
