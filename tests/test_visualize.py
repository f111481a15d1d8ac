"""Pixel-level tests for the detection renderer (reference utils.py:88-118
visual contract: scaled outline, colored label fill, white label text)."""

import numpy as np
import pandas as pd
import pytest

from yolov4tpu.utils.visualize import draw_bbox


def _detections():
    return pd.DataFrame([
        {"x1": 20, "y1": 30, "x2": 80, "y2": 90,
         "class_name": "WBC", "score": 0.91, "w": 60, "h": 60},
        {"x1": 50, "y1": 50, "x2": 110, "y2": 100,
         "class_name": "RBC", "score": 0.42, "w": 60, "h": 50},
    ])


def test_draw_bbox_paints_boxes_and_labels():
    img = np.zeros((128, 128, 3), np.uint8)
    cmap = {"WBC": (255, 0, 0), "RBC": (0, 255, 0)}
    out = draw_bbox(img, _detections(), cmap, random_color=False,
                    show_img=False)
    assert out.shape == img.shape and out.dtype == img.dtype
    # Input untouched; output painted.
    assert img.max() == 0
    assert out.max() > 0
    # Box outline in the class color: sample the top edge of box 1 away
    # from its corners and from box 2's overlap region.
    assert tuple(out[30, 40]) == (255, 0, 0)
    # Label fill + white text sit just above the box's top-left corner.
    label_band = out[18:30, 20:60]
    assert label_band.max() == 255
    assert (label_band == 255).all(axis=-1).any(), "no white label text"
    # Interior (away from edges/labels/overlap) stays untouched.
    assert out[85, 25].max() == 0


def test_draw_bbox_random_color_reproducible():
    img = np.zeros((64, 64, 3), np.uint8)
    df = _detections().iloc[:1]
    a = draw_bbox(img, df, {}, random_color=True, show_img=False,
                  rng=np.random.default_rng(7))
    b = draw_bbox(img, df, {}, random_color=True, show_img=False,
                  rng=np.random.default_rng(7))
    c = draw_bbox(img, df, {}, random_color=True, show_img=False,
                  rng=np.random.default_rng(8))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_draw_bbox_no_text_no_detections():
    img = np.full((64, 64, 3), 7, np.uint8)
    out = draw_bbox(img, _detections().iloc[:1], {"WBC": (0, 0, 255)},
                    random_color=False, show_img=False, show_text=False)
    # Outline drawn but nothing above the box (no label band).
    assert (out[:28] == 7).all()
    empty = draw_bbox(img, _detections().iloc[:0], {}, show_img=False)
    np.testing.assert_array_equal(empty, img)
