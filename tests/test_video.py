"""Video annotation tool round trip (tools/video.py): synthetic clip in,
annotated clip out, frame counts preserved."""

import numpy as np
import pytest

from yolov4tpu import Yolov4
from yolov4tpu.config import YoloConfig
from yolov4tpu.tools.video import annotate_video


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    classes = tmp_path_factory.mktemp("video") / "classes.txt"
    classes.write_text("a\nb\nc\n")
    cfg = YoloConfig(img_size=(64, 64, 3), csp_repeats=(1, 1, 1, 1, 1))
    return Yolov4(weight_path=None, class_name_path=str(classes), config=cfg)


def test_annotate_video_round_trip(tiny_model, tmp_path):
    import cv2

    src = str(tmp_path / "in.mp4")
    dst = str(tmp_path / "out.mp4")
    writer = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (96, 64))
    rng = np.random.default_rng(0)
    for _ in range(7):
        writer.write(rng.uniform(0, 255, (64, 96, 3)).astype(np.uint8))
    writer.release()

    n = annotate_video(tiny_model, src, dst, bs=3, score_threshold=0.05,
                       verbose=False)
    assert n == 7
    cap = cv2.VideoCapture(dst)
    assert cap.isOpened()
    frames = 0
    while cap.read()[0]:
        frames += 1
    cap.release()
    assert frames == 7


def test_annotate_video_max_frames(tiny_model, tmp_path):
    import cv2

    src = str(tmp_path / "in2.mp4")
    writer = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (96, 64))
    for _ in range(6):
        writer.write(np.zeros((64, 96, 3), np.uint8))
    writer.release()
    n = annotate_video(tiny_model, src, str(tmp_path / "o.mp4"), bs=4,
                       max_frames=5, verbose=False)
    assert n == 5


def test_annotate_video_uint8_wire(tiny_model, tmp_path):
    """transfer_uint8 routes video frames onto the uint8 wire — same frame
    count out, and per-frame detections match the float wire (same raster,
    /255 within 1 ulp; see predict_paths)."""
    import dataclasses

    import cv2

    src = str(tmp_path / "in3.mp4")
    writer = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (96, 64))
    rng = np.random.default_rng(2)
    for _ in range(5):
        writer.write(rng.uniform(0, 255, (64, 96, 3)).astype(np.uint8))
    writer.release()

    n_f = annotate_video(tiny_model, src, str(tmp_path / "of.mp4"), bs=3,
                         score_threshold=0.05, verbose=False)
    cfg_save = tiny_model.config
    tiny_model.config = dataclasses.replace(cfg_save, transfer_uint8=True)
    try:
        n_u = annotate_video(tiny_model, src, str(tmp_path / "ou.mp4"),
                             bs=3, score_threshold=0.05, verbose=False)
    finally:
        tiny_model.config = cfg_save
    assert n_f == n_u == 5
    # The two annotated outputs should be visually identical; mp4 is lossy,
    # so compare decoded frames with a generous-but-discriminating bound.
    cf, cu = cv2.VideoCapture(str(tmp_path / "of.mp4")), \
        cv2.VideoCapture(str(tmp_path / "ou.mp4"))
    while True:
        okf, ff = cf.read()
        oku, fu = cu.read()
        assert okf == oku
        if not okf:
            break
        assert np.abs(ff.astype(np.int16) - fu.astype(np.int16)).mean() < 2.0
