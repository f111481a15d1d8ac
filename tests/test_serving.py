"""AOT export/serving round trip: export_detector -> load_detector parity
with the live model (serving.py; deployment story replacing the reference's
keras SavedModel, reference models.py:92-93)."""

import numpy as np
import pytest

from yolov4tpu import Yolov4
from yolov4tpu.config import YoloConfig
from yolov4tpu import serving


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    classes = tmp_path_factory.mktemp("serving") / "classes.txt"
    classes.write_text("a\nb\nc\n")
    cfg = YoloConfig(img_size=(64, 64, 3), csp_repeats=(1, 1, 1, 1, 1),
                     nms_impl="xla")
    return Yolov4(weight_path=None, class_name_path=str(classes), config=cfg)


def test_export_load_round_trip(tiny_model, tmp_path):
    path = str(tmp_path / "det.shlo")
    exported = serving.export_detector(tiny_model, path, batch_size=2)
    assert exported is not None
    assert len(open(path, "rb").read()) > 1000

    detect = serving.load_detector(path)
    imgs = np.random.default_rng(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    got = [np.asarray(o) for o in detect(imgs)]
    want = [np.asarray(o) for o in tiny_model.predict_batch(imgs)]
    assert got[0].shape == want[0].shape
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-5)


def test_export_multiplatform_requires_xla_nms(tiny_model, tmp_path):
    """Pallas NMS variants are single-platform; the export guard catches a
    mixed-platform request before tracing."""
    import dataclasses

    fast_cfg = dataclasses.replace(tiny_model.config, nms_impl="fast")
    object.__setattr__(tiny_model, "config", fast_cfg)
    try:
        with pytest.raises(ValueError, match="multi-platform"):
            serving.export_detector(tiny_model, str(tmp_path / "x.shlo"),
                                    platforms=("tpu", "cpu"))
    finally:
        object.__setattr__(
            tiny_model, "config",
            dataclasses.replace(fast_cfg, nms_impl="xla"))


def test_export_multiplatform_xla(tiny_model, tmp_path):
    """nms_impl='xla' exports one artifact lowered for both tpu and cpu;
    the cpu variant runs here."""
    path = str(tmp_path / "multi.shlo")
    serving.export_detector(tiny_model, path, batch_size=1,
                            platforms=("tpu", "cpu"))
    detect = serving.load_detector(path)
    imgs = np.random.default_rng(2).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = [np.asarray(o) for o in detect(imgs)]
    assert out[0].shape[0] == 1


def test_export_custom_thresholds(tiny_model, tmp_path):
    path = str(tmp_path / "det_lo.shlo")
    serving.export_detector(tiny_model, path, batch_size=1,
                            score_threshold=0.05)
    detect = serving.load_detector(path)
    imgs = np.random.default_rng(1).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32)
    boxes, scores, classes, valid = [np.asarray(o) for o in detect(imgs)]
    # Random-init scores sit ~0.25: the 0.05-threshold export must fire.
    assert int(valid[0]) > 0


def test_export_quantized_model(tiny_model, tmp_path, rng):
    """Exporting a quantized model bakes the int8 program into the artifact;
    the loaded artifact matches the live quantized predict_batch."""
    imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    tiny_model.quantize(calib_imgs=imgs)
    try:
        path = str(tmp_path / "det_int8.shlo")
        serving.export_detector(tiny_model, path, batch_size=2)
        detect = serving.load_detector(path)
        got = [np.asarray(o) for o in detect(imgs)]
        want = [np.asarray(o) for o in tiny_model.predict_batch(imgs)]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=1e-5)
    finally:
        tiny_model.dequantize()


def test_export_uint8_input(tiny_model, tmp_path):
    """input_dtype='uint8' bakes the on-device /255 into the artifact: the
    exported program takes raw uint8 rasters and matches the float-input
    artifact on the same values (uint8 wire for serving)."""
    path = str(tmp_path / "det_u8.shlo")
    # Low baked-in score threshold so random-init weights yield nonzero
    # detections — an all-zero comparison would pass vacuously.
    serving.export_detector(tiny_model, path, batch_size=2,
                            input_dtype="uint8", score_threshold=0.01)
    detect = serving.load_detector(path)
    # The loaded callable carries the artifact's strict input signature —
    # what examples/export_serving.py's run subcommand builds batches from.
    assert detect.input_shape == (2, 64, 64, 3)
    assert detect.input_dtype == np.uint8
    u8 = np.random.default_rng(1).integers(
        0, 256, (2, 64, 64, 3), dtype=np.uint8)
    got = [np.asarray(o) for o in detect(u8)]
    want = [np.asarray(o) for o in tiny_model.predict_batch(
        u8.astype(np.float32) / 255.0, score_threshold=0.01)]
    assert int(got[3].min()) > 0
    np.testing.assert_array_equal(got[3], want[3])
    for g, w in zip(got[:3], want[:3]):
        np.testing.assert_allclose(g, w, atol=1e-3)
    with pytest.raises(ValueError, match="float32.*uint8"):
        serving.export_detector(tiny_model, str(tmp_path / "x.shlo"),
                                input_dtype="int4")
