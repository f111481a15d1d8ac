"""mAP pipeline tests: voc_ap spec values, IoU +1px convention, end-to-end
export_gt -> eval_map round trip with hand-crafted predictions."""

import os

import numpy as np
import pytest

from yolov4tpu import evalmap


def test_voc_ap_perfect_detector():
    ap, mrec, mpre = evalmap.voc_ap([1.0], [1.0])
    assert ap == pytest.approx(1.0)


def test_voc_ap_monotone_envelope():
    """AP for a sawtooth precision curve: the envelope makes precision
    monotone non-increasing from the right (reference utils.py:311-356)."""
    rec = [0.2, 0.4, 0.4, 0.8]
    prec = [1.0, 0.5, 0.6667, 0.5]
    ap, mrec, mpre = evalmap.voc_ap(rec[:], prec[:])
    # envelope: [1.0, 1.0, 0.6667, 0.6667, 0.5, 0] on mrec [0,.2,.4,.4,.8,1]
    want = 0.2 * 1.0 + 0.2 * 0.6667 + 0.4 * 0.5
    assert ap == pytest.approx(want, abs=1e-4)


def test_iou_plus1_convention():
    """+1 pixel convention (reference models.py:303-310): two unit boxes at
    the same spot -> iou 1; off-by-one overlap still counts."""
    assert evalmap._iou_plus1([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(1.0)
    # adjacent boxes sharing an edge overlap by 1px under the convention
    v = evalmap._iou_plus1([0, 0, 10, 10], [10, 0, 20, 10])
    assert v > 0


@pytest.fixture()
def eval_dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in
         ("gt", "pred", "json", "out")}
    for v in d.values():
        os.makedirs(v, exist_ok=True)
    return d


def test_export_gt_format(tmp_path):
    anno = tmp_path / "anno.txt"
    anno.write_text("dir/img1.jpg 10,20,30,40,0 50,60,70,80,1\n")
    gt_dir = tmp_path / "gt"
    evalmap.export_gt(str(anno), str(gt_dir), ["cat", "dog"])
    content = (gt_dir / "img1.txt").read_text()
    assert content == "cat 10.0 20.0 30.0 40.0\ndog 50.0 60.0 70.0 80.0\n"


def test_eval_map_end_to_end(eval_dirs):
    """2 images, 2 classes; one perfect detection, one duplicate, one miss,
    one false positive -> hand-computable APs."""
    # GT: img1 has cat(0,0,50,50) + dog(60,60,100,100); img2 has cat(10,10,40,40)
    with open(os.path.join(eval_dirs["gt"], "img1.txt"), "w") as f:
        f.write("cat 0 0 50 50\ndog 60 60 100 100\n")
    with open(os.path.join(eval_dirs["gt"], "img2.txt"), "w") as f:
        f.write("cat 10 10 40 40\n")
    # Pred: img1 perfect cat @0.9, duplicate cat @0.8, no dog (miss)
    with open(os.path.join(eval_dirs["pred"], "img1.txt"), "w") as f:
        f.write("cat 0.9 0 0 50 50\ncat 0.8 1 1 50 50\n")
    # img2: perfect cat @0.7 + false-positive dog @0.6
    with open(os.path.join(eval_dirs["pred"], "img2.txt"), "w") as f:
        f.write("cat 0.7 10 10 40 40\ndog 0.6 0 0 20 20\n")

    res = evalmap.eval_map(eval_dirs["gt"], eval_dirs["pred"],
                           eval_dirs["json"], eval_dirs["out"],
                           plot=False, verbose=False)
    # cat: dets sorted [0.9 TP, 0.8 FP(dup), 0.7 TP]; gt=2
    # rec  = [1/2, 1/2, 1]; prec = [1, 1/2, 2/3]
    # envelope: AP = 0.5*1 + 0.5*(2/3) = 0.8333
    assert res["cat"] == pytest.approx(0.8333, abs=1e-3)
    # dog: 1 det, FP; gt=1 -> AP 0
    assert res["dog"] == pytest.approx(0.0, abs=1e-6)
    assert res["mAP"] == pytest.approx((0.8333 + 0.0) / 2, abs=1e-3)

    # output.txt written with the reference's format
    out = open(os.path.join(eval_dirs["out"], "output.txt")).read()
    assert "# AP and precision/recall per class" in out
    assert "mAP = 41.67%" in out
    # temp JSONs exist (file contract)
    assert os.path.exists(os.path.join(eval_dirs["json"], "img1_ground_truth.json"))
    assert os.path.exists(os.path.join(eval_dirs["json"], "cat_dr.json"))


def test_eval_map_plots(eval_dirs):
    with open(os.path.join(eval_dirs["gt"], "a.txt"), "w") as f:
        f.write("cat 0 0 50 50\n")
    with open(os.path.join(eval_dirs["pred"], "a.txt"), "w") as f:
        f.write("cat 0.9 0 0 50 50\n")
    evalmap.eval_map(eval_dirs["gt"], eval_dirs["pred"], eval_dirs["json"],
                     eval_dirs["out"], plot=True, verbose=False)
    for name in ("ground-truth-info.png", "detection-results-info.png",
                 "mAP.png"):
        assert os.path.exists(os.path.join(eval_dirs["out"], name))
    assert os.path.exists(os.path.join(eval_dirs["out"], "classes", "cat.png"))
