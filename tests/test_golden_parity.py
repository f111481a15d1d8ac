"""Golden parity: our JAX network vs the actual tf.keras reference model.

The strongest parity check available (SURVEY §4 'golden' tier): load the SAME
darknet ``.weights`` byte stream into (a) the reference implementation
imported straight from /root/reference (read-only, imported at test time, no
code copied) and (b) our functional JAX network, and compare the three raw
output grids.  This pins the full 110-conv topology, the darknet byte layout,
BN semantics (eps 1e-3), activation choices and the downsampling padding in
one shot.

Skipped automatically when TF or the reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_modules():
    tf = pytest.importorskip("tensorflow")
    # The reference's loader calls np.product, removed in numpy 2.0; shim it
    # so the unmodified reference code runs in this environment.
    if not hasattr(np, "product"):
        np.product = np.prod
    sys.path.insert(0, REF)
    try:
        import custom_layers as ref_layers
        import utils as ref_utils
    except Exception as e:  # pragma: no cover - env-dependent
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)
    return tf, ref_layers, ref_utils


@pytest.mark.slow
def test_raw_grids_match_reference(ref_modules, tmp_path):
    tf, ref_layers, ref_utils = ref_modules
    from yolov4tpu import weights as w
    from yolov4tpu.models import network

    num_classes = 3
    img = 96  # divisible by 32; small enough for CPU

    wpath = str(tmp_path / "synthetic.weights")
    with open(wpath, "wb") as f:
        f.write(w.random_darknet_bytes(num_classes, seed=11))

    # --- reference model (tf.keras) -----------------------------------
    tf.keras.backend.clear_session()
    inp = tf.keras.layers.Input((img, img, 3))
    outs = ref_layers.yolov4_neck(inp, num_classes)
    ref_model = tf.keras.Model(inp, outs)
    ref_utils.load_weights(ref_model, wpath)

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, img, img, 3)).astype(np.float32)
    # Eager call (not .predict): grappler's remapper attempts a
    # FusedBatchNorm+Mish fusion that is unimplemented on this TF build.
    ref_out = [o.numpy() for o in ref_model(x, training=False)]

    # --- our network (JAX) --------------------------------------------
    params, state = w.load_darknet_weights(wpath, num_classes)
    got_out, _ = network.apply(params, state, x, num_classes)

    assert len(ref_out) == len(got_out) == 3
    for i, (r, g) in enumerate(zip(ref_out, got_out)):
        g = np.asarray(g)
        assert r.shape == g.shape, f"scale {i}: {r.shape} vs {g.shape}"
        # Raw-grid tolerance 2e-3: f32 accumulation-order drift across the
        # 110-conv depth between TF-CPU and XLA-CPU.  The <=1e-3 per-box
        # fidelity target (BASELINE.json) applies to decoded boxes, where
        # sigmoid/normalisation compress this logit-level noise.
        np.testing.assert_allclose(g, r, rtol=2e-3, atol=2e-3,
                                   err_msg=f"scale {i}")


@pytest.mark.slow
def test_folded_inference_matches_reference(ref_modules, tmp_path):
    """BN folding (our inference fast path) stays within fidelity budget of
    the reference's un-folded computation."""
    tf, ref_layers, ref_utils = ref_modules
    from yolov4tpu import weights as w
    from yolov4tpu.models import network

    num_classes = 3
    img = 96
    wpath = str(tmp_path / "synthetic.weights")
    with open(wpath, "wb") as f:
        f.write(w.random_darknet_bytes(num_classes, seed=12))

    tf.keras.backend.clear_session()
    inp = tf.keras.layers.Input((img, img, 3))
    ref_model = tf.keras.Model(inp, ref_layers.yolov4_neck(inp, num_classes))
    ref_utils.load_weights(ref_model, wpath)

    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, (1, img, img, 3)).astype(np.float32)
    ref_out = [o.numpy() for o in ref_model(x, training=False)]

    params, state = w.load_darknet_weights(wpath, num_classes)
    folded = network.fold_bn(params, state)
    got_out = network.apply_folded(folded, x, num_classes)

    for i, (r, g) in enumerate(zip(ref_out, got_out)):
        np.testing.assert_allclose(np.asarray(g), r, rtol=2e-3, atol=2e-3,
                                   err_msg=f"scale {i}")


@pytest.mark.slow
def test_end_to_end_decoded_parity_416_80class(ref_modules, tmp_path):
    """THE fidelity contract (BASELINE.json north star): one batch through
    BOTH complete inference pipelines — reference inference_model
    (yolov4_neck -> yolov4_head -> nms, reference models.py:68-73,
    custom_layers.py:201-298) vs our Yolov4.predict_batch — at the
    production operating point (416^2, 80 classes, NMS 0.413/0.3), with
    head biases calibrated so dozens of boxes clear the score threshold.
    Asserts per-box boxes/scores/classes <=1e-3 and identical valid counts
    for ALL THREE nms_impl settings."""
    tf, ref_layers, ref_utils = ref_modules
    from yolov4tpu import weights as w
    from yolov4tpu.api import Yolov4
    from yolov4tpu.config import YoloConfig

    num_classes = 80
    img = 416
    cfg = YoloConfig()  # reference defaults: 416^2, NMS 0.413/0.3

    rng = np.random.default_rng(17)
    x = rng.uniform(0, 1, (2, img, img, 3)).astype(np.float32)

    # --- calibrate synthetic weights to a realistic detection density ---
    import io as _io

    from yolov4tpu.models import network
    base = w.random_darknet_bytes(num_classes, seed=21)
    params, state = w.load_darknet_weights(_io.BytesIO(base), num_classes)
    raws0 = [np.asarray(r) for r in network.apply_folded(
        network.fold_bn(params, state), x, num_classes)]
    params, delta = w.calibrate_detection_density(
        params, raws0, num_classes, cfg.score_threshold,
        target_per_image=120.0)
    wpath = str(tmp_path / "calibrated.weights")
    w.save_darknet_weights(params, state, wpath)

    # Our calibrated raw grids: bias on the (no-BN, no-activation) head
    # convs is exactly additive, so shift instead of re-running the net.
    got_raws = []
    for r in raws0:
        r5 = r.reshape(*r.shape[:3], 3, 5 + num_classes).copy()
        r5[..., 4:] += np.float32(delta)
        got_raws.append(r5.reshape(r.shape))

    # Calibration sanity: the scene must be busy (the whole point — NMS on
    # a realistic detection density), yet inside the top-K candidate budget
    # shared by the pallas/fast paths, so every impl is within its
    # exactness envelope.
    n_above = np.zeros(x.shape[0], np.int64)
    for r in got_raws:
        flat = r.reshape(r.shape[0], -1, 5 + num_classes)
        best = (1 / (1 + np.exp(-flat[..., 4]))
                * 1 / (1 + np.exp(-flat[..., 5:].max(-1))))
        n_above += (best > cfg.score_threshold).sum(-1)
    assert n_above.min() >= 30, f"scene not busy enough: {n_above}"
    assert n_above.max() <= cfg.nms_pre_top_k, (
        f"too busy for the {cfg.nms_pre_top_k}-candidate budget: {n_above}")

    # --- reference complete inference_model ---------------------------
    tf.keras.backend.clear_session()
    inp = tf.keras.layers.Input((img, img, 3))
    neck = ref_layers.yolov4_neck(inp, num_classes)
    ref_yolo = tf.keras.Model(inp, neck)
    ref_utils.load_weights(ref_yolo, wpath)
    anchors = np.asarray(cfg.anchors_grouped, np.float32)
    head = ref_layers.yolov4_head(neck, num_classes, anchors,
                                  np.asarray(cfg.xyscale, np.float32))
    ref_inference = tf.keras.Model(
        inp, ref_layers.nms(head, (img, img, 3), num_classes,
                            iou_threshold=cfg.iou_threshold,
                            score_threshold=cfg.score_threshold))

    ref_b, ref_s, ref_c, ref_v = [np.asarray(t)
                                  for t in ref_inference(x, training=False)]
    ref_v = ref_v.astype(np.int32)
    assert ref_v.min() >= 10, f"NMS survivors too few: valid={ref_v}"

    # --- raw-grid parity at the production operating point -------------
    # (the round-1 raw-grid test ran only 96^2/3-class; 416^2/80-class
    # exercises the s2d stem assert, full head widths, and all grid paths)
    ref_raws = [np.asarray(t) for t in ref_yolo(x, training=False)]
    for i, (r, g) in enumerate(zip(ref_raws, got_raws)):
        assert r.shape == g.shape
        np.testing.assert_allclose(g, r, rtol=2e-3, atol=2e-3,
                                   err_msg=f"raw scale {i}")

    # --- ours: all three NMS implementations --------------------------
    for impl in ("xla", "pallas", "fast"):
        model = Yolov4(weight_path=wpath,
                       class_name_path="class_names/coco_classes.txt",
                       config=cfg.replace(nms_impl=impl))
        got_b, got_s, got_c, got_v = [np.asarray(o)
                                      for o in model.predict_batch(x)]
        np.testing.assert_array_equal(got_v.astype(np.int32), ref_v,
                                      err_msg=f"{impl}: valid counts")
        for bi in range(x.shape[0]):
            n = int(ref_v[bi])
            np.testing.assert_array_equal(
                got_c[bi, :n].astype(np.int32), ref_c[bi, :n].astype(np.int32),
                err_msg=f"{impl}: classes img {bi}")
            np.testing.assert_allclose(
                got_s[bi, :n], ref_s[bi, :n], atol=1e-3, rtol=0,
                err_msg=f"{impl}: scores img {bi}")
            np.testing.assert_allclose(
                got_b[bi, :n], ref_b[bi, :n], atol=1e-3, rtol=0,
                err_msg=f"{impl}: boxes img {bi}")


class _NoopPlt:
    """Stand-in for matplotlib.pyplot inside the reference's eval_map: the
    reference calls matplotlib-2-era canvas APIs (fig.canvas.set_window_title)
    that raise on current matplotlib.  Absorbs any chain of attribute access
    and calls (plt.gcf().canvas.set_window_title(...))."""

    def __getattr__(self, name):
        return self

    def __call__(self, *a, **k):
        return self


@pytest.mark.slow
def test_eval_map_scorer_matches_reference(ref_modules, tmp_path):
    """Differential test of the mAP scorer: identical messy gt/pred txt dirs
    through the reference's eval_map (reference models.py:182-507,
    utils.py:311-356) and ours; per-class APs and mAP must agree to 1e-9.
    The corpus stresses the fiddly corners: duplicate detections on one GT,
    sub-threshold IoUs, confidence ties, a class with zero detections, and a
    predicted class absent from GT."""
    tf, ref_layers, ref_utils = ref_modules
    sys.path.insert(0, REF)
    try:
        import models as ref_models
    except Exception as e:  # pragma: no cover - env-dependent
        pytest.skip(f"reference models import failed: {e}")
    finally:
        sys.path.remove(REF)
    from yolov4tpu import evalmap

    rng = np.random.default_rng(99)
    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()

    def box(lo=0, hi=400):
        x1, y1 = rng.integers(lo, hi - 40, 2)
        w, h = rng.integers(20, 120, 2)
        return [int(x1), int(y1), int(x1 + w), int(y1 + h)]

    normal, rare, ghost = ["cat", "dog", "bus"], "rare", "ghost"
    for i in range(8):
        gt_lines, pred_lines = [], []
        for cls in normal:
            for _ in range(int(rng.integers(0, 4))):
                b = box()
                gt_lines.append(f"{cls} {b[0]} {b[1]} {b[2]} {b[3]}")
                if rng.uniform() < 0.8:  # jittered match (IoU above/below .5)
                    j = int(rng.integers(0, 60))
                    conf = round(float(rng.uniform(0.05, 0.99)), 6)
                    pred_lines.append(
                        f"{cls} {conf:.6f} {b[0]+j} {b[1]+j} {b[2]+j} {b[3]+j}")
                    if rng.uniform() < 0.3:  # duplicate on the same GT
                        pred_lines.append(
                            f"{cls} {conf/2:.6f} {b[0]} {b[1]} {b[2]} {b[3]}")
            for _ in range(int(rng.integers(0, 2))):  # spurious
                b = box()
                pred_lines.append(
                    f"{cls} {0.5:.6f} {b[0]} {b[1]} {b[2]} {b[3]}")  # ties
        if i % 3 == 0:  # class with GT but zero detections
            b = box()
            gt_lines.append(f"{rare} {b[0]} {b[1]} {b[2]} {b[3]}")
        if i % 4 == 0:  # predicted class absent from GT entirely
            b = box()
            pred_lines.append(f"{ghost} {0.9:.6f} {b[0]} {b[1]} {b[2]} {b[3]}")
        (gt_dir / f"img{i}.txt").write_text("\n".join(gt_lines) + "\n"
                                            if gt_lines else "")
        (pred_dir / f"img{i}.txt").write_text("\n".join(pred_lines) + "\n"
                                              if pred_lines else "")

    # --- reference scorer (plotting stubbed; voc_ap recorded) -----------
    ref_json = tmp_path / "ref_json"
    ref_out = tmp_path / "ref_out"
    ref_json.mkdir()
    ref_out.mkdir()
    recorded = []
    real_voc_ap = ref_models.voc_ap

    def recording_voc_ap(rec, prec):
        out = real_voc_ap(rec, prec)
        recorded.append(out[0])
        return out

    old = (ref_models.voc_ap, ref_models.plt, ref_models.draw_plot_func)
    ref_models.voc_ap = recording_voc_ap
    ref_models.plt = _NoopPlt()
    ref_models.draw_plot_func = lambda *a, **k: None
    try:
        ref_models.Yolov4.eval_map(None, str(gt_dir), str(pred_dir),
                                   str(ref_json), str(ref_out))
    finally:
        (ref_models.voc_ap, ref_models.plt,
         ref_models.draw_plot_func) = old

    gt_classes = sorted(normal + [rare])
    assert len(recorded) == len(gt_classes)
    ref_aps = dict(zip(gt_classes, recorded))
    ref_map = sum(recorded) / len(recorded)

    # --- our scorer ------------------------------------------------------
    got = evalmap.eval_map(str(gt_dir), str(pred_dir),
                           str(tmp_path / "our_json"),
                           str(tmp_path / "our_out"),
                           plot=False, verbose=False)
    got_map = got.pop("mAP")
    assert set(got.keys()) == set(gt_classes)  # ghost excluded, rare present
    for cls in gt_classes:
        assert got[cls] == pytest.approx(ref_aps[cls], abs=1e-9), cls
    assert got_map == pytest.approx(ref_map, abs=1e-9)
    assert got[rare] == 0.0

    # output.txt BYTE equality with the reference writer (reference
    # models.py:275,399,402) — third-party tooling reads this file, so the
    # text contract is pinned, not just the AP numbers.
    ref_txt = (ref_out / "output.txt").read_text()
    our_txt = (tmp_path / "our_out" / "output.txt").read_text()
    assert our_txt == ref_txt
    assert ref_txt.startswith("# AP and precision/recall per class\n")


@pytest.mark.slow
def test_keras_h5_reader_matches_darknet_loader(ref_modules, tmp_path):
    """A reference-model .h5 save loads into the same pytree the darknet
    byte parser produces (the .h5 migration path, dead code in the
    reference at models.py:75-81)."""
    tf, ref_layers, ref_utils = ref_modules
    from yolov4tpu import weights as w

    num_classes = 3
    wpath = str(tmp_path / "synthetic.weights")
    with open(wpath, "wb") as f:
        f.write(w.random_darknet_bytes(num_classes, seed=13))

    tf.keras.backend.clear_session()
    inp = tf.keras.layers.Input((96, 96, 3))
    ref_model = tf.keras.Model(inp, ref_layers.yolov4_neck(inp, num_classes))
    ref_utils.load_weights(ref_model, wpath)
    h5path = str(tmp_path / "ref.h5")
    ref_model.save_weights(h5path)

    p_dark, s_dark = w.load_darknet_weights(wpath, num_classes)
    p_h5, s_h5 = w.load_keras_h5(h5path, num_classes)

    for i, (a, b) in enumerate(zip(p_dark["convs"], p_h5["convs"])):
        for key in a:
            np.testing.assert_array_equal(b[key], a[key],
                                          err_msg=f"conv {i} {key}")
    for i, (a, b) in enumerate(zip(s_dark["bn"], s_h5["bn"])):
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_array_equal(b["mean"], a["mean"])
            np.testing.assert_array_equal(b["var"], a["var"])


def _real_weights_path():
    """Real pretrained COCO yolov4.weights, if any environment provides it.

    Checked in order: the YOLOV4_WEIGHTS env var, then well-known paths.
    The artifact is ~246 MB and is NOT in this image (zero egress), so the
    test below normally skips — but the moment any environment supplies the
    file, the flagship claim (decoded-box parity on REAL COCO weights,
    reference utils.py:12-53 / README quick start) is proven with zero
    extra work.
    """
    candidates = [os.environ.get("YOLOV4_WEIGHTS", "")]
    candidates += ["/root/yolov4.weights", "/root/repo/yolov4.weights",
                   os.path.expanduser("~/yolov4.weights")]
    for p in candidates:
        if p and os.path.isfile(p):
            return p
    return None


@pytest.mark.slow
@pytest.mark.skipif(_real_weights_path() is None,
                    reason="real COCO yolov4.weights not present (set "
                           "YOLOV4_WEIGHTS=/path/to/yolov4.weights)")
def test_real_coco_weights_parity_and_detections(ref_modules):
    """Opt-in golden parity on REAL pretrained COCO weights (the artifact
    the darknet loader exists for, reference utils.py:12-53; synthetic
    density-calibrated bytes stand in for it everywhere else).  Asserts
    (a) decoded boxes/scores/classes <=1e-3 vs the live reference through
    the complete inference pipeline on a real sample image, and (b) a
    sanity detection snapshot: the street scene must contain cars/people.
    """
    tf, ref_layers, ref_utils = ref_modules
    import cv2

    from yolov4tpu.api import Yolov4
    from yolov4tpu.config import YoloConfig

    wpath = _real_weights_path()
    num_classes = 80
    img = 416
    cfg = YoloConfig()

    raw = cv2.imread(os.path.join(REF, "img", "street.jpeg"))
    assert raw is not None
    x = cv2.resize(raw[:, :, ::-1], (img, img)).astype(np.float32) / 255.0
    x = x[None]

    # --- reference complete inference_model ---------------------------
    tf.keras.backend.clear_session()
    inp = tf.keras.layers.Input((img, img, 3))
    neck = ref_layers.yolov4_neck(inp, num_classes)
    ref_yolo = tf.keras.Model(inp, neck)
    ref_utils.load_weights(ref_yolo, wpath)
    anchors = np.asarray(cfg.anchors_grouped, np.float32)
    head = ref_layers.yolov4_head(neck, num_classes, anchors,
                                  np.asarray(cfg.xyscale, np.float32))
    ref_inference = tf.keras.Model(
        inp, ref_layers.nms(head, (img, img, 3), num_classes,
                            iou_threshold=cfg.iou_threshold,
                            score_threshold=cfg.score_threshold))
    ref_b, ref_s, ref_c, ref_v = [np.asarray(t)
                                  for t in ref_inference(x, training=False)]
    ref_v = ref_v.astype(np.int32)
    assert ref_v[0] >= 1, "reference found nothing on the street scene"

    # --- ours, all three NMS implementations --------------------------
    for impl in ("xla", "pallas", "fast"):
        model = Yolov4(weight_path=wpath,
                       class_name_path="class_names/coco_classes.txt",
                       config=cfg.replace(nms_impl=impl))
        got_b, got_s, got_c, got_v = [np.asarray(o)
                                      for o in model.predict_batch(x)]
        np.testing.assert_array_equal(got_v.astype(np.int32), ref_v,
                                      err_msg=f"{impl}: valid counts")
        n = int(ref_v[0])
        np.testing.assert_array_equal(
            got_c[0, :n].astype(np.int32), ref_c[0, :n].astype(np.int32),
            err_msg=f"{impl}: classes")
        np.testing.assert_allclose(got_s[0, :n], ref_s[0, :n], atol=1e-3,
                                   rtol=0, err_msg=f"{impl}: scores")
        np.testing.assert_allclose(got_b[0, :n], ref_b[0, :n], atol=1e-3,
                                   rtol=0, err_msg=f"{impl}: boxes")

    # --- detection snapshot: a street scene contains street things ----
    names = [l.strip() for l in open("class_names/coco_classes.txt")]
    detected = {names[int(c)] for c in got_c[0, :n]}
    assert detected & {"car", "person", "truck", "bus", "traffic light"}, (
        f"implausible street-scene detections: {detected}")
