"""Real-pretrained-weights fidelity run (VERDICT r05 item 6).

The BASELINE contract (BASELINE.json configs[0]) is per-box <=1e-3 parity
*against real COCO yolov4.weights* (the artifact reference utils.py:12-53
loads).  The weights file (~246 MB) is not in this zero-egress image, so
this runner is the one-command hook a weights-equipped operator executes
the moment the file is available:

    YOLOV4_WEIGHTS=/path/to/yolov4.weights python benchmarks/real_weights_parity.py

It then:
  1. loads the real weights through the darknet stream loader;
  2. runs the complete inference pipeline (forward + decode + NMS, all
     three NMS implementations) on every image in /root/reference/img/;
  3. cross-checks the three NMS implementations against each other
     (<=1e-3 boxes/scores, equal classes/counts);
  4. if the LIVE reference (TF + /root/reference) is importable, runs the
     reference inference_model on the same inputs and asserts decoded-box
     <=1e-3 parity — the flagship BASELINE claim;
  5. drives the mAP pipeline end-to-end on the real detections
     (predictions-as-ground-truth must score mAP == 1.0 — pipeline
     integrity, not model quality);
  6. writes a committed JSON artifact (benchmarks/results/
     real_weights_parity.json) with the detection tables and every check's
     outcome, so the run is reviewable after the fact.

Without the weights file it prints how to get one and exits 2 (so CI can
distinguish "skipped" from "failed").  The pytest twin of step 4 is
tests/test_golden_parity.py::test_real_coco_weights_parity_and_detections.

Self-validation without the artifact: ``YOLOV4_WEIGHTS=synthetic`` runs
the identical flow on a generated 80-class .weights file whose head
biases are calibrated to a realistic detection density (~120
candidates/image, the tests/test_golden_parity.py recipe).  Plain random
weights are NOT usable for the differential: with the reference's
N(0, 0.01) init, activations decay to ~1e-22 through the 110-conv depth,
so every grid cell's score ties its head bias exactly and cross-framework
NMS ordering of thousands of tied candidates is chaotic.  Calibration
separates the scores, making the <=1e-3 contract meaningful.  The
synthetic run writes synthetic_weights_parity.json (committed as proof
the flow runs green end-to-end); the real artifact's run writes
real_weights_parity.json.
"""

import json
import os
import sys
import time

import numpy as np

if __name__ == "__main__":  # direct-script use without installed package
    sys.path.insert(0,
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = os.environ.get("YOLOV4_REFERENCE", "/root/reference")
SYNTHETIC = os.environ.get("YOLOV4_WEIGHTS", "").lower() == "synthetic"
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results",
    "synthetic_weights_parity.json" if SYNTHETIC
    else "real_weights_parity.json")


_T0 = time.monotonic()


def _stage(msg):
    """Flushed, timestamped progress line: a killed run's tail must show
    how far it got (remote-compile latency is high-variance here)."""
    print(f"[parity t+{time.monotonic() - _T0:6.1f}s] {msg}", flush=True)


def _write_report(report, complete=False):
    """Write the artifact after EVERY check so a wall-clock kill still
    leaves a truthful partial record; ``complete`` marks the final write."""
    report["complete"] = complete
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)


def _weights_path():
    cands = [os.environ.get("YOLOV4_WEIGHTS", ""), "/root/yolov4.weights",
             "/root/repo/yolov4.weights",
             os.path.expanduser("~/yolov4.weights")]
    for p in cands:
        if p and os.path.isfile(p):
            return p
    return None


def _calibrated_synthetic(x, cfg, out_path):
    """Generate an 80-class darknet .weights file whose head biases are
    calibrated so x produces ~120 above-threshold candidates per image —
    the tests/test_golden_parity.py 416^2 decoded-box recipe (see module
    docstring for why plain random weights can't drive the differential)."""
    import io as _io

    from yolov4tpu import weights as w
    from yolov4tpu.models import network

    base = w.random_darknet_bytes(80, seed=21)
    params, state = w.load_darknet_weights(_io.BytesIO(base), 80)
    raws0 = [np.asarray(r) for r in network.apply_folded(
        network.fold_bn(params, state), x, 80)]
    params, _ = w.calibrate_detection_density(
        params, raws0, 80, cfg.score_threshold, target_per_image=120.0)
    w.save_darknet_weights(params, state, out_path)
    return out_path


def _image_paths():
    img_dir = os.path.join(REF, "img")
    if not os.path.isdir(img_dir):
        return []
    return sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir)
                  if f.lower().endswith((".jpg", ".jpeg", ".png")))


def main() -> int:
    wpath = None if SYNTHETIC else _weights_path()
    if wpath is None and not SYNTHETIC:
        print("real_weights_parity: no yolov4.weights found.  Set "
              "YOLOV4_WEIGHTS=/path/to/yolov4.weights (the 246 MB darknet "
              "release artifact, e.g. from the AlexeyAB/darknet release "
              "page) and re-run, or YOLOV4_WEIGHTS=synthetic to "
              "self-validate the flow on calibrated synthetic weights.",
              file=sys.stderr)
        return 2

    import cv2
    import jax

    from yolov4tpu.api import Yolov4
    from yolov4tpu.config import YoloConfig

    # True-f32 convs: on TPU the DEFAULT precision computes f32 convs with
    # bf16 multiply passes — fine for detection quality, but through the
    # 110-conv depth it moves near-threshold scores by ~0.1+, so the
    # <=1e-3 differential vs TF-CPU needs HIGHEST (exact f32) here.
    jax.config.update("jax_default_matmul_precision", "highest")
    # Persistent compile cache: the flow compiles ~4 big 416^2 programs
    # remotely; compile latency is high-variance on the tunnel, so reruns
    # must be warm or a slow compile day blows any wall-clock budget.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/yolov4tpu_parity_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = YoloConfig()
    paths = _image_paths()
    if not paths:
        print(f"real_weights_parity: no images under {REF}/img",
              file=sys.stderr)
        return 2

    imgs = []
    raw_sizes = []  # (h, w) per image, for denormalising self-GT boxes
    for p in paths:
        raw = cv2.imread(p)
        assert raw is not None, p
        raw_sizes.append(raw.shape[:2])
        imgs.append(cv2.resize(raw[:, :, ::-1], (416, 416))
                    .astype(np.float32) / 255.0)
    x = np.stack(imgs)

    if SYNTHETIC:
        import tempfile as _tf
        wpath = _calibrated_synthetic(
            x, cfg, os.path.join(_tf.gettempdir(),
                                 "yolov4_synth_calibrated.weights"))
        _stage(f"synthetic mode: calibrated weights at {wpath}")
    report = {"weights": wpath + (" (synthetic, calibrated)"
                                  if SYNTHETIC else ""),
              "images": paths, "checks": {},
              "detections": {}, "timestamp": time.strftime("%F %T")}

    # --- 2+3: all three NMS implementations agree on real weights -------
    outs = {}
    model_xla = None  # reused by the mAP stage (warm jit cache)
    for impl in ("xla", "pallas", "fast"):
        model = Yolov4(weight_path=wpath,
                       class_name_path="class_names/coco_classes.txt",
                       config=cfg.replace(nms_impl=impl))
        if impl == "xla":
            model_xla = model
        _stage(f"[{impl}] compiling+running predict_batch")
        outs[impl] = [np.asarray(o) for o in model.predict_batch(x)]
        print(f"[{impl}] valid detections per image:",
              outs[impl][3].astype(int).tolist(), flush=True)
    names = [l.strip() for l in open("class_names/coco_classes.txt")]
    b0, s0, c0, v0 = outs["xla"]
    for i, p in enumerate(paths):
        n = int(v0[i])
        report["detections"][os.path.basename(p)] = [
            {"box": [round(float(z), 4) for z in b0[i, j]],
             "score": round(float(s0[i, j]), 4),
             "class": names[int(c0[i, j])]} for j in range(n)]
    impl_ok = True
    for impl in ("pallas", "fast"):
        b, s, c, v = outs[impl]
        impl_ok &= bool((v.astype(int) == v0.astype(int)).all())
        for i in range(len(paths)):
            n = int(v0[i])
            impl_ok &= bool((c[i, :n].astype(int) == c0[i, :n].astype(int)
                             ).all())
            impl_ok &= bool(np.abs(s[i, :n] - s0[i, :n]).max() <= 1e-3)
            impl_ok &= bool(np.abs(b[i, :n] - b0[i, :n]).max() <= 1e-3)
    report["checks"]["nms_impls_agree_1e-3"] = impl_ok
    _stage("NMS impl cross-check (<=1e-3): " + ("OK" if impl_ok else "FAIL"))
    _write_report(report)

    # --- 4: live-reference differential (optional) ----------------------
    # keras-2 era reference: route tf.keras to the legacy tf_keras package
    # and disable oneDNN accumulation reordering (same env as tests/
    # conftest.py) BEFORE tensorflow imports.
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
    if not hasattr(np, "product"):  # reference loader uses np.product
        np.product = np.prod
    try:
        sys.path.insert(0, REF)
        import tensorflow as tf  # noqa: F401
        from custom_layers import (nms as ref_nms, yolov4_head,
                                   yolov4_neck)
        from utils import load_weights as ref_load

        tf.keras.backend.clear_session()
        inp = tf.keras.layers.Input((416, 416, 3))
        neck = yolov4_neck(inp, 80)
        ref_yolo = tf.keras.Model(inp, neck)
        ref_load(ref_yolo, wpath)
        head = yolov4_head(neck, 80, np.asarray(cfg.anchors_grouped,
                                                np.float32),
                           np.asarray(cfg.xyscale, np.float32))
        ref_inf = tf.keras.Model(
            inp, ref_nms(head, (416, 416, 3), 80,
                         iou_threshold=cfg.iou_threshold,
                         score_threshold=cfg.score_threshold))
        # Eager call, not .predict: grappler's FusedBatchNorm+Mish remap is
        # unimplemented on this TF build (see tests/test_golden_parity.py).
        rb, rs, rc, rv = [np.asarray(t) for t in ref_inf(x, training=False)]
    except Exception as e:  # noqa: BLE001 — the differential is optional
        report["checks"]["reference_parity_1e-3"] = f"skipped ({e})"
        _stage(f"live reference unavailable ({e}); skipping differential")
        _write_report(report)
    else:
        ref_ok = bool((rv.astype(int) == v0.astype(int)).all())
        max_db = max_ds = 0.0
        for i in range(len(paths)):
            n = int(rv[i])
            ref_ok &= bool((c0[i, :n].astype(int) == rc[i, :n].astype(int)
                            ).all())
            if n:
                max_db = max(max_db, float(np.abs(b0[i, :n]
                                                  - rb[i, :n]).max()))
                max_ds = max(max_ds, float(np.abs(s0[i, :n]
                                                  - rs[i, :n]).max()))
        ref_ok &= max_db <= 1e-3 and max_ds <= 1e-3
        report["checks"]["reference_parity_1e-3"] = ref_ok
        report["checks"]["reference_max_box_delta"] = max_db
        report["checks"]["reference_max_score_delta"] = max_ds
        _stage(f"reference differential: max box delta {max_db:.2e}, "
               f"max score delta {max_ds:.2e} -> "
               + ("OK" if ref_ok else "FAIL"))
        _write_report(report)

    # --- 5: mAP pipeline integrity on the real detections ---------------
    # Predictions-as-ground-truth should score ~1.0 — proves the GT export,
    # prediction export, matching, and scorer wiring on real images (not
    # model quality; the GT *is* the model's own output).  Boxes are
    # denormalised to original-image pixels, the annotation-file contract
    # (reference dataset format: "img.jpg x1,y1,x2,y2,cid ...").
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        lines = []
        for i, p in enumerate(paths):
            det = report["detections"][os.path.basename(p)]
            if not det:
                continue
            ih, iw = raw_sizes[i]
            boxes = " ".join(
                "%d,%d,%d,%d,%d" % (round(d["box"][0] * iw),
                                    round(d["box"][1] * ih),
                                    round(d["box"][2] * iw),
                                    round(d["box"][3] * ih),
                                    names.index(d["class"]))
                for d in det)
            lines.append(f"{os.path.basename(p)} {boxes}\n")
        if not lines:
            report["checks"]["map_pipeline_self_consistency"] = (
                "skipped (no detections above score threshold)")
            print("mAP pipeline: skipped — no detections to self-score")
        anno = os.path.join(tmp, "anno.txt")
        with open(anno, "w") as f:
            f.writelines(lines)
        if lines:
            # Reuse the xla model: its b=len(paths) predict program is
            # already compiled, so the export loop pays no new compile.
            model = model_xla
            dirs = {k: os.path.join(tmp, k)
                    for k in ("gt", "pred", "json", "out")}
            model.export_gt(anno, dirs["gt"])
            model.export_prediction(anno, dirs["pred"],
                                    os.path.join(REF, "img"),
                                    bs=len(paths), verbose=False)
            res = model.eval_map(dirs["gt"], dirs["pred"], dirs["json"],
                                 dirs["out"], plot=False, verbose=False)
            map_val = float(res["mAP"])
            report["checks"]["map_pipeline_self_consistency"] = map_val
            # >=0.95, not ==1.0: GT pixel rounding can demote a borderline
            # match at IoU 0.5.
            report["checks"]["map_pipeline_ok"] = bool(map_val >= 0.95)
            _stage(f"mAP pipeline on real detections (self-GT): {map_val:.4f}")

    _write_report(report, complete=True)
    _stage(f"artifact written: {OUT}")
    hard = [v for v in report["checks"].values() if v is False]
    return 1 if hard else 0


if __name__ == "__main__":
    sys.exit(main())
