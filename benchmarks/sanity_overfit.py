"""End-to-end LEARNING sanity: train from scratch until real detections
emerge, then score them with the full mAP pipeline.

Loss-decreases tests prove the optimizer moves; golden-parity tests prove
the math matches the reference.  Neither proves the loop closes — that a
model TRAINED by this framework produces correct detections through the
inference decode + NMS + export + Cartucho scorer.  This harness does:
two synthetic 64x64 images with solid colored rectangles, a shallow
(1,1,1,1,1) YOLOv4 trained ~3000 steps, then export_gt/export_prediction/
eval_map.  Expected result: mAP == 1.0 (measured on v5e: scores reach
~0.96, boxes within a pixel or two of GT; detections stay input-conditioned
— each image finds ITS rectangle, not a memorized average).

Sized for the TPU (~25 s of step time + compiles; a 1-core CPU host takes
~90 min, hence a benchmarks/ harness rather than a CI test).

Usage: python benchmarks/sanity_overfit.py [--steps 3000]
Prints one JSON line {"mAP": ..., "per_class": {...}, "steps": N}.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--img", type=int, default=64)
    args = ap.parse_args()

    from _cache import enable as _enable_cache
    _enable_cache()
    import cv2
    import jax.numpy as jnp

    from yolov4tpu.api import Yolov4
    from yolov4tpu.config import YoloConfig
    from yolov4tpu.data.encode import preprocess_true_boxes
    from yolov4tpu.train import Trainer

    tmp = tempfile.mkdtemp(prefix="sanity_overfit_")
    os.makedirs(tmp + "/imgs")
    rng = np.random.default_rng(0)
    side = args.img
    gtboxes = [
        ("o0.jpg", [(10, 12, 34, 40, 0)]),
        ("o1.jpg", [(30, 28, 56, 52, 1)]),
    ]
    annos = []
    for name, boxes in gtboxes:
        img = rng.integers(0, 60, (side, side, 3)).astype(np.uint8)
        for (x1, y1, x2, y2, c) in boxes:
            img[y1:y2, x1:x2] = [(255, 40, 40), (40, 255, 40)][c]
        cv2.imwrite(f"{tmp}/imgs/{name}", img[:, :, ::-1])
        annos.append(name + " " + " ".join(
            f"{x1},{y1},{x2},{y2},{c}" for (x1, y1, x2, y2, c) in boxes))
    open(tmp + "/anno.txt", "w").write("\n".join(annos) + "\n")
    open(tmp + "/classes.txt", "w").write("red\ngreen\nblue\n")

    cfg = YoloConfig(img_size=(side, side, 3), batch_size=2,
                     csp_repeats=(1, 1, 1, 1, 1), learning_rate=2e-3,
                     score_threshold=0.3, nms_pre_top_k=64)
    model = Yolov4(weight_path=None, class_name_path=tmp + "/classes.txt",
                   config=cfg, seed=3)

    imgs = np.stack([
        cv2.imread(f"{tmp}/imgs/{n}")[:, :, ::-1].astype(np.float32) / 255.0
        for n, _ in gtboxes])
    boxes = np.zeros((2, 100, 5), np.float32)
    for i, (_, bs) in enumerate(gtboxes):
        for j, b in enumerate(bs):
            boxes[i, j] = b
    labels, xywh = preprocess_true_boxes(boxes, (side, side),
                                         cfg.anchors_flat, 3)
    batch = {"image": jnp.asarray(imgs),
             "labels": [jnp.asarray(l) for l in labels],
             "boxes": jnp.asarray(xywh)}

    tr = Trainer(cfg, 3, model.params, model.state)
    for step in range(args.steps):
        m = tr.train_step(batch)
        if step % 500 == 0:
            print(f"# step {step} loss {float(m['loss']):.3f}",
                  file=sys.stderr, flush=True)

    model.sync_from_trainer(tr)
    dirs = {k: f"{tmp}/{k}" for k in ("gt", "pred", "json", "out")}
    model.export_gt(tmp + "/anno.txt", dirs["gt"])
    model.export_prediction(tmp + "/anno.txt", dirs["pred"], tmp + "/imgs",
                            verbose=False)
    res = model.eval_map(dirs["gt"], dirs["pred"], dirs["json"], dirs["out"],
                         plot=False, verbose=False)
    out = {"mAP": res.pop("mAP"), "per_class": res, "steps": args.steps,
           "final_loss": round(float(m["loss"]), 4)}

    # int8 accuracy on a genuinely TRAINED model (the synthetic-weight
    # quantize tests only see He-scaled noise): quantize with the training
    # images as calibration, rerun the full export+eval pipeline, and
    # require mAP unchanged.  This is the strongest accuracy evidence PTQ
    # gets without real COCO weights in the environment.
    model.quantize(calib_imgs=imgs)
    dirs_q = {k: f"{tmp}/{k}_int8" for k in ("pred", "json", "out")}
    model.export_prediction(tmp + "/anno.txt", dirs_q["pred"], tmp + "/imgs",
                            verbose=False)
    res_q = model.eval_map(dirs["gt"], dirs_q["pred"], dirs_q["json"],
                           dirs_q["out"], plot=False, verbose=False)
    out["mAP_int8"] = res_q.pop("mAP")

    print(json.dumps(out))
    assert out["mAP"] == 1.0, f"learning sanity failed: {out}"
    assert out["mAP_int8"] == 1.0, f"int8 degraded the detector: {out}"


if __name__ == "__main__":
    main()
