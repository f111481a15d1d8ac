"""Float-vs-int8 mAP on a model trained on a REALISTIC synthetic dataset.

The sanity_overfit harness proves int8 keeps mAP 1.0 on a 2-image overfit —
a weak accuracy bar (VERDICT r2 weak #4).  This harness trains on a few
hundred generated multi-object scenes (noise backgrounds, brightness/scale
jitter, 1-5 objects of 4 shape classes per image), evaluates on a held-out
split, and reports the float-vs-int8 mAP delta through the FULL
export_prediction + Cartucho-format eval pipeline — for both activation
calibrations (max-abs and percentile), both dataflows.

Usage: python benchmarks/int8_realistic.py [--steps 4000] [--n 300]
         [--img 416] [--num-classes 21] [--bn-stats-gradient on|off]
         [--out results/foo.json]
Prints one JSON line with mAPs and deltas (delta = int8 − float mAP points,
NEGATIVE = int8 worse — matches the PERF_NOTES table convention) and
optionally writes it to --out for auditability.  --img 416 --num-classes 21
is the OPERATING-POINT accuracy run (the int8 SPEED claim is measured at
416²/80-class; accuracy must be proven at full depth/width too, where
per-tensor activation scales are most stressed).  --bn-stats-gradient off
is the convergence A/B for the +6% train-throughput flag
(YoloConfig.bn_stats_gradient=False): same seeds, same recipe, report
final mAP both ways.  Sized for the TPU (~10-30 min); a 1-core CPU host
takes hours.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLASSES = ["box", "disc", "cross", "ring"]

# >4 classes: identity = shape (5) x hue (up to 5) — 25 distinguishable
# classes for operating-point runs (class k: shape k%5, hue k//5).
SHAPE_NAMES = ["box", "disc", "cross", "ring", "tri"]
HUES = [(230, 60, 50), (60, 220, 70), (70, 90, 230), (235, 220, 60),
        (200, 80, 210)]


def class_names(n: int):
    if n <= len(CLASSES):
        return CLASSES[:n]
    assert n <= len(SHAPE_NAMES) * len(HUES), "at most 25 synthetic classes"
    return [f"{SHAPE_NAMES[k % 5]}_{k // 5}" for k in range(n)]


def draw_object(img, x1, y1, x2, y2, cls, rng, num_classes=4):
    """Draw one object; colors jittered so class identity is shape+hue."""
    import cv2

    cx, cy = (x1 + x2) // 2, (y1 + y2) // 2
    w, h = x2 - x1, y2 - y1
    if num_classes <= 4:
        shape = cls
        base = [(230, 60, 50), (60, 220, 70), (70, 90, 230),
                (235, 220, 60)][cls]
    else:
        shape = cls % 5
        base = HUES[cls // 5]
    color = tuple(int(np.clip(c + rng.integers(-40, 40), 0, 255))
                  for c in base)
    if shape == 0:
        cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
    elif shape == 1:
        cv2.ellipse(img, (cx, cy), (w // 2, h // 2), 0, 0, 360, color, -1)
    elif shape == 2:
        t = max(2, min(w, h) // 4)
        cv2.rectangle(img, (cx - t, y1), (cx + t, y2), color, -1)
        cv2.rectangle(img, (x1, cy - t), (x2, cy + t), color, -1)
    elif shape == 3:
        t = max(2, min(w, h) // 5)
        cv2.ellipse(img, (cx, cy), (w // 2, h // 2), 0, 0, 360, color, t)
    else:
        pts = np.array([[cx, y1], [x1, y2 - 1], [x2 - 1, y2 - 1]], np.int32)
        cv2.fillConvexPoly(img, pts, color)


def make_dataset(tmp, n, side, rng, num_classes=4, max_objects=5):
    import cv2

    os.makedirs(f"{tmp}/imgs", exist_ok=True)
    annos = []
    for i in range(n):
        img = rng.integers(0, 90, (side, side, 3)).astype(np.uint8)
        img = (img * rng.uniform(0.6, 1.4)).clip(0, 255).astype(np.uint8)
        boxes, tries = [], 0
        want = rng.integers(1, max_objects + 1)
        while len(boxes) < want and tries < 8 * max_objects:
            tries += 1
            # Object scale tracks the image side (14px at 96^2 is 15% of
            # the image; at 416^2 it is 3% — near-invisible, and a model
            # trained on such scenes overfits its tiny train set instead
            # of learning: 12k steps reached train loss 2.8 / val mAP
            # 0.015.  96^2 keeps its historical floor of 14.)
            w, h = rng.integers(max(14, side // 8), side // 2, 2)
            x1 = int(rng.integers(0, side - w))
            y1 = int(rng.integers(0, side - h))
            x2, y2 = x1 + int(w), y1 + int(h)
            if any(not (x2 < a or x1 > b or y2 < c or y1 > d)
                   for a, b, c, d, _ in boxes):
                continue
            cls = int(rng.integers(0, num_classes))
            draw_object(img, x1, y1, x2, y2, cls, rng, num_classes)
            boxes.append((x1, y1, x2, y2, cls))
        name = f"s{i}.jpg"
        cv2.imwrite(f"{tmp}/imgs/{name}", img[:, :, ::-1])
        annos.append(name + " " + " ".join(
            f"{a},{b},{c},{d},{k}" for a, b, c, d, k in boxes))
    return annos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--img", type=int, default=96)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--num-classes", type=int, default=4,
                    help=">4 uses shape x hue identities (max 25); 21+ is "
                         "the operating-point accuracy run")
    ap.add_argument("--max-objects", type=int, default=5)
    ap.add_argument("--score-threshold", type=float, default=0.3,
                    help="export/NMS score threshold.  0.3 is the "
                         "reference operating default; mAP evaluation "
                         "conventionally exports at a LOW threshold "
                         "(0.05) so recall at low confidence counts — "
                         "use that for operating-point accuracy runs")
    ap.add_argument("--lr", type=float, default=2e-3,
                    help="cosine-annealing peak LR (A/B runs may need a "
                         "lower peak: bn_stats_gradient=off NaNs at 2e-3)")
    ap.add_argument("--bn-stats-gradient", choices=("on", "off"),
                    default="on",
                    help="A/B the bn_stats_gradient=False throughput flag: "
                         "'off' trains with BN batch statistics treated as "
                         "constants in the backward pass")
    ap.add_argument("--out", default=None,
                    help="also write the result JSON line to this path "
                         "(auditable artifact, e.g. benchmarks/results/...)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env-var platform selection "
                         "is ignored once accelerator plugins are installed)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from _cache import enable as _enable_cache
    _enable_cache()
    import cv2
    import jax
    import jax.numpy as jnp

    from yolov4tpu.api import Yolov4
    from yolov4tpu.config import YoloConfig
    from yolov4tpu.data.encode import preprocess_true_boxes
    from yolov4tpu.train import Trainer, cosine_annealing_schedule

    rng = np.random.default_rng(11)
    names = class_names(args.num_classes)
    tmp = tempfile.mkdtemp(prefix="int8_realistic_")
    annos = make_dataset(tmp, args.n, args.img, rng,
                         num_classes=args.num_classes,
                         max_objects=args.max_objects)
    n_val = min(max(4, args.n // 5), args.n // 2)
    train_lines, val_lines = annos[:-n_val], annos[-n_val:]
    open(f"{tmp}/anno_train.txt", "w").write("\n".join(train_lines) + "\n")
    open(f"{tmp}/anno_val.txt", "w").write("\n".join(val_lines) + "\n")
    open(f"{tmp}/classes.txt", "w").write("\n".join(names) + "\n")

    side = args.img
    cfg = YoloConfig(img_size=(side, side, 3), batch_size=args.batch,
                     csp_repeats=(1, 1, 1, 1, 1), learning_rate=args.lr,
                     compute_dtype="bfloat16",
                     score_threshold=args.score_threshold,
                     nms_pre_top_k=128,
                     bn_stats_gradient=args.bn_stats_gradient == "on")
    model = Yolov4(weight_path=None, class_name_path=f"{tmp}/classes.txt",
                   config=cfg, seed=3)

    # Preload + pre-encode the whole (tiny) train set once.
    def load(lines):
        imgs, boxes = [], np.zeros((len(lines), 100, 5), np.float32)
        for i, line in enumerate(lines):
            parts = line.split()
            im = cv2.imread(f"{tmp}/imgs/{parts[0]}")[:, :, ::-1]
            imgs.append(im.astype(np.float32) / 255.0)
            for j, bx in enumerate(parts[1:]):
                boxes[i, j] = [float(v) for v in bx.split(",")]
        return np.stack(imgs), boxes

    timgs, tboxes = load(train_lines)
    labels, xywh = preprocess_true_boxes(
        tboxes, (side, side), cfg.anchors_flat, len(names))

    sched = cosine_annealing_schedule(args.lr, 1e-5, cycle_epochs=1,
                                      steps_per_epoch=max(args.steps, 1))
    tr = Trainer(cfg, len(names), model.params, model.state,
                 schedule=sched)
    n_train = len(train_lines)
    # Device-resident dataset, batches gathered ON device.  Slicing host
    # arrays per step ships ~50 MB/step (416^2) through the transfer queue
    # with no backpressure — a 4000-step run enqueues ~200 GB and OOMs the
    # HOST at ~130 GB anon-rss (observed 2026-08-19).  The whole dataset is
    # <1 GB, so park it in HBM once and index it there.
    timgs_d = jax.device_put(timgs)
    labels_d = [jax.device_put(l) for l in labels]
    xywh_d = jax.device_put(xywh)
    order = np.arange(n_train)
    bs, pos = args.batch, 0
    for step in range(args.steps):
        if pos + bs > n_train:
            rng.shuffle(order)
            pos = 0
        idx = jnp.asarray(order[pos:pos + bs])
        pos += bs
        batch = {"image": jnp.take(timgs_d, idx, axis=0),
                 "labels": [jnp.take(l, idx, axis=0) for l in labels_d],
                 "boxes": jnp.take(xywh_d, idx, axis=0)}
        m = tr.train_step(batch)
        if step % 250 == 0:
            # float() blocks: doubles as dispatch-queue backpressure.
            print(f"# step {step} loss {float(m['loss']):.3f}",
                  file=sys.stderr, flush=True)
    model.sync_from_trainer(tr)

    calib = timgs[:64]  # calibration = training distribution
    gt_dir = f"{tmp}/gt"
    model.export_gt(f"{tmp}/anno_val.txt", gt_dir)

    def eval_variant(tag):
        pred = f"{tmp}/pred_{tag}"
        model.export_prediction(f"{tmp}/anno_val.txt", pred, f"{tmp}/imgs",
                                verbose=False)
        res = model.eval_map(gt_dir, pred, f"{tmp}/json_{tag}",
                             f"{tmp}/out_{tag}", plot=False, verbose=False)
        return res

    out = {"steps": args.steps, "n_train": n_train, "n_val": n_val,
           "img": side, "num_classes": args.num_classes,
           "score_threshold": args.score_threshold,
           "bn_stats_gradient": args.bn_stats_gradient == "on",
           "final_loss": round(float(m["loss"]), 3)}
    res_f = eval_variant("float")
    out["mAP_float"] = res_f.pop("mAP")
    out["per_class_float"] = res_f
    for method in ("max", "percentile"):
        for dataflow in ("int8", "bf16"):
            model.quantize(calib_imgs=calib, dataflow=dataflow,
                           calib_method=method)
            tag = f"{method}_{dataflow}"
            out[f"mAP_int8_{tag}"] = eval_variant(tag)["mAP"]
            # delta = int8 - float (NEGATIVE = int8 worse), matching the
            # PERF_NOTES table convention (ADVICE r3).
            out[f"delta_{tag}"] = round(
                out[f"mAP_int8_{tag}"] - out["mAP_float"], 6)
            model.dequantize()
    line = json.dumps(out)
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
