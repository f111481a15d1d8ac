"""AOT-export a detector for serving, then run the artifact.

The exported file is a self-contained StableHLO program (weights baked in):
the serve side needs jax only — not this package, not the weight files.

Usage:
    # export (any machine with the weights)
    python examples/export_serving.py export --weights yolov4.weights \
        --out yolov4_b8.shlo --batch 8

    # serve / smoke-run the artifact (jax only)
    python examples/export_serving.py run --artifact yolov4_b8.shlo \
        --image street.jpeg
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cmd_export(args):
    from yolov4tpu import Yolov4, YoloConfig, serving

    cfg = YoloConfig(compute_dtype="bfloat16" if args.bf16 else "float32")
    model = Yolov4(weight_path=args.weights, class_name_path=args.classes,
                   config=cfg)
    serving.export_detector(model, args.out, batch_size=args.batch,
                            input_dtype="uint8" if args.uint8 else "float32")
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"exported {args.out} ({size_mb:.1f} MB, batch={args.batch})")


def cmd_run(args):
    import cv2
    import numpy as np

    from yolov4tpu import serving

    detect = serving.load_detector(args.artifact)
    img = cv2.imread(args.image)[:, :, ::-1]
    # The artifact carries its fixed input signature; build the batch from
    # it (a uint8-wire artifact rejects float input and vice versa).
    batch, h, w, _ = detect.input_shape
    x = np.zeros(detect.input_shape, detect.input_dtype)
    r = cv2.resize(img, (w, h))
    x[0] = r if detect.input_dtype == np.uint8 else r.astype(np.float32) / 255.0
    boxes, scores, classes, valid = [np.asarray(o) for o in detect(x)]
    n = int(valid[0])
    print(f"{n} detections")
    for b, s, c in zip(boxes[0, :n], scores[0, :n], classes[0, :n]):
        print(f"  class={int(c)} score={s:.3f} box={np.round(b, 3)}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("export")
    e.add_argument("--weights", required=True)
    e.add_argument("--classes", default="class_names/coco_classes.txt")
    e.add_argument("--out", required=True)
    e.add_argument("--batch", type=int, default=8)
    e.add_argument("--bf16", action="store_true")
    e.add_argument("--uint8", action="store_true",
                   help="artifact takes raw uint8 rasters (/255 baked in; "
                        "4x less transfer per request)")

    r = sub.add_parser("run")
    r.add_argument("--artifact", required=True)
    r.add_argument("--image", required=True)

    args = ap.parse_args()
    if args.cmd == "export":
        cmd_export(args)
    else:
        cmd_run(args)


if __name__ == "__main__":
    main()
