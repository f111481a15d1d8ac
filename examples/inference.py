"""Pretrained COCO inference demo (mirror of the reference Inference notebook).

Usage:
    python examples/inference.py --weights yolov4.weights --image street.jpeg
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True,
                    help="AlexeyAB darknet yolov4.weights or .npz checkpoint")
    ap.add_argument("--image", required=True)
    ap.add_argument("--classes", default="class_names/coco_classes.txt")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute (fastest full-precision on TPU)")
    ap.add_argument("--int8", action="store_true",
                    help="post-training int8 quantization, calibrated on "
                         "the input image (use representative frames in "
                         "production; +26%% throughput, detection-level "
                         "accuracy)")
    args = ap.parse_args()

    from yolov4tpu import Yolov4, YoloConfig

    cfg = YoloConfig(compute_dtype="bfloat16" if (args.bf16 or args.int8)
                     else "float32")
    model = Yolov4(weight_path=args.weights, class_name_path=args.classes,
                   config=cfg)
    if args.int8:
        model.quantize(calib_paths=[args.image])
    detections = model.predict(args.image, plot_img=False)
    print(detections.to_string())


if __name__ == "__main__":
    main()
