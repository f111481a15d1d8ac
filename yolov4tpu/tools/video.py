"""Video inference: annotate a video file (or stream) with detections.

Frames are decoded in a producer thread, batched, run through the jitted
inference pipeline, and drawn back at original resolution — the same
host/device overlap as ``Yolov4.predict_paths``.  The reference had no
video support; this is the natural extension of its ``predict`` API.

Usage (CLI)::

    python -m yolov4tpu.tools.video --weights yolov4.weights \
        --classes class_names/coco_classes.txt \
        --input in.mp4 --output out.mp4 [--bs 8] [--score 0.5]
"""

from __future__ import annotations

from typing import Optional


def annotate_video(model, input_path: str, output_path: str, bs: int = 8,
                   score_threshold: Optional[float] = None,
                   max_frames: Optional[int] = None,
                   verbose: bool = True) -> int:
    """Run detection over every frame of ``input_path`` and write an
    annotated video to ``output_path``.  Returns the frame count."""
    import cv2
    import numpy as np

    from ..utils.stream import threaded_map
    from ..utils.visualize import draw_bbox, get_detection_data

    cap = cv2.VideoCapture(input_path)
    if not cap.isOpened():
        raise FileNotFoundError(input_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(output_path,
                             cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))

    def read_batches():
        done = False
        count = 0
        while not done:
            raws = []
            while len(raws) < bs:
                if max_frames is not None and count >= max_frames:
                    done = True
                    break
                ok, frame = cap.read()
                if not ok:
                    done = True
                    break
                raws.append(frame[:, :, ::-1])  # BGR -> RGB
                count += 1
            if raws:
                yield raws

    def preprocess(raws):
        # Wire format (uint8 vs float) + producer-thread device placement
        # are decided by the shared facade loader — see
        # Yolov4._batch_from_rgb.
        imgs, transforms = model._batch_from_rgb(raws, bs)
        return raws, imgs, transforms

    n = 0
    for raws, imgs, transforms in threaded_map(preprocess, read_batches()):
        outs = [np.asarray(o) for o in model.predict_batch(
            imgs, score_threshold=score_threshold)]
        for k, raw in enumerate(raws):
            row = [o[k:k + 1] for o in outs]
            df = get_detection_data(img=raw, model_outputs=row,
                                    class_names=model.class_names,
                                    letterbox_transform=transforms[k])
            frame = draw_bbox(np.ascontiguousarray(raw), df,
                              cmap=model.class_color, random_color=False,
                              show_img=False, show_text=True)
            writer.write(np.asarray(frame)[:, :, ::-1].astype(np.uint8))
            n += 1
        if verbose and n % (bs * 10) == 0:
            print(f"{n} frames", flush=True)
    cap.release()
    writer.release()
    if verbose:
        print(f"wrote {n} annotated frames to {output_path}")
    return n


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--classes", required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--score", type=float, default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    args = ap.parse_args()

    from ..api import Yolov4
    from ..config import YoloConfig

    model = Yolov4(weight_path=args.weights, class_name_path=args.classes,
                   config=YoloConfig(compute_dtype="bfloat16"))
    annotate_video(model, args.input, args.output, bs=args.bs,
                   score_threshold=args.score, max_frames=args.max_frames)


if __name__ == "__main__":
    main()
