"""Host input-pipeline throughput: native C++ path vs python/numpy path.

Generates a synthetic on-disk dataset, then measures images/sec through
DataGenerator batch assembly (decode + resize + label encode) both ways.
Importable as ``measure()`` so bench.py can record host-pipeline numbers
alongside the device numbers (the host must be able to FEED the device's
img/s or it is the real end-to-end ceiling).

Usage: python benchmarks/bench_data.py [--n 64] [--batch 8]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

if __name__ == "__main__":  # direct-script use without installed package
    sys.path.insert(0,
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n: int = 64, batch: int = 8, img: int = 416,
            cleanup: bool = True) -> dict:
    """Build a synthetic dataset and time DataGenerator batch assembly.

    Returns {"python_img_per_s", "python_raw_boxes_img_per_s",
    "native_available", "native_threads"[, "native_img_per_s",
    "native_raw_boxes_img_per_s", "speedup"]}.
    """
    import cv2

    from yolov4tpu import native
    from yolov4tpu.config import YoloConfig
    from yolov4tpu.data.pipeline import DataGenerator

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="benchdata_")
    try:
        classes = os.path.join(tmp, "classes.txt")
        with open(classes, "w") as f:
            f.write("a\nb\nc\n")
        lines = []
        for i in range(n):
            h, w = rng.integers(300, 700), rng.integers(300, 700)
            cv2.imwrite(os.path.join(tmp, f"i{i}.jpg"),
                        rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
            boxes = " ".join(
                f"{x},{y},{x+50},{y+60},{rng.integers(0, 3)}"
                for x, y in rng.integers(10, 200, (5, 2)))
            lines.append(f"i{i}.jpg {boxes}\n")

        def run(use_native, encode_on_device=False):
            cfg = YoloConfig(img_size=(img, img, 3),
                             batch_size=batch,
                             encode_on_device=encode_on_device)
            gen = DataGenerator(lines, classes, tmp, config=cfg,
                                shuffle=False, use_native=use_native, seed=0)
            # warm one batch (file cache), then time a full pass
            gen.get_batch(0)
            t0 = time.perf_counter()
            n_img = 0
            for i in range(len(gen)):
                b = gen.get_batch(i)
                n_img += len(b["image"])
            return n_img / (time.perf_counter() - t0)

        py_ips = run(False)
        out = {"python_img_per_s": round(py_ips, 1),
               # encode_on_device=True: host ships raw boxes, the accelerator
               # scatters the label grids inside the train step — this is the
               # host-side relief that buys.
               "python_raw_boxes_img_per_s": round(run(False, True), 1),
               "native_available": native.available(),
               "native_threads": native.num_threads()}
        if native.available():
            out["native_img_per_s"] = round(run(True), 1)
            out["native_raw_boxes_img_per_s"] = round(run(True, True), 1)
            out["speedup"] = round(out["native_img_per_s"] / py_ips, 2)
        return out
    finally:
        if cleanup:
            shutil.rmtree(tmp, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=416)
    args = ap.parse_args()
    print(json.dumps(measure(args.n, args.batch, args.img)))


if __name__ == "__main__":
    main()
