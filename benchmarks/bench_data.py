"""Host input-pipeline throughput: native C++ ingest vs python/cv2 paths.

Generates a synthetic on-disk dataset, then measures images/sec through
DataGenerator batch assembly (file read + JPEG decode + resize + label
encode) along every pipeline variant:

  - python:        cv2 decode+resize, 1 worker (the true python baseline —
                   what the reference's DataGenerator does, utils.py:187-207)
  - python_pool:   same work fanned across os.cpu_count() GIL-releasing
                   threads (cv2 releases the GIL inside decode/resize)
  - native:        fused C++ ingest — read+libjpeg decode (DCT-scaled)+
                   resize+normalise+box rescale+label encode under one
                   OpenMP loop, ONE GIL release per batch
  - native_exact:  same, full-resolution decode (bit-compatible with cv2)
  - augmented:     mosaic+flip+HSV through the pooled python path with
                   native JPEG decode (round 3: augmentation forfeited all
                   parallelism AND the native path; now it keeps both)
  - *_raw_boxes:   encode_on_device=True variants (host ships raw boxes,
                   the accelerator encodes the grids in the train step)

Importable as ``measure()`` so bench.py can record host-pipeline numbers
alongside the device numbers (the host must be able to FEED the device's
img/s or it is the real end-to-end ceiling).  Each timing is the best of
``repeats`` full passes (denoised: round-3's single-pass numbers made the
native raw-boxes path look 40% slower than python — scheduler noise on a
busy 1-core host, not a regression).

Usage: python benchmarks/bench_data.py [--n 64] [--batch 8] [--sweep]
  --sweep adds a worker-count scaling table (1..cpu_count) for the pooled
  python path — the "does it scale with cores" evidence.
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


def _make_dataset(tmp: str, n: int, rng, num_classes: int = 3,
                  size_range=(300, 700), boxes_per_img: int = 5,
                  box_wh=(50, 60), photo: bool = False) -> tuple:
    """Synthetic on-disk JPEG dataset + annotation lines (shared with
    bench_e2e_train).

    photo=False writes uniform-noise images — maximum-entropy JPEGs whose
    huffman streams are ~4x a real photograph's (312 KB vs 78 KB median
    for the same dims here), i.e. the DECODE WORST CASE.  photo=True
    writes smooth-gradient images with mild texture whose compressed size
    matches real photos — the representative case for dataset ingest
    (decode cost on this host is dominated by huffman bits, which scale
    with file size)."""
    import cv2

    classes = os.path.join(tmp, "classes.txt")
    with open(classes, "w") as f:
        f.write("".join(f"c{k}\n" for k in range(num_classes)))
    lines = []
    bw, bh = box_wh
    for i in range(n):
        h, w = int(rng.integers(*size_range)), int(rng.integers(*size_range))
        if photo:
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([yy * 255 / h, xx * 255 / w,
                            (xx + yy) * 127 / (h + w)], -1).astype(np.uint8)
            img += rng.integers(0, 12, img.shape, dtype=np.uint8)
        else:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(tmp, f"i{i}.jpg"), img)
        boxes = " ".join(
            f"{x},{y},{x + bw},{y + bh},{rng.integers(0, num_classes)}"
            for x, y in rng.integers(10, min(size_range[0], 300) - bh,
                                     (boxes_per_img, 2)))
        lines.append(f"i{i}.jpg {boxes}\n")
    return classes, lines


def measure(n: int = 64, batch: int = 8, img: int = 416,
            cleanup: bool = True, repeats: int = 3,
            sweep: bool = False) -> dict:
    """Build a synthetic dataset and time DataGenerator batch assembly."""
    from yolov4tpu import native
    from yolov4tpu.config import YoloConfig
    from yolov4tpu.data.pipeline import DataGenerator

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="benchdata_")
    try:
        classes, lines = _make_dataset(tmp, n, rng)

        def run(use_native, encode_on_device=False, workers=1,
                fast_decode=True, dataset=None, **aug):
            ds_tmp, ds_classes, ds_lines = dataset or (tmp, classes, lines)
            cfg = YoloConfig(img_size=(img, img, 3),
                             batch_size=batch,
                             encode_on_device=encode_on_device,
                             num_workers=workers,
                             fast_decode=fast_decode,
                             **aug)
            gen = DataGenerator(ds_lines, ds_classes, ds_tmp, config=cfg,
                                shuffle=False, use_native=use_native, seed=0)
            gen.get_batch(0)  # warm (file cache, pool spin-up)
            best = 0.0
            for _ in range(repeats):
                t0 = time.perf_counter()
                n_img = 0
                for i in range(len(gen)):
                    b = gen.get_batch(i)
                    n_img += len(b["image"])
                best = max(best, n_img / (time.perf_counter() - t0))
            return best

        cpus = os.cpu_count() or 1
        py_ips = run(False, workers=1)
        out = {
            "cpu_count": cpus,
            "python_img_per_s": round(py_ips, 1),
            "python_pool_img_per_s": round(run(False, workers=cpus), 1),
            # encode_on_device=True: host ships raw boxes, the accelerator
            # scatters the label grids inside the train step.
            "python_raw_boxes_img_per_s": round(run(False, True, workers=1),
                                                1),
            "native_available": native.available(),
            "native_jpeg": native.has_jpeg(),
            "native_threads": native.num_threads(),
        }
        if native.available():
            nat = run(True)
            out["native_img_per_s"] = round(nat, 1)
            out["native_exact_img_per_s"] = round(run(True,
                                                      fast_decode=False), 1)
            out["native_raw_boxes_img_per_s"] = round(run(True, True), 1)
            out["speedup"] = round(nat / py_ips, 2)
            # Round-5: augmented batches route through the native planner
            # (python plans draws + box math, C++ decodes/resizes/jitters/
            # composites tiles under OpenMP).  Mosaic decodes 4 sources per
            # output image, so on these maximum-entropy noise JPEGs the
            # rate is decode-bound ~4x below plain; the photo-like block
            # below is the representative number.
            out["augmented_img_per_s"] = round(
                run(True, workers=cpus, use_mosaic=True, use_hflip=True,
                    use_color_jitter=True), 1)
            # Same measurements on realistic-compression JPEGs.
            photo_tmp = tempfile.mkdtemp(prefix="benchdata_photo_")
            try:
                p_classes, p_lines = _make_dataset(photo_tmp, n,
                                                   np.random.default_rng(0),
                                                   photo=True)
                photo_ds = (photo_tmp, p_classes, p_lines)
                out["photo"] = {
                    "native_img_per_s": round(run(True, dataset=photo_ds),
                                              1),
                    "augmented_img_per_s": round(
                        run(True, workers=cpus, dataset=photo_ds,
                            use_mosaic=True, use_hflip=True,
                            use_color_jitter=True), 1),
                    "augmented_python_img_per_s": round(
                        run(False, workers=cpus, dataset=photo_ds,
                            use_mosaic=True, use_hflip=True,
                            use_color_jitter=True), 1),
                }
            finally:
                if cleanup:
                    shutil.rmtree(photo_tmp, ignore_errors=True)
        if sweep and cpus > 1:
            out["workers_sweep"] = {
                w: round(run(False, workers=w), 1)
                for w in sorted({1, 2, cpus // 2, cpus} - {0})}
        return out
    finally:
        if cleanup:
            shutil.rmtree(tmp, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=416)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()
    print(json.dumps(measure(args.n, args.batch, args.img,
                             repeats=args.repeats, sweep=args.sweep)))


if __name__ == "__main__":
    main()
