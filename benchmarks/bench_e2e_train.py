"""END-TO-END training throughput: on-disk JPEGs -> trained step, wall clock.

bench_train.py measures the device step on resident data; bench_data.py
measures the host pipeline alone.  This benchmark measures what a user
actually gets from ``Trainer.fit``: host ingest (file read + JPEG decode +
resize + label encode) OVERLAPPED with the device step through prefetch's
producer thread and the double-buffered ``device_put`` transform
(train.Trainer._prefetch_place) — the round-3 frontier ("host 128 img/s vs
device 1560" — SURVEY §7 hard part #4).

Variants:
  - python_host_encode: round-3 status quo — cv2 decode + numpy grid
    encode on the host, single worker, batches placed by the consumer.
  - native_device_encode: round-4 path — fused C++ ingest (libjpeg decode,
    DCT-scaled, OpenMP), encode_on_device=True (host ships raw boxes), the
    producer thread device_puts each batch behind the running step.
  - device_only: the same step on resident data (the device-bound ceiling
    end-to-end cannot exceed).

Usage: python benchmarks/bench_e2e_train.py [--img 416] [--batch 64]
         [--n 256] [--epochs 2] [--shallow]
Prints one JSON line.  Sized for the TPU; --shallow (csp_repeats 1,1,1,1,1)
+ --img 96 runs quickly on CPU for smoke testing.

CAVEAT (dev sandbox): through the axon tunnel the per-batch H2D copy
(~200 MB at 416^2 b64 f32) rides a ~100 MB/s link, so the e2e variants
measure the TUNNEL (~25 img/s), not the host pipeline — on a real TPU
host the same copy is multi-GB/s PCIe/DMA.  Interpret 416^2 e2e numbers
from this sandbox as a lower bound only; the host-pipeline capability
evidence is bench_data.py on the actual TPU host (BENCH extras).
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


from bench_data import _make_dataset


def measure(img=416, batch=64, n=256, epochs=2, shallow=False,
            cleanup=True):
    from _cache import enable as _enable_cache
    _enable_cache()
    import jax

    from yolov4tpu.config import YoloConfig
    from yolov4tpu.data.encode import preprocess_true_boxes
    from yolov4tpu.data.pipeline import DataGenerator, prefetch
    from yolov4tpu.models import network
    from yolov4tpu.train import Trainer

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    out = {"img": img, "batch": batch, "n_images": n,
           "cpu_count": os.cpu_count(), "device": str(jax.devices()[0])}
    try:
        classes, lines = _make_dataset(tmp, n, rng, num_classes=4,
                                       size_range=(400, 800),
                                       boxes_per_img=4, box_wh=(60, 80))
        repeats = (1, 1, 1, 1, 1) if shallow else (1, 2, 8, 8, 4)
        C = 4

        def run(encode_on_device, use_native, workers, uint8=False):
            cfg = YoloConfig(img_size=(img, img, 3), batch_size=batch,
                             compute_dtype="bfloat16",
                             csp_repeats=repeats,
                             encode_on_device=encode_on_device,
                             transfer_uint8=uint8,
                             num_workers=workers)
            params, state, _ = network.init(C, img_size=img, seed=0,
                                            csp_repeats=repeats)
            tr = Trainer(cfg, C, params, state)
            gen = DataGenerator(lines, classes, tmp, config=cfg,
                                shuffle=False, use_native=use_native,
                                seed=0)
            # Warmup epoch: XLA compile + file cache; then timed epochs.
            times = []
            for e in range(epochs + 1):
                t0 = time.perf_counter()
                n_img, m = 0, None
                for b in prefetch(gen, epochs=1,
                                  transform=tr._prefetch_place):
                    m = tr.train_step(b)
                    n_img += batch
                float(m["loss"])  # hard sync (axon: fetch, don't block)
                if e > 0:
                    times.append(n_img / (time.perf_counter() - t0))
            return max(times)

        out["python_host_encode_img_per_s"] = round(run(False, False, 1), 1)
        out["native_device_encode_img_per_s"] = round(
            run(True, True, os.cpu_count() or 1), 1)
        # + uint8 wire: 4x less H2D per batch (u8 images + raw boxes).
        out["uint8_device_encode_img_per_s"] = round(
            run(True, True, os.cpu_count() or 1, uint8=True), 1)

        # Device-only ceiling: same step, resident data, no host work.
        cfg = YoloConfig(img_size=(img, img, 3), batch_size=batch,
                         compute_dtype="bfloat16", csp_repeats=repeats)
        params, state, _ = network.init(C, img_size=img, seed=0,
                                        csp_repeats=repeats)
        tr = Trainer(cfg, C, params, state)
        imgs = rng.uniform(0, 1, (batch, img, img, 3)).astype(np.float32)
        boxes = np.zeros((batch, 100, 5), np.float32)
        boxes[:, 0] = [20, 25, img // 2, img // 2, 1]
        labels, xywh = preprocess_true_boxes(boxes, (img, img),
                                             cfg.anchors_flat, C)
        # Place ONCE: the fused step donates params/state/opt, not the
        # batch, so device-resident arrays stay valid across iterations.
        # Passing host numpy each iteration re-uploads ~200 MB/step and
        # measures the H2D link, not the device (seen: 20.5 img/s through
        # the ~100 MB/s axon tunnel vs ~236 img/s true device throughput).
        b = jax.device_put({"image": imgs, "labels": list(labels),
                            "boxes": xywh})
        float(tr.train_step(b)["loss"])  # compile
        iters = max(4, n // batch)
        t0 = time.perf_counter()
        for _ in range(iters):
            m = tr.train_step(b)
        float(m["loss"])
        out["device_only_img_per_s"] = round(
            batch * iters / (time.perf_counter() - t0), 1)
        out["e2e_fraction_of_device"] = round(
            out["native_device_encode_img_per_s"]
            / max(out["device_only_img_per_s"], 1e-9), 3)
        return out
    finally:
        if cleanup:
            shutil.rmtree(tmp, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=416)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--shallow", action="store_true")
    args = ap.parse_args()
    print(json.dumps(measure(args.img, args.batch, args.n, args.epochs,
                             args.shallow)))


if __name__ == "__main__":
    main()
