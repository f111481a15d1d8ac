"""End-to-end inference throughput benchmark (reference operating point).

Measures YOLOv4-COCO 416x416 images/sec through the FULL pipeline the
reference's inference_model runs (backbone+neck forward -> head decode ->
combined NMS, reference models.py:68-73), on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 5000 img/s (the BASELINE.json north star for v5e-8;
on a single chip the fair share of that target is 5000/8 = 625 img/s/chip —
both numbers are included in the extras field).
"""

import json
import time

import numpy as np


def main():
    import os

    import jax
    import jax.numpy as jnp

    # Persistent compile cache: repeat bench runs skip the ~1-2 min XLA
    # compiles per batch size.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_bench_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from yolov4tpu.config import YoloConfig
    from yolov4tpu.models import network
    from yolov4tpu.ops.detect import detect_fused

    num_classes = 80
    cfg = YoloConfig(compute_dtype="bfloat16")
    params, state, _ = network.init(num_classes, img_size=416, seed=0)
    folded = network.fold_bn(params, state)
    folded = jax.device_put(folded)
    anchors = cfg.anchors_grouped

    compute_dtype = jnp.bfloat16

    @jax.jit
    def infer(folded_params, images):
        raws = network.apply_folded(folded_params, images, num_classes,
                                    compute_dtype)
        return detect_fused(
            raws, anchors, num_classes, cfg.strides, cfg.xyscale, 416,
            iou_threshold=cfg.iou_threshold,
            score_threshold=cfg.score_threshold,
            candidates=cfg.nms_pre_top_k,
            interpret=jax.default_backend() != "tpu")

    def sync(out):
        # On tunneled platforms (axon) block_until_ready can return before
        # execution finishes; a host fetch of a tiny output is a hard sync —
        # device execution is in-order, so fetching the LAST dispatch's
        # valid_detections drains every prior one too.
        np.asarray(out[3])

    def measure(batch):
        images = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (batch, 416, 416, 3))
            .astype(np.float32))
        # warmup/compile (synced)
        sync(infer(folded, images))
        iters = max(5, int(4000 / batch))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(folded, images)
        sync(out)
        dt = time.perf_counter() - t0
        return batch * iters / dt

    best_bs, best = None, 0.0
    for batch in (128, 192):
        try:
            ips = measure(batch)
        except Exception:
            break
        if ips > best:
            best, best_bs = ips, batch

    result = {
        "metric": "inference_throughput_416",
        "value": round(best, 2),
        "unit": "img/s",
        "vs_baseline": round(best / 5000.0, 4),
        "extras": {
            "batch_size": best_bs,
            "device": str(jax.devices()[0]),
            "per_chip_target": 625.0,
            "vs_per_chip_target": round(best / 625.0, 4),
            "dtype": "bfloat16",
            "includes": "forward+decode+combined_nms",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
