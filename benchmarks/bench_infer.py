"""Inference benchmark sweep: batch sizes x dtypes x NMS paths.

Richer companion to the repo-root ``bench.py`` single-line benchmark.
Usage: python benchmarks/bench_infer.py [--img 416] [--classes 80]
       [--trace /tmp/tpu_trace]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=416)
    ap.add_argument("--classes", type=int, default=80)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1, 8, 16, 32, 64])
    ap.add_argument("--trace", type=str, default=None,
                    help="jax.profiler trace output dir")
    args = ap.parse_args()

    import jax

    from _cache import enable as _enable_cache
    _enable_cache()
    import jax.numpy as jnp

    from yolov4tpu.config import YoloConfig
    from yolov4tpu.models import head, network
    from yolov4tpu.ops.nms import combined_nms
    from yolov4tpu.ops.nms_pallas import combined_nms_pallas
    from yolov4tpu.utils.profiling import time_fn, trace

    cfg = YoloConfig()
    params, state, _ = network.init(args.classes, img_size=args.img, seed=0)
    folded = jax.device_put(network.fold_bn(params, state))
    on_tpu = jax.default_backend() == "tpu"

    def make_infer(dtype, use_pallas):
        @jax.jit
        def infer(p, images):
            raws = network.apply_folded(p, images, args.classes, dtype)
            outs = head.decode_head(raws, cfg.anchors_grouped, args.classes,
                                    cfg.strides, cfg.xyscale)
            boxes, scores = head.flatten_boxes_scores(outs, args.img,
                                                      args.classes)
            nms = combined_nms_pallas if use_pallas else combined_nms
            kw = {"interpret": not on_tpu} if use_pallas else {}
            return nms(boxes, scores, iou_threshold=cfg.iou_threshold,
                       score_threshold=cfg.score_threshold,
                       pre_top_k=cfg.nms_pre_top_k, **kw)
        return infer

    rng = np.random.default_rng(0)
    results = []
    for dtype_name, dtype in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
        for use_pallas in ([False, True] if on_tpu else [False]):
            infer = make_infer(dtype, use_pallas)
            for bs in args.batches:
                images = jnp.asarray(rng.uniform(0, 1, (bs, args.img,
                                                        args.img, 3)),
                                     jnp.float32)
                stats = time_fn(infer, folded, images,
                                iters=max(4, 256 // bs))
                ips = bs / stats["p50_s"]
                row = {"batch": bs, "dtype": dtype_name,
                       "nms": "pallas" if use_pallas else "xla",
                       "img_per_s": round(ips, 2),
                       "p50_ms": round(stats["p50_s"] * 1e3, 3)}
                results.append(row)
                print(json.dumps(row))

    if args.trace:
        infer = make_infer(jnp.bfloat16, on_tpu)
        images = jnp.asarray(rng.uniform(0, 1, (32, args.img, args.img, 3)),
                             jnp.float32)
        jax.block_until_ready(infer(folded, images))
        with trace(args.trace):
            jax.block_until_ready(infer(folded, images))
        print(f"trace written to {args.trace}")

    best = max(results, key=lambda r: r["img_per_s"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
