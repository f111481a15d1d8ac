"""Training-step throughput benchmark (single chip or sharded mesh).

Usage: python benchmarks/bench_train.py [--img 416] [--classes 80]
       [--batch 8] [--devices 1] [--dtype bfloat16]
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
    ap.add_argument("--batch", type=int, default=8, help="per-device batch")
    ap.add_argument("--devices", type=int, default=1)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--pallas-wgrad", action="store_true",
                    help="Pallas 3x3 weight-gradient kernel in the backward")
    ap.add_argument("--no-bn-stats-grad", action="store_true",
                    help="stop gradients through BN batch statistics")
    ap.add_argument("--via-trainer", action="store_true",
                    help="drive Trainer.train_step instead of the raw "
                         "compiled step — exercises the ragged-batch "
                         "pad-and-mask decomposition (non-aligned --batch "
                         "splits into aligned chunk programs)")
    args = ap.parse_args()

    import jax

    from _cache import enable as _enable_cache
    _enable_cache()
    import jax.numpy as jnp

    from yolov4tpu.config import YoloConfig
    from yolov4tpu.data.encode import preprocess_true_boxes
    from yolov4tpu.models import network
    from yolov4tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from yolov4tpu.train import make_optimizer, make_train_step

    cfg = YoloConfig(img_size=(args.img, args.img, 3), batch_size=args.batch,
                     num_devices=args.devices, compute_dtype=args.dtype,
                     pallas_wgrad=args.pallas_wgrad,
                     bn_stats_gradient=not args.no_bn_stats_grad)
    mesh = make_mesh(args.devices) if args.devices > 1 else None

    params, state, _ = network.init(args.classes, img_size=args.img, seed=0)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(args.classes, cfg, opt, mesh=mesh)

    bs = args.batch * args.devices
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (bs, args.img, args.img, 3)).astype(np.float32)
    boxes = np.zeros((bs, 100, 5), np.float32)
    for i in range(bs):
        n = rng.integers(1, 20)
        x1 = rng.uniform(0, args.img * 0.8, n)
        y1 = rng.uniform(0, args.img * 0.8, n)
        boxes[i, :n] = np.stack(
            [x1, y1, x1 + rng.uniform(4, args.img * 0.2, n),
             y1 + rng.uniform(4, args.img * 0.2, n),
             rng.integers(0, args.classes, n)], axis=-1)
    labels, xywh = preprocess_true_boxes(boxes, (args.img, args.img),
                                         cfg.anchors_flat, args.classes)
    batch = {"image": jnp.asarray(images),
             "labels": [jnp.asarray(l) for l in labels],
             "boxes": jnp.asarray(xywh)}
    import time

    if args.via_trainer:
        from yolov4tpu.train import Trainer

        tr = Trainer(cfg, args.classes, params, state, mesh=mesh)
        m = tr.train_step(batch)           # compile (all chunk programs)
        jax.device_get(m["loss"])
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            m = tr.train_step(batch)
        jax.device_get(m["loss"])
        sec = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "metric": "train_step_throughput",
            "img_per_s": round(bs / sec, 2),
            "p50_ms": round(sec * 1e3, 2),
            "global_batch": bs,
            "devices": args.devices,
            "dtype": args.dtype,
            "via_trainer": True,
            "device": str(jax.devices()[0]),
        }))
        return

    if mesh is not None:
        batch = shard_batch(batch, mesh)
        params = replicate(params, mesh)
        state = replicate(state, mesh)
        opt_state = replicate(opt_state, mesh)
    else:
        # init returns host (numpy) arrays; without an explicit device_put a
        # jit call re-transfers all 256 MB of params EVERY step (seconds
        # through a tunneled device) because the inputs never become
        # committed device arrays.
        params, state, opt_state, batch = jax.device_put(
            (params, state, opt_state, batch))

    # The real training pattern: outputs feed the next step (buffer
    # donation reuses params/opt memory). Warmup compiles, then time with a
    # hard host fetch (block_until_ready can return early on tunneled
    # platforms).
    params, state, opt_state, m = step(params, state, opt_state, batch)
    jax.device_get(m["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        params, state, opt_state, m = step(params, state, opt_state, batch)
    jax.device_get(m["loss"])
    sec = (time.perf_counter() - t0) / iters
    out = {
        "metric": "train_step_throughput",
        "img_per_s": round(bs / sec, 2),
        "p50_ms": round(sec * 1e3, 2),
        "global_batch": bs,
        "devices": args.devices,
        "dtype": args.dtype,
        "pallas_wgrad": args.pallas_wgrad,
        "bn_stats_gradient": not args.no_bn_stats_grad,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
