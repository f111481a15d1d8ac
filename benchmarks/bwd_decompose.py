"""Decompose the train-step backward on the real TPU (whole-program deltas).

The b128 step decomposition (PERF_NOTES.md round 2) showed backward ~304 ms
vs ~172 ms FLOP parity.  This script splits that gap into its suspects with
whole-program deltas (the only trustworthy methodology through the axon
tunnel — see PERF_NOTES "Per-op conv efficiency"):

  P1  fwd + real loss, no grad                      (forward baseline)
  P2  fwd + bwd wrt PARAMS, real loss               (the full backward)
  P3  fwd + bwd wrt IMAGES only (params stopped)    (dgrad chain, no wgrad)
  P4  P2 with bn_stats_gradient=False               (no BN-stat chains)

  wgrad + param-elementwise cost  = P2 - P3
  dgrad chain cost                = P3 - P1
  BN-stat backward chain          = P2 - P4

Usage: python benchmarks/bwd_decompose.py [--batch 128] [--iters 10]
Prints one JSON line.  ~4 remote compiles at 416^2 — budget ~20-40 min cold.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--img", type=int, default=416)
    args = ap.parse_args()

    import jax

    from _cache import enable as _enable_cache
    _enable_cache()
    import jax.numpy as jnp
    import numpy as np

    from yolov4tpu.config import YoloConfig
    from yolov4tpu.data.encode import preprocess_true_boxes
    from yolov4tpu.losses import yolo_loss
    from yolov4tpu.models import network

    num_classes = 80
    cfg = YoloConfig(img_size=(args.img, args.img, 3),
                     compute_dtype="bfloat16", batch_size=args.batch)
    anchors = cfg.anchors_grouped

    def loss_fn(params, state, images, labels, boxes, stats_grad=True):
        outs, new_state = network.apply(
            params, state, images, num_classes, train=True,
            compute_dtype=jnp.bfloat16, bn_stats_gradient=stats_grad)
        total = yolo_loss(outs, labels, boxes, anchors, cfg.strides,
                          num_classes, cfg.iou_loss_thresh)
        return total, new_state

    @jax.jit
    def p1(params, state, batch):
        total, _ = loss_fn(params, state, batch["image"], batch["labels"],
                           batch["boxes"])
        return total

    @jax.jit
    def p2(params, state, batch):
        def f(p):
            return loss_fn(p, state, batch["image"], batch["labels"],
                           batch["boxes"])
        (total, _), grads = jax.value_and_grad(f, has_aux=True)(params)
        # reduce grads to one scalar so sync fetches ~4 bytes
        return total, sum(jnp.sum(g * g) for g in jax.tree.leaves(grads))

    @jax.jit
    def p3(params, state, batch):
        frozen = jax.lax.stop_gradient(params)

        def f(images):
            return loss_fn(frozen, state, images, batch["labels"],
                           batch["boxes"])
        (total, _), gimg = jax.value_and_grad(f, has_aux=True)(
            batch["image"])
        return total, jnp.sum(gimg * gimg)

    @jax.jit
    def p4(params, state, batch):
        def f(p):
            return loss_fn(p, state, batch["image"], batch["labels"],
                           batch["boxes"], stats_grad=False)
        (total, _), grads = jax.value_and_grad(f, has_aux=True)(params)
        return total, sum(jnp.sum(g * g) for g in jax.tree.leaves(grads))

    params, state, _ = network.init(num_classes, img_size=args.img, seed=0)
    params, state = jax.device_put((params, state))
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (args.batch, args.img, args.img, 3)).astype(
        np.float32)
    boxes = np.zeros((args.batch, 100, 5), np.float32)
    boxes[:, 0] = [50, 60, 200, 220, 3]
    boxes[:, 1] = [150, 30, 380, 360, 17]
    labels, xywh = preprocess_true_boxes(boxes, (args.img, args.img),
                                         cfg.anchors_flat, num_classes)
    batch = {"image": jnp.asarray(imgs),
             "labels": [jnp.asarray(l) for l in labels],
             "boxes": jnp.asarray(xywh)}

    def measure(name, fn):
        out = fn(params, state, batch)
        jax.tree.map(float, out)  # warmup + hard host sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(params, state, batch)
        jax.tree.map(float, out)
        ms = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name}: {ms:.1f} ms", file=sys.stderr, flush=True)
        return ms

    res = {"batch": args.batch, "img": args.img}
    res["p1_fwd_loss_ms"] = measure("P1 fwd+loss", p1)
    res["p2_full_bwd_ms"] = measure("P2 fwd+bwd(params)", p2)
    res["p3_dgrad_only_ms"] = measure("P3 fwd+bwd(images)", p3)
    res["p4_no_bnstat_ms"] = measure("P4 bwd, BN stats stopped", p4)
    res["wgrad_ms"] = round(res["p2_full_bwd_ms"] - res["p3_dgrad_only_ms"], 1)
    res["dgrad_ms"] = round(res["p3_dgrad_only_ms"] - res["p1_fwd_loss_ms"], 1)
    res["bnstat_ms"] = round(res["p2_full_bwd_ms"] - res["p4_no_bnstat_ms"], 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
