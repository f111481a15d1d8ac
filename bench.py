"""End-to-end benchmark at the reference operating point (416^2 COCO).

Measures, on the available accelerator:
  - inference img/s through the FULL pipeline the reference's
    inference_model runs (backbone+neck forward -> head decode -> combined
    NMS, reference models.py:68-73) on a BUSY scene: head biases forced
    (weights.force_busy_heads) so 338 anchor-sized overlapping boxes/image
    across 2 classes clear the 0.3 score threshold and the NMS suppression
    loop does trained-detector work.  An empty-scene number (random-init
    weights, ~0 candidates — the data-dependent best case) is reported
    alongside.
  - the same busy scene through the int8 post-training-quantized path
    (models/quantize.py — the MXU's double-rate int8 mode; opt-in).
  - training img/s through the fused train step (forward+loss+backward+Adam,
    reference models.py:100-107), bf16, best batch size.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
headline metric is busy-scene inference throughput and vs_baseline is
value / 5000 img/s (BASELINE.json north star for v5e-8; the fair single-chip
share is 5000/8 = 625 img/s — both appear in extras, as do the empty-scene
and training numbers).
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

    from yolov4tpu import weights as w
    from yolov4tpu.config import YoloConfig
    from yolov4tpu.data.encode import preprocess_true_boxes
    from yolov4tpu.models import network
    from yolov4tpu.ops.detect import detect_fused
    from yolov4tpu.train import make_optimizer, make_train_step

    num_classes = 80
    cfg = YoloConfig(compute_dtype="bfloat16")
    params, state, _ = network.init(num_classes, img_size=416, seed=0)
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

    rng = np.random.default_rng(0)

    # Busy scene: random-init activations vanish through the 110-conv depth
    # (head logits == biases to ~1e-22), so every scene is empty and the NMS
    # suppression loop's trip count is ~0 — the data-dependent best case, not
    # the trained-model case.  Quantile calibration cannot fix this (zero
    # logit variance -> knife-edge threshold that collapses under bf16
    # rounding; see weights.force_busy_heads), so the bench FORCES two
    # 13^2-grid channels hot: 338 above-threshold anchor-sized overlapping
    # candidates per image, 2 classes — trained-detector-density suppression
    # work with a margin no dtype can erase.
    folded_empty = jax.device_put(network.fold_bn(params, state))
    params_busy = w.force_busy_heads(params, num_classes)
    folded_busy = jax.device_put(network.fold_bn(params_busy, state))

    def measure_infer(folded, batch):
        images = jnp.asarray(
            rng.uniform(0, 1, (batch, 416, 416, 3)).astype(np.float32))
        sync(infer(folded, images))  # warmup/compile (synced)
        iters = max(5, int(4000 / batch))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(folded, images)
        sync(out)
        return batch * iters / (time.perf_counter() - t0)

    # A failed section reports 0.0 PLUS the exception in extras["errors"]:
    # a silent zero reads as "measured at 0" and hides the regression.
    errors = []

    busy_best, busy_bs = 0.0, None
    empty_best = 0.0
    for batch in (128, 192):
        try:
            busy = measure_infer(folded_busy, batch)
            empty = measure_infer(folded_empty, batch)
        except Exception as e:
            errors.append(f"infer b{batch}: {type(e).__name__}: {e}")
            break
        if busy > busy_best:
            busy_best, busy_bs = busy, batch
        empty_best = max(empty_best, empty)

    # int8 post-training quantization (models/quantize.py): the MXU's
    # double-rate int8 path, measured on the same busy scene.  Opt-in
    # accuracy trade (Yolov4.quantize), reported alongside.
    int8_busy = 0.0
    try:
        from yolov4tpu.models.quantize import apply_quantized, quantize

        calib = rng.uniform(0, 1, (16, 416, 416, 3)).astype(np.float32)
        qparams, qscales = quantize(
            jax.device_get(folded_busy), calib, num_classes, compute_dtype)
        qparams = jax.device_put(qparams)

        @jax.jit
        def infer_q(qp, images):
            # qscales closed over STATICALLY (the pytree copy would be traced)
            raws = apply_quantized(qp, images, num_classes, compute_dtype,
                                   scales=qscales)
            return detect_fused(
                raws, anchors, num_classes, cfg.strides, cfg.xyscale, 416,
                iou_threshold=cfg.iou_threshold,
                score_threshold=cfg.score_threshold,
                candidates=cfg.nms_pre_top_k,
                interpret=jax.default_backend() != "tpu")

        def measure_q(batch):
            images = jnp.asarray(
                rng.uniform(0, 1, (batch, 416, 416, 3)).astype(np.float32))
            sync(infer_q(qparams, images))
            iters = max(5, int(4000 / batch))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = infer_q(qparams, images)
            sync(out)
            return batch * iters / (time.perf_counter() - t0)

        int8_busy = measure_q(busy_bs or 128)
    except Exception as e:
        errors.append(f"int8: {type(e).__name__}: {e}")

    # Training throughput: fused jitted step (fwd+loss+bwd+Adam), bf16.
    def measure_train(batch):
        cfg_t = YoloConfig(compute_dtype="bfloat16", batch_size=batch)
        opt = make_optimizer(cfg_t)
        step = make_train_step(num_classes, cfg_t, opt, donate=True)
        imgs = rng.uniform(0, 1, (batch, 416, 416, 3)).astype(np.float32)
        boxes = np.zeros((batch, 100, 5), np.float32)
        boxes[:, 0] = [50, 60, 200, 220, 3]
        boxes[:, 1] = [150, 30, 380, 360, 17]
        labels, xywh = preprocess_true_boxes(boxes, (416, 416),
                                             cfg_t.anchors_flat, num_classes)
        b = {"image": jnp.asarray(imgs),
             "labels": [jnp.asarray(l) for l in labels],
             "boxes": jnp.asarray(xywh)}
        p, s = jax.device_put((params, state))
        o = opt.init(p)
        p, s, o, m = step(p, s, o, b)
        float(m["loss"])  # warmup + hard sync
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            p, s, o, m = step(p, s, o, b)
        float(m["loss"])
        return batch * iters / (time.perf_counter() - t0)

    # Throughput rises with batch well past the round-1 assumption (212
    # img/s b16 -> 310 b128); 128 is the largest size the remote compile
    # helper accepts at 416^2, with 64 as the fallback.
    train_best, train_bs = 0.0, None
    for batch in (128, 64):
        try:
            train_best, train_bs = measure_train(batch), batch
            break
        except Exception as e:
            errors.append(f"train b{batch}: {type(e).__name__}: {e}")
            continue

    result = {
        "metric": "inference_throughput_416_busy",
        "value": round(busy_best, 2),
        "unit": "img/s",
        "vs_baseline": round(busy_best / 5000.0, 4),
        "extras": {
            "batch_size": busy_bs,
            "device": str(jax.devices()[0]),
            "per_chip_target": 625.0,
            "vs_per_chip_target": round(busy_best / 625.0, 4),
            "dtype": "bfloat16",
            "includes": "forward+decode+combined_nms",
            "candidates_per_image": 338,
            "empty_scene_img_s": round(empty_best, 2),
            "int8_busy_img_s": round(int8_busy, 2),
            "train_throughput_416": round(train_best, 2),
            "train_batch_size": train_bs,
            "errors": errors,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
