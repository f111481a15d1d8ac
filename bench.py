"""End-to-end benchmark at the reference operating point (416^2 COCO).

Measures, on the available accelerator:
  - inference img/s through the FULL pipeline the reference's
    inference_model runs (backbone+neck forward -> head decode -> combined
    NMS, reference models.py:68-73) on a BUSY scene: head biases forced
    (weights.force_busy_heads) so above-threshold candidates appear on ALL
    THREE heads across 21 classes (169 boxes @13^2 over 10 classes, 676
    @26^2 over 10 classes, 2704 spurious low-score @52^2) — the per-class
    NMS rank work of a trained detector, not a 2-class toy.  An
    empty-scene number (random-init weights, ~0 candidates — the
    data-dependent best case) is reported alongside.
  - the same busy scene through the int8 post-training-quantized path
    (models/quantize.py — the MXU's double-rate int8 mode; opt-in).
  - training img/s through the fused train step (forward+loss+backward+Adam,
    reference models.py:100-107), bf16, best batch size.
  - host input-pipeline img/s (benchmarks/bench_data.py) — whether the host
    can feed the device at all.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
headline metric is busy-scene inference throughput and vs_baseline is
value / 5000 img/s (BASELINE.json north star for v5e-8; the fair single-chip
share is 5000/8 = 625 img/s — both appear in extras, as do the empty-scene,
training, and host-pipeline numbers).

Robustness contract (round-2 postmortem: BENCH_r02.json was rc=1/parsed=null
because the TPU backend was down at capture time and bench.py crashed at its
first device op): this script ALWAYS exits 0 with one parseable JSON line.
The measurement runs in a child process; the parent never imports jax,
retries the child (bounded, backoff) on transient backend flakes, and falls
back to a zero-value record carrying the failure in extras["errors"].
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

NORTH_STAR = 5000.0  # img/s, BASELINE.json v5e-8 target
CHILD_TIMEOUT_S = float(os.environ.get("YOLOV4TPU_BENCH_CHILD_TIMEOUT", 3300))
RETRY_DELAYS = [float(x) for x in os.environ.get(
    "YOLOV4TPU_BENCH_RETRY_DELAYS", "10,30").split(",")]

# Busy-scene spec: (head, anchor, class, on_logit).  Score ordering
# (sigmoid(l)^2): head2 0.91 > head1 0.78 > head0 0.48, so the fused path's
# global top-256 holds 169 13^2-grid boxes (classes 0-9) + 87 26^2-grid
# boxes (classes 10-19) while the 2704 52^2-grid boxes exercise the
# threshold/top-k stage like a trained detector's spurious tail.
HOT_MULTICLASS = tuple(
    [(2, 0, c, 3.0) for c in range(10)]
    + [(1, 0, c, 2.0) for c in range(10, 20)]
    + [(0, 0, 20, 0.8)])
RAW_ABOVE_THRESHOLD = 169 + 676 + 2704  # candidates/img before top-k


def _empty_result():
    return {
        "metric": "inference_throughput_416_busy",
        "value": 0.0,
        "unit": "img/s",
        "vs_baseline": 0.0,
        "extras": {"errors": []},
    }


def _err(e):
    return f"{type(e).__name__}: {e}"


def child_main():
    """All measurement. Always prints one JSON line and exits 0."""
    result = _empty_result()
    extras = result["extras"]
    errors = extras["errors"]
    try:
        _child_body(result, extras, errors)
    except BaseException as e:  # noqa: BLE001 — the contract is "never crash"
        errors.append(f"child body: {_err(e)}")
    print(json.dumps(result))


def _first_contact(errors, attempts=3):
    """Force backend init + one device round trip, bounded retry.

    A transient axon-tunnel flake at first contact must not forfeit the
    round's numbers (that is exactly what killed BENCH_r02).
    """
    import jax
    import jax.numpy as jnp

    delays = [float(x) for x in os.environ.get(
        "YOLOV4TPU_BENCH_CONTACT_DELAYS", "5,15,45").split(",")]
    for i in range(attempts):
        try:
            np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
            return True
        except Exception as e:  # backend init / compile / transfer error
            errors.append(f"device contact {i + 1}/{attempts}: {_err(e)}")
            if i + 1 < attempts:
                time.sleep(delays[min(i, len(delays) - 1)])
                # Drop any cached failed backend state before retrying.
                for clear in ("extend.backend.clear_backends",
                              "clear_caches"):
                    try:
                        obj = jax
                        for attr in clear.split("."):
                            obj = getattr(obj, attr)
                        obj()
                        break
                    except Exception:
                        continue
    return False


def _child_body(result, extras, errors):
    if os.environ.get("YOLOV4TPU_BENCH_SELFTEST_FAIL"):
        raise RuntimeError("selftest: simulated dead backend")

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

    device_ok = _first_contact(errors)
    if device_ok:
        try:
            _device_sections(result, extras, errors)
        except BaseException as e:
            errors.append(f"device sections: {_err(e)}")
    else:
        errors.append("device unavailable after retries; device sections "
                      "skipped")

    # Host input pipeline (no device needed): can the host FEED the device?
    try:
        from benchmarks.bench_data import measure as measure_host
        extras["host_pipeline"] = measure_host(n=48, batch=16, sweep=True)
    except Exception as e:
        errors.append(f"host pipeline: {_err(e)}")


def _device_calibration(errors, iters=8):
    """Measured MXU peak + HBM streaming bandwidth of the ATTACHED chip
    (short form of benchmarks/roofline.py).  Recorded per run so img/s
    numbers are comparable across rounds even when the attached slice
    changes — round 3's slice measured 117 TF/s / 190 GB/s against the
    v5e's nominal 197 / 819; without this line a future capture on a
    different slice reads as a code regression/win when it's the part.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    cal = {}
    rng = np.random.default_rng(0)

    def best_of(fn, x, runs=2):
        g = jax.jit(fn)
        jax.device_get(jax.tree.leaves(g(x))[0].ravel()[0])  # compile+warm
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            jax.device_get(jax.tree.leaves(g(x))[0].ravel()[0])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    try:
        a = jnp.asarray(rng.normal(0, 1, (8192, 8192)), jnp.bfloat16)
        dt = best_of(
            lambda a0: lax.scan(lambda c, _: (c @ a, None), a0, None,
                                length=iters)[0], a)
        cal["matmul_bf16_tflops"] = round(2 * 8192 ** 3 / dt / 1e12, 1)
        x = jnp.asarray(rng.normal(0, 1, (1024, 1024, 256)), jnp.bfloat16)
        dt = best_of(
            lambda x0: lax.scan(lambda c, _: (c + c, None), x0, None,
                                length=iters)[0], x)
        cal["stream_bf16_gbps"] = round(
            2 * x.size * x.dtype.itemsize / dt / 1e9)
    except Exception as e:
        errors.append(f"calibration: {_err(e)}")
    return cal


def _flops_per_call(jitted, *args):
    """XLA's own FLOP count for one call of a jitted fn (client-side cost
    analysis on the compiled HLO; lowering hits the persistent compile
    cache).  None when the backend doesn't report one."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = float((ca or {}).get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _device_sections(result, extras, errors):
    import jax
    import jax.numpy as jnp

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
    # rounding; see weights.force_busy_heads), so the bench FORCES hot
    # channels on all three heads across 21 classes (HOT_MULTICLASS above):
    # trained-detector-density suppression work with a margin no dtype can
    # erase.
    folded_empty = jax.device_put(network.fold_bn(params, state))
    params_busy = w.force_busy_heads(params, num_classes, hot=HOT_MULTICLASS)
    folded_busy = jax.device_put(network.fold_bn(params_busy, state))

    def measure_infer(fn, folded, batch):
        images = jnp.asarray(
            rng.uniform(0, 1, (batch, 416, 416, 3)).astype(np.float32))
        sync(fn(folded, images))  # warmup/compile (synced)
        iters = max(5, int(4000 / batch))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(folded, images)
        sync(out)
        return batch * iters / (time.perf_counter() - t0)

    # A failed section reports 0.0 PLUS the exception in extras["errors"]:
    # a silent zero reads as "measured at 0" and hides the regression.
    busy_best, busy_bs = 0.0, None
    empty_best = 0.0
    for batch in (128, 192):
        try:
            busy = measure_infer(infer, folded_busy, batch)
            empty = measure_infer(infer, folded_empty, batch)
        except Exception as e:
            errors.append(f"infer b{batch}: {_err(e)}")
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

        int8_busy = measure_infer(infer_q, qparams, busy_bs or 128)
    except Exception as e:
        errors.append(f"int8: {_err(e)}")

    # Training throughput: fused jitted step (fwd+loss+bwd+Adam), bf16.
    def measure_train(batch, flops_out=None):
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
        if flops_out is not None:
            flops_out[batch] = _flops_per_call(step, p, s, o, b)
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
    train_flops = {}
    for batch in (128, 64):
        try:
            train_best, train_bs = measure_train(batch, train_flops), batch
            break
        except Exception as e:
            errors.append(f"train b{batch}: {_err(e)}")
            continue

    # Batch-1 latency, plain vs GSPMD-spatial-sharded (api.distribute
    # axis="spatial" claims latency scaling for small batches; on a 1-chip
    # attachment this measures the GSPMD path's OVERHEAD — true multi-chip
    # halo-exchange scaling needs a pod and is recorded as such).
    latency = {}

    def measure_latency(fn, folded, iters=30):
        images = jnp.asarray(
            rng.uniform(0, 1, (1, 416, 416, 3)).astype(np.float32))
        sync(fn(folded, images))  # compile + warm
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            sync(fn(folded, images))
            times.append(time.perf_counter() - t0)
        return float(np.median(times) * 1000)

    try:
        latency["b1_ms"] = round(measure_latency(infer, folded_busy), 3)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from yolov4tpu.parallel.mesh import make_mesh

        mesh = make_mesh(len(jax.devices()))
        infer_sp = jax.jit(
            infer.__wrapped__,
            in_shardings=(NamedSharding(mesh, P()),
                          NamedSharding(mesh, P(None, "data"))))
        latency["b1_spatial_ms"] = round(
            measure_latency(infer_sp, folded_busy), 3)
        latency["spatial_n_devices"] = len(jax.devices())
        if len(jax.devices()) == 1:
            latency["note"] = ("1-chip attachment: spatial number is GSPMD "
                               "overhead only, not halo-exchange scaling")
    except Exception as e:
        errors.append(f"latency: {_err(e)}")

    calibration = _device_calibration(errors)

    # MFU: achieved TFLOP/s (XLA's own per-call FLOP count x measured rate)
    # over the MEASURED matmul peak of this chip slice — the
    # cross-round-comparable utilization number (img/s alone conflates code
    # and part; see device_calibration).
    mfu = {}
    peak = calibration.get("matmul_bf16_tflops")
    try:
        if busy_bs:
            images = jnp.asarray(
                rng.uniform(0, 1, (busy_bs, 416, 416, 3)).astype(np.float32))
            f = _flops_per_call(infer, folded_busy, images)
            if f:
                mfu["infer_achieved_tflops"] = round(
                    f * busy_best / busy_bs / 1e12, 1)
        if train_bs and train_flops.get(train_bs):
            mfu["train_achieved_tflops"] = round(
                train_flops[train_bs] * train_best / train_bs / 1e12, 1)
        if peak:
            for sec in ("infer", "train"):
                if f"{sec}_achieved_tflops" in mfu:
                    mfu[f"{sec}_mfu"] = round(
                        mfu[f"{sec}_achieved_tflops"] / peak, 3)
    except Exception as e:
        errors.append(f"mfu: {_err(e)}")

    result["value"] = round(busy_best, 2)
    result["vs_baseline"] = round(busy_best / NORTH_STAR, 4)
    extras.update({
        "device_calibration": calibration,
        "mfu": mfu,
        "latency_416": latency,
        "batch_size": busy_bs,
        "device": str(jax.devices()[0]),
        "per_chip_target": 625.0,
        "vs_per_chip_target": round(busy_best / 625.0, 4),
        "dtype": "bfloat16",
        "includes": "forward+decode+combined_nms",
        "busy_scene": {
            "raw_candidates_above_threshold": RAW_ABOVE_THRESHOLD,
            "nms_candidates": 256,
            "classes": 21,
            "heads": 3,
        },
        "empty_scene_img_s": round(empty_best, 2),
        "int8_busy_img_s": round(int8_busy, 2),
        "train_throughput_416": round(train_best, 2),
        "train_batch_size": train_bs,
    })


def _emit(result) -> None:
    """Print the final JSON line, persist it to BENCH_LAST.json, and arm an
    atexit guard that re-prints it if ANYTHING else writes to stdout
    afterwards — the driver parses the last stdout line, and a stray
    late print (library warning, interpreter message) must not cost the
    round's telemetry (r02 postmortem, VERDICT r04 weak#4)."""
    import atexit

    line = json.dumps(result)
    try:
        # YOLOV4TPU_BENCH_LAST_PATH: artifact destination override — the
        # self-test suite points it at a tmp file so a simulated-failure
        # run can never clobber the machine's last REAL bench record.
        path = os.environ.get(
            "YOLOV4TPU_BENCH_LAST_PATH",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LAST.json"))
        with open(path, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass

    raw = sys.stdout
    state = {"clean": False}

    class _Guarded:
        def write(self, s):
            if s.strip():
                state["clean"] = s.strip() == line
            return raw.write(s)

        def flush(self):
            return raw.flush()

        def __getattr__(self, name):
            return getattr(raw, name)

    sys.stdout = _Guarded()

    def _reprint():
        if not state["clean"]:
            raw.write("\n" + line + "\n")
            raw.flush()

    atexit.register(_reprint)
    print(line, flush=True)


def parent_main():
    """Spawn the child, retry on flake, ALWAYS print one valid JSON line."""
    attempts = 1 + len(RETRY_DELAYS)
    last_parsed, last_error = None, None
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                capture_output=True, text=True, timeout=CHILD_TIMEOUT_S)
        except subprocess.TimeoutExpired:
            # A timeout means the child was making (slow) progress — a
            # retry would take just as long; record and stop.
            last_error = (f"attempt {i + 1}: child timed out after "
                          f"{CHILD_TIMEOUT_S:.0f}s")
            break
        except Exception as e:
            last_error = f"attempt {i + 1}: spawn failed: {_err(e)}"
            break
        parsed = None
        for line in reversed(proc.stdout.splitlines()):
            try:
                cand = json.loads(line)
            except ValueError:
                continue
            if isinstance(cand, dict) and "metric" in cand:
                parsed = cand
                break
        if parsed is not None and parsed.get("value", 0) > 0:
            _emit(parsed)
            return
        if parsed is not None:
            last_parsed = parsed  # valid record, but value 0 — maybe a flake
            last_error = (f"attempt {i + 1}: value=0, errors="
                          f"{parsed.get('extras', {}).get('errors')}")
        else:
            tail = (proc.stderr or proc.stdout or "")[-400:]
            last_error = (f"attempt {i + 1}: rc={proc.returncode}, "
                          f"no JSON; tail: {tail!r}")
        if i + 1 < attempts:
            time.sleep(RETRY_DELAYS[i])
    result = last_parsed if last_parsed is not None else _empty_result()
    if last_error:
        result.setdefault("extras", {}).setdefault("errors", []).append(
            f"parent: {last_error}")
    _emit(result)


if __name__ == "__main__":
    if "--child" in sys.argv[1:]:
        child_main()
    else:
        try:
            parent_main()
        except BaseException as e:  # noqa: BLE001 — contract: always a line
            r = _empty_result()
            r["extras"]["errors"].append(f"parent crashed: {_err(e)}")
            _emit(r)
