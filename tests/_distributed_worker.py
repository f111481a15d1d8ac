"""Worker process for the two-process distributed training test.

Run as: ``python _distributed_worker.py <process_id> <num_processes>
<coordinator_address>``.  Each process owns ONE CPU device; together they
form a 2-device global mesh (collectives over gloo — the real
``jax.distributed`` wire path, unlike the fake-8-device single-process
tests).  Runs one fused mesh train step on a deterministic batch and prints
``LOSS <pid> <loss>`` for the parent test to compare.

Exercises the multi-host recipe documented in parallel/mesh.py:
init_distributed -> global make_mesh -> per-process data shards
(reference's only parallelism was single-host MirroredStrategy,
reference models.py:41-44; this is the TPU-pod analogue).
"""

import sys


def main():
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    # Env-var platform selection is unreliable when accelerator plugins are
    # installed; the config API before first backend use is authoritative.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolov4tpu.config import YoloConfig
    from yolov4tpu.data.encode import preprocess_true_boxes
    from yolov4tpu.models import network
    from yolov4tpu.parallel.mesh import init_distributed, make_mesh
    from yolov4tpu.train import make_optimizer, make_train_step

    info = init_distributed(coord, nproc, pid)
    assert info["num_processes"] == nproc, info
    assert info["global_devices"] == nproc, info

    num_classes = 2
    cfg = YoloConfig(img_size=(64, 64, 3), batch_size=4,
                     csp_repeats=(1, 1, 1, 1, 1))
    params, state, _ = network.init(num_classes, img_size=64, seed=0,
                                    csp_repeats=cfg.csp_repeats)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)

    # Deterministic global batch of 4; this process holds rows
    # [pid*2, pid*2+2) — the per-host shard recipe from mesh.py.
    rng = np.random.default_rng(42)
    imgs = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    boxes = np.zeros((4, 100, 5), np.float32)
    boxes[:, 0] = [8, 8, 40, 40, 0]
    boxes[:, 1] = [30, 20, 60, 60, 1]
    labels, xywh = preprocess_true_boxes(boxes, (64, 64),
                                         cfg.anchors_flat, num_classes)

    mesh = make_mesh(nproc)  # spans both processes
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    def put_repl(tree):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                repl, np.asarray(x)), tree)

    def put_shard(x):
        local = np.asarray(x)[pid * 2:(pid + 1) * 2]
        return jax.make_array_from_process_local_data(shard, local)

    params, state, opt_state = put_repl((params, state, opt_state))
    batch = {"image": put_shard(imgs),
             "labels": [put_shard(l) for l in labels],
             "boxes": put_shard(xywh)}

    step = make_train_step(num_classes, cfg, opt, mesh=mesh, donate=False)
    new_params, _, _, metrics = step(params, state, opt_state, batch)

    # Loss is replicated; every process must see the same value.  Also
    # fingerprint the updated params so the parent can check both processes
    # applied the identical update (fully-replicated arrays are
    # process-local readable).
    loss = float(np.asarray(metrics["loss"].addressable_data(0)))
    psum = float(sum(
        np.asarray(l.addressable_data(0), np.float64).sum()
        for l in jax.tree.leaves(new_params)))
    print(f"LOSS {pid} {loss!r} {psum!r}", flush=True)


if __name__ == "__main__":
    main()
