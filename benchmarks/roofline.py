"""Device roofline calibration: measured matmul peak + streaming bandwidth.

The train-step ceiling analysis (PERF_NOTES.md "Device roofline
calibration") depends on the ATTACHED device's real limits, not the data
sheet: the v5e slice behind the axon tunnel measures ~117 TF/s bf16 and
~190 GB/s bf16 streaming (nominal full-chip v5e: 197 TF/s / 819 GB/s).
This script reproduces those numbers so any future device swap re-bases
the roofline instead of inheriting stale constants.

Methodology: scan-amortised (one jitted scan of `iters` dependent steps —
the carry feeds the next step so nothing can be hoisted or DCE'd), hard
host sync via a scalar fetch (block_until_ready is a no-op through the
tunnel), best-of-3.

Usage: python benchmarks/roofline.py [--iters 10]
Prints one JSON line.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    from _cache import enable as _enable_cache
    _enable_cache()
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0]), "iters": args.iters}

    def best_of(fn, *xs, runs=3):
        g = jax.jit(fn)
        jax.device_get(jax.tree.leaves(g(*xs))[0].ravel()[0])  # compile
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            jax.device_get(jax.tree.leaves(g(*xs))[0].ravel()[0])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    # MXU peak: dependent 8k^3 bf16 matmul chain.
    a = jnp.asarray(rng.normal(0, 1, (8192, 8192)), jnp.bfloat16)

    def mm(a0):
        return lax.scan(lambda c, _: (c @ a, None), a0, None,
                        length=args.iters)[0][0, 0]

    dt = best_of(mm, a)
    out["matmul_bf16_tflops"] = round(2 * 8192 ** 3 / dt / 1e12, 1)
    out["matmul_bf16_ms"] = round(dt * 1000, 2)

    # Streaming bandwidth: dependent elementwise chain over a >VMEM array
    # (read + write each step).
    for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        x = jnp.asarray(rng.normal(0, 1, (1024, 1024, 256)), dtype)

        def stream(x0):
            return lax.scan(lambda c, _: (c + c, None), x0, None,
                            length=args.iters)[0].ravel()[0]

        dt = best_of(stream, x)
        nbytes = x.size * x.dtype.itemsize
        out[f"stream_{name}_gbps"] = round(2 * nbytes / dt / 1e9)
        out[f"stream_{name}_ms"] = round(dt * 1000, 2)

    out["roofline_knee_flop_per_byte"] = round(
        out["matmul_bf16_tflops"] * 1e12 / (out["stream_bf16_gbps"] * 1e9))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
