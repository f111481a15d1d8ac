"""Timing + profiling helpers (the reference has none — SURVEY §5).

``time_fn`` is the standard device-timing harness: warmup/compile run first,
then wall-clock over N iterations with a hard host sync so dispatch overlap
doesn't fake the numbers.  ``trace`` wraps ``jax.profiler`` for
XProf/TensorBoard traces on TPU.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


def _sync(out):
    """Hard sync: fetch one element of the first output leaf to host.

    ``jax.block_until_ready`` alone can return before execution finishes on
    tunneled platforms (axon); a device->host read cannot.  Execution is
    in-order per device, so syncing the last dispatch drains prior ones.
    """
    leaves = jax.tree.leaves(out)
    if leaves:
        jax.device_get(leaves[0].ravel()[0])


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2,
            **kwargs) -> dict:
    """Compile + time ``fn(*args, **kwargs)``; returns stats in seconds."""
    out = None
    t_compile = time.perf_counter()
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    _sync(out)
    t_compile = time.perf_counter() - t_compile

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        _sync(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    n = len(times)
    return {
        "mean_s": sum(times) / n,
        "p50_s": times[n // 2],
        "min_s": times[0],
        "max_s": times[-1],
        "iters": n,
        "warmup_s": t_compile,
    }


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """jax.profiler trace scope; view with TensorBoard/XProf.

    No-op when logdir is None, so call sites can be left in production code.
    """
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the TPU trace timeline."""
    return jax.profiler.TraceAnnotation(name)
