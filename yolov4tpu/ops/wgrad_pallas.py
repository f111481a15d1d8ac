"""Pallas TPU weight-gradient kernel for 3x3 stride-1 SAME convolutions.

WHY: the b128 train-step decomposition (benchmarks/PERF_NOTES.md) shows the
backward at ~304 ms vs ~172 ms FLOP parity; the dominant suspect is XLA's
weight-gradient convolutions — batch-space reductions into a tiny 3x3xCixCo
kernel, a shape XLA's conv codegen tiles poorly.  The same contraction is
MXU-friendly when written as what it IS: nine tap-matmuls

    wgrad[ky,kx,ci,co] = sum_{b,y,x} x[b, y+ky-1, x+kx-1, ci] * dy[b,y,x,co]

i.e. for each of the 9 taps an (K=B*H*W, Ci)^T @ (K, Co) GEMM over the same
two operands, just with x shifted.  This kernel tiles K over a
(batch-tiles, row-tiles) grid, DMAs each x slab ONCE with a 2-row halo
(the 9 taps reuse it from VMEM — XLA's formulation re-reads x per tap), and
accumulates all nine (Ci, Co) f32 tiles in the VMEM-resident output block.

Per grid step (defaults bt=8, ht=8 at 104^2x128->256, b128):
  compute 9 * 2*K_tile*Ci*Co = 3.9 GFLOP, DMA ~5.6 MB -> ~700 FLOP/byte,
  far above the MXU roofline knee: compute-bound by construction.

Used by ops.conv_custom (custom_vjp conv whose backward calls this for the
weight gradient and XLA for the data gradient).  Numerical contract:
bf16 operands, f32 accumulation — identical to XLA's conv wgrad with
preferred_element_type=f32.  Validated against jax.grad of lax.conv in
tests/test_wgrad_pallas.py (interpret mode on CPU, compiled on TPU).

The reference has no custom kernels anywhere (its conv backward lives in
TF's CUDA runtime); this is TPU-native speed-of-light work on the train
path (reference models.py:100-107).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wgrad_kernel(x_hbm, dy_ref, out_ref, xs, sem, *,
                  bt: int, ht: int, W: int, Ci: int, ct: int):
    """One grid step: DMA the haloed x slab, 9 tap-GEMMs into out_ref.

    Grid is (Co/ct, B/bt, H/ht) with the Co-tile axis SLOWEST so the output
    block (all nine (Ci, ct) accumulators) stays VMEM-resident across the
    whole inner (batch, rows) sweep; x re-streams once per Co tile."""
    bi = pl.program_id(1)
    hi = pl.program_id(2)

    # x is pre-padded to (B, H+2, W+2, Ci); the slab for output rows
    # [hi*ht, hi*ht+ht) needs padded rows [hi*ht, hi*ht+ht+2).
    copy = pltpu.make_async_copy(
        x_hbm.at[pl.ds(bi * bt, bt), pl.ds(hi * ht, ht + 2)], xs, sem)
    copy.start()

    @pl.when((bi == 0) & (hi == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dyt = dy_ref[:].reshape(bt * ht * W, ct)
    copy.wait()

    for ky in range(3):
        for kx in range(3):
            xt = xs[:, ky:ky + ht, kx:kx + W, :].reshape(bt * ht * W, Ci)
            part = jax.lax.dot_general(
                xt, dyt, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[ky, kx] += part


@functools.partial(jax.jit,
                   static_argnames=("bt", "ht", "ct", "interpret"))
def wgrad_3x3_s1(x, dy, bt: int = 8, ht: int = 8, ct: int = None,
                 interpret: bool = False):
    """Weight gradient of a 3x3 stride-1 SAME conv (NHWC/HWIO).

    x: (B,H,W,Ci) activations; dy: (B,H,W,Co) output cotangent.
    Returns (3,3,Ci,Co) float32.  B must divide by bt, H by ht, and Co by
    ct (callers fall back to XLA otherwise — conv shapes in this net are
    powers of two times 13/26/52/104, so picks exist for all).  ct splits
    wide-Co outputs (e.g. 512->1024, whose nine f32 accumulators alone are
    19 MB) across the slowest grid axis at the cost of re-streaming x once
    per Co tile.
    """
    B, H, W, Ci = x.shape
    Co = dy.shape[-1]
    ct = Co if ct is None else ct
    assert dy.shape[:3] == (B, H, W), (x.shape, dy.shape)
    assert B % bt == 0 and H % ht == 0 and Co % ct == 0, \
        (B, H, Co, bt, ht, ct)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kern = functools.partial(_wgrad_kernel, bt=bt, ht=ht, W=W, Ci=Ci, ct=ct)
    flops = 2 * 9 * B * H * W * Ci * Co
    n_ct = Co // ct
    return pl.pallas_call(
        kern,
        grid=(n_ct, B // bt, H // ht),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
            pl.BlockSpec((bt, ht, W, ct),
                         lambda ci, bi, hi: (bi, hi, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, Ci, ct),
                               lambda ci, bi, hi: (0, 0, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, Ci, Co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bt, ht + 2, W + 2, Ci), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n_ct * x.size * x.dtype.itemsize
            + dy.size * dy.dtype.itemsize + 9 * Ci * Co * 4,
            transcendentals=0),
        interpret=interpret,
    )(xp, dy)


def _pick_tiles(B, H, W, Ci, Co, itemsize=2, budget=10 * 2 ** 20):
    """Choose (bt, ht, ct) grid tiles: the largest K-tile (= bt*ht*W
    contraction rows per tap-GEMM), then the widest Co tile (fewer x
    re-streams), such that x slab + double-buffered dy block + the nine
    f32 (Ci, ct) accumulators fit the VMEM budget.  None when nothing fits
    (caller falls back to the XLA conv backward)."""
    cts = [c for c in (Co, Co // 2, Co // 4, Co // 8)
           if c and Co % c == 0 and c % 128 == 0] or [Co]
    best, best_score = None, (0, 0)
    for ct in cts:
        for bt in (1, 2, 4, 8, 16, 32):
            if B % bt:
                continue
            for ht in range(1, H + 1):
                if H % ht:
                    continue
                need = (bt * (ht + 2) * (W + 2) * Ci * itemsize
                        + 2 * bt * ht * W * ct * itemsize
                        + 9 * Ci * ct * 4)
                score = (bt * ht * W, ct)
                if need <= budget and score > best_score:
                    best, best_score = (bt, ht, ct), score
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _conv3x3_custom(x, w, bt, ht, ct, interpret):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv3x3_custom_fwd(x, w, bt, ht, ct, interpret):
    return _conv3x3_custom(x, w, bt, ht, ct, interpret), (x, w)


def _conv3x3_custom_bwd(bt, ht, ct, interpret, res, g):
    x, w = res
    # dgrad: XLA's own transpose (conv of g with the 180-rotated, IO-swapped
    # kernel) — already efficient; only the wgrad needed a custom kernel.
    dx = jax.lax.conv_general_dilated(
        g, jnp.flip(w, (0, 1)).swapaxes(2, 3), window_strides=(1, 1),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dw = wgrad_3x3_s1(x, g, bt=bt, ht=ht, ct=ct, interpret=interpret)
    return dx.astype(x.dtype), dw.astype(w.dtype)


_conv3x3_custom.defvjp(_conv3x3_custom_fwd, _conv3x3_custom_bwd)


def conv3x3_s1(x, w):
    """3x3 stride-1 SAME conv (NHWC/HWIO) whose BACKWARD computes the
    weight gradient with the Pallas tap-GEMM kernel (forward and data
    gradient stay XLA).  Falls back to the plain conv when no tile config
    fits VMEM.  Wired into training by ``YoloConfig(pallas_wgrad=True)``."""
    B, H, W, Ci = x.shape
    Co = w.shape[-1]
    tiles = _pick_tiles(B, H, W, Ci, Co, itemsize=x.dtype.itemsize)
    if tiles is None:
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    interpret = jax.default_backend() != "tpu"
    return _conv3x3_custom(x, w, tiles[0], tiles[1], tiles[2], interpret)


def wgrad_xla_3x3_s1(x, dy):
    """XLA autodiff's formulation of the same wgrad (differential baseline
    for tests/benches): the vjp of the forward conv w.r.t. its weights —
    the conv is linear in w, so the zero primal is immaterial."""
    Ci, Co = x.shape[-1], dy.shape[-1]

    def fwd(w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    _, vjp = jax.vjp(fwd, jnp.zeros((3, 3, Ci, Co), x.dtype))
    return vjp(dy)[0].astype(jnp.float32)
