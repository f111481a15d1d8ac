"""Pallas TPU weight-gradient kernel for 3x3 stride-1 SAME convolutions.

WHY: the b128 train-step decomposition (benchmarks/PERF_NOTES.md) showed the
backward at ~304 ms vs ~172 ms FLOP parity, with XLA's weight-gradient
convolutions — batch-space reductions into a tiny 3x3xCixCo kernel — as the
prime suspect.  The same contraction is MXU-friendly written as what it IS:
nine tap-matmuls

    wgrad[ky,kx,ci,co] = sum_{b,y,x} x[b, y+ky-1, x+kx-1, ci] * dy[b,y,x,co]

i.e. per tap an (K=B*H*W, Ci)^T @ (K, Co) GEMM over the same two operands,
just with x shifted.  This kernel tiles K over a (Co-tiles, batch, rows)
grid, DMAs each x slab ONCE with a 2-row halo, builds the three kx shifts
in VMEM stacked along the lane dim, and contracts them as three
(K_tile, 3*Ci)^T @ (K_tile, ct) GEMMs per ky into the VMEM-resident
f32 output block.

MEASURED OUTCOME (real v5e slice, 2026-08-18 — PERF_NOTES.md "Pallas
3x3-s1 weight-gradient kernel"): correct to the bf16 floor on every net
shape, but 0.51-0.73x XLA's own wgrad speed.  The attached device is
bandwidth-starved (~190 GB/s bf16 streaming vs 117 TF/s matmul) and the
wgrad is memory-floor-bound there; XLA's DMA scheduling beats this
kernel's manual slab streaming.  Kept as infrastructure (the tradeoff
flips on full-bandwidth parts) but `YoloConfig.pallas_wgrad` defaults to
False.

Used via conv3x3_s1 (custom_vjp conv whose backward calls this for the
weight gradient and XLA for the data gradient).  Numerical contract:
bf16 operands, f32 accumulation — identical to XLA's conv wgrad with
preferred_element_type=f32.  Validated against jax.grad of lax.conv in
tests/test_wgrad_pallas.py (interpret mode on CPU, compiled on TPU).

The reference has no custom kernels anywhere (its conv backward lives in
TF's CUDA runtime); reference models.py:100-107 is the fit loop this
train path replaces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wgrad_kernel(x_hbm, dy_ref, out_ref, xs, x3, sem, *,
                  bt: int, ht: int, Wq: int, Ci: int, ct: int):
    """One grid step: DMA the haloed x slab, 9 tap-GEMMs into out_ref.

    Grid is (Co/ct, B/bt, H/ht) with the Co-tile axis SLOWEST so the output
    block (all nine (Ci, ct) accumulators) stays VMEM-resident across the
    whole inner (batch, rows) sweep; x re-streams once per Co tile.

    Layout discipline (each rule below is a measured v5e failure, not
    theory):
    - Mosaic tiles the two minor dims (8, 128): a reshape merging the
      width dim into the GEMM K dim is FREE only when width % 8 == 0, so
      the caller zero-pads W up to Wq (dy's pad columns are zero, so pad
      products vanish).  Unpadded, Mosaic materialises a stack copy per
      tap = 27.6 MB scoped-VMEM OOM at 52x52x128x128 tiles.
    - The kx shift of the width (sublane) dim is a vector-shift copy;
      done once per kx (3 copies), not per tap (9).
    - Shifts are written ONCE per grid step into disjoint lane ranges of
      one scratch: with a single reused scratch, Mosaic (jax 0.9.0) fuses
      the sliced K-merge reshape lazily and the Ci=128 lowering reads the
      buffer AFTER the last kx overwrite — every kx<2 tap silently got
      kx=2's data (rel RMS 0.2-0.45 vs XLA; Ci=256 was unaffected).
      Write-once regions leave no write-after-read hazard to mis-schedule.
    - The three kx shifts are stacked along the LANE dim (x3 is
      (bt, ht+2, Wq, 3*Ci)) so each ky issues ONE (K, 3*Ci)^T (K, ct)
      GEMM with M = 3*Ci.  An M=N=128 GEMM has a single 128x128 output
      tile and keeps only one of v5e's four MXUs busy (measured: 22 TF/s
      kernel / 33 TF/s XLA on the square net shapes); M=384 gives the
      MXUs three independent output tiles per ky."""
    bi = pl.program_id(1)
    hi = pl.program_id(2)

    # x is pre-padded to (B, H+2, xw, Ci); the slab for output rows
    # [hi*ht, hi*ht+ht) needs padded rows [hi*ht, hi*ht+ht+2).
    copy = pltpu.make_async_copy(
        x_hbm.at[pl.ds(bi * bt, bt), pl.ds(hi * ht, ht + 2)], xs, sem)
    copy.start()

    @pl.when((bi == 0) & (hi == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dyt = dy_ref[:].reshape(bt * ht * Wq, ct)
    copy.wait()

    for kx in range(3):
        x3[:, :, :, kx * Ci:(kx + 1) * Ci] = xs[:, :, kx:kx + Wq, :]
    for ky in range(3):
        # ky slice is along an untiled dim (free); K-merge reshape is
        # layout-free because Wq % 8 == 0.
        xt = x3[:, ky:ky + ht].reshape(bt * ht * Wq, 3 * Ci)
        part = jax.lax.dot_general(
            xt, dyt, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for kx in range(3):
            out_ref[ky, kx] += part[kx * Ci:(kx + 1) * Ci]


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

    # Pad the GEMM width up to Wq (mult of 8) so in-kernel K-merge reshapes
    # are layout no-ops: dy's pad columns are ZERO, so every tap product in
    # the pad region vanishes regardless of what x holds there.  x needs
    # Wq + 2 columns (left halo 1, taps reach kx + Wq), rounded to xw
    # (mult of 8) so the HBM array's tiling matches the VMEM scratch.
    Wq = W + (-W) % 8
    xw = Wq + 2 + (-(Wq + 2)) % 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, xw - W - 1), (0, 0)))
    dyp = jnp.pad(dy, ((0, 0), (0, 0), (0, Wq - W), (0, 0))) if Wq != W \
        else dy
    kern = functools.partial(_wgrad_kernel, bt=bt, ht=ht, Wq=Wq, Ci=Ci,
                             ct=ct)
    flops = 2 * 9 * B * H * W * Ci * Co
    n_ct = Co // ct
    return pl.pallas_call(
        kern,
        grid=(n_ct, B // bt, H // ht),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
            pl.BlockSpec((bt, ht, Wq, ct),
                         lambda ci, bi, hi: (bi, hi, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, Ci, ct),
                               lambda ci, bi, hi: (0, 0, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, Ci, Co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bt, ht + 2, xw, Ci), x.dtype),
            pltpu.VMEM((bt, ht + 2, Wq, 3 * Ci), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n_ct * x.size * x.dtype.itemsize
            + dy.size * dy.dtype.itemsize + 9 * Ci * Co * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MiB VMEM; the default 16 MiB scoped limit is far
            # below what a K-maximal tiling wants.  _pick_tiles budgets
            # 48 MiB of accounted buffers; the limit leaves ~1.6x headroom
            # for Mosaic's own double-buffering of the out block (measured:
            # an 11.3 MiB accounting compiled to an 18.1 MiB allocation).
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(xp, dyp)


def _pick_tiles(B, H, W, Ci, Co, itemsize=2, budget=48 * 2 ** 20):
    """Choose (bt, ht, ct) grid tiles: the largest K-tile (= bt*ht*Wq
    contraction rows per tap-GEMM), then the widest Co tile (fewer x
    re-streams), such that haloed x slab + three kx-shift scratches +
    double-buffered dy block + the nine f32 (Ci, ct) accumulators fit the
    VMEM budget (the kernel raises the scoped limit to 100 MiB of v5e's
    128 MiB; 48 MiB accounted leaves ~2x for Mosaic's extra buffers).
    None when nothing fits (caller falls back to the XLA conv backward)."""
    # Mosaic lane tiling (128): the x-slab DMA and the dy/out blocks all
    # carry a channel dim minor — sub-128 channel counts can't be sliced
    # (measured on v5e: "Slice shape along dimension 3 must be aligned to
    # tiling (128), but is 64").  Ci<128 shapes fall back to XLA; they are
    # a negligible FLOP share of this net (only the 104^2 64->64 residual).
    if Ci % 128 != 0:
        return None
    cts = [c for c in (Co, Co // 2, Co // 4, Co // 8)
           if c and Co % c == 0 and c % 128 == 0]
    if not cts:
        return None
    Wq = W + (-W) % 8
    xw = Wq + 2 + (-(Wq + 2)) % 8
    best, best_score = None, (0, 0)
    for ct in cts:
        for bt in (1, 2, 4, 8, 16, 32):
            if B % bt:
                continue
            for ht in range(1, H + 1):
                if H % ht:
                    continue
                need = (bt * (ht + 2) * xw * Ci * itemsize      # x slab
                        + 3 * bt * (ht + 2) * Wq * Ci * itemsize  # kx shifts
                        + 2 * bt * ht * Wq * ct * itemsize      # dy (dbuf)
                        + 2 * 9 * Ci * ct * 4)                  # accum (dbuf)
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
