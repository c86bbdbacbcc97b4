"""Pallas TPU kernel: batched per-keypoint window gather.

The descriptor stage needs a (win+1, win+1) pixel window around each of K
keypoints. The pure-XLA formulation (``descriptor._extract_aligned``'s
vmapped ``dynamic_slice``) lowers to a SEQUENTIAL while loop of K
slice + dynamic-update-slice steps — profiled at ~0.42 ms/frame for
K=256/win=46 at 720p, HALF the entire from-pixels frame budget (see
benchmarks/RESULTS.md appendix; trace: ``while.61`` + 5,888
``slice``/``dus`` fusions per 23-frame chunk).

This kernel replaces it with grid-parallel DMA: each program issues B=8
overlapping HBM->VMEM copies (one per keypoint), then aligns each slab to
its window origin with two dynamic ``pltpu.roll``s and writes the result.
Measured 0.028 ms for the same shape — ~15x — with BITWISE-identical
output (the copy/roll path moves exact fp32 values; the bilinear blend
stays in jax, same ops in the same order as the XLA path).

Alignment contract (Mosaic): HBM slices must start at multiples of the
(8, 128) fp32 tile, so the host side rounds each window start DOWN to the
tile grid and passes the residual offsets; the kernel rolls the slab by
the residuals. Wrap-around garbage from the circular roll lands at rows/
cols >= win+1, outside the region the blend reads (coff <= 255 - win and
roff <= 7 by construction, so the wrapped tail starts past the window).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 256      # slab width (two lane tiles; window cols fit after roll)
OUT_W = 128    # output width (one lane tile; >= win+1 for win <= 127)
B = 8          # keypoints per grid program (overlapping DMAs hide latency)


def _kernel(yx_ref, img_hbm, out_ref, slab, sems, *, slab_r, rows):
    i = pl.program_id(0)
    for b in range(B):
        pltpu.make_async_copy(
            img_hbm.at[
                pl.ds(pl.multiple_of(yx_ref[i * B + b, 0], 8), slab_r),
                pl.ds(pl.multiple_of(yx_ref[i * B + b, 1], 128), BLK),
            ],
            slab.at[b], sems.at[b],
        ).start()
    for b in range(B):
        pltpu.make_async_copy(
            img_hbm.at[
                pl.ds(pl.multiple_of(yx_ref[i * B + b, 0], 8), slab_r),
                pl.ds(pl.multiple_of(yx_ref[i * B + b, 1], 128), BLK),
            ],
            slab.at[b], sems.at[b],
        ).wait()
        rolled = pltpu.roll(
            pltpu.roll(slab[b], (-yx_ref[i * B + b, 2]) % slab_r, 0),
            (-yx_ref[i * B + b, 3]) % BLK,
            1,
        )
        out_ref[b] = rolled[:rows, :OUT_W]


@functools.partial(jax.jit, static_argnames=("win", "interpret"))
def gather_windows_pallas(
    padded: jax.Array,
    ys: jax.Array,
    xs: jax.Array,
    win: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Gather K windows ``padded[ys[k] : ys[k]+win+1, xs[k] : xs[k]+win+1]``.

    Args:
      padded: (HP, WP) fp32 image, already edge-padded by the caller; HP
        and WP need no particular alignment (re-padded to tiles here).
      ys, xs: (K,) int32 window starts, already clipped to
        [0, HP - (win+1)] / [0, WP - (win+1)].
      win: window side minus 1 is NOT implied — output is (K, rows, 128)
        with the valid region [:, : win + 1, : win + 1]; rows is win+1
        rounded up to the sublane tile. Callers slice what they need.

    Returns:
      (K, rows, 128) fp32; [k, r, c] == padded[ys[k] + r, xs[k] + c] for
      r, c <= win (rows beyond win+1 and cols beyond win+1 are garbage).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = ys.shape[0]
    rows = ((win + 1 + 7) // 8) * 8
    slab_r = rows + 8
    assert win + 1 <= OUT_W, win

    hp, wp = padded.shape
    # tile-aligned backing store; values past (hp, wp) are never read by
    # the blend (wrap-around lands outside the window region — see module
    # docstring)
    rows_p = ((hp + 7) // 8) * 8 + slab_r
    cols_p = max(((wp + 127) // 128) * 128, BLK)
    backing = jnp.zeros((rows_p, cols_p), jnp.float32)
    backing = jax.lax.dynamic_update_slice(
        backing, padded.astype(jnp.float32), (0, 0)
    )

    yb = (ys // 8) * 8
    xb = jnp.minimum((xs // 128) * 128, cols_p - BLK)
    yx = jnp.stack(
        [yb, xb, ys - yb, xs - xb], axis=-1
    ).astype(jnp.int32)
    kp = ((k + B - 1) // B) * B
    if kp != k:
        yx = jnp.concatenate(
            [yx, jnp.zeros((kp - k, 4), jnp.int32)], axis=0
        )

    out = pl.pallas_call(
        functools.partial(_kernel, slab_r=slab_r, rows=rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(kp // B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (B, rows, OUT_W), lambda i, s: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((B, slab_r, BLK), jnp.float32),
                pltpu.SemaphoreType.DMA((B,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((kp, rows, OUT_W), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=kp * slab_r * BLK * 4, transcendentals=0
        ),
        interpret=interpret,
    )(yx, backing)
    return out[:k]
