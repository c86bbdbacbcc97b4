"""Pallas TPU kernel: fused Harris response + 3x3 NMS in one HBM pass.

The pure-jax reference (``ptzjax.kernels.detect``) materializes ~7 full-image
intermediates (gradients, 3 structure-tensor products, smoothed products,
response) in HBM. Detection is HBM-bandwidth-bound, so this kernel streams
the image once: each grid program DMAs a row slab (+halo) into VMEM,
computes gradients -> products -> separable 5-tap smoothing -> Harris
response -> 3x3 non-max suppression entirely in VMEM, and writes back the
response and the suppressed map (the only two maps the top-k/subpixel stage
reads). HBM traffic drops from ~9 maps to 3 (1 read + 2 writes).

Halo accounting (rows and cols, per side): NMS 1 + smoothing 2 + gradient 1
= 4 needed; we pad by HALO=8 so DMA slab heights stay aligned to the fp32
sublane tile of 8 (Mosaic rejects unaligned VMEM slices). Column shifts use
``pltpu.roll`` (circular); wrap-around garbage stays >= 4 columns outside
the crop window, so the cropped result is exact. Border semantics differ
from the reference within 3 px of the image edge (edge-padding order);
``detect_keypoints`` discards a >= 8 px border, so table outputs are
identical (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 8
TILE_ROWS = 64
_NEG = -1e30


def _shift(v: jax.Array, dy: int, dx: int) -> jax.Array:
    """out[y, x] = v[y + dy, x + dx] (circular; wrap lands in the halo).

    ``pltpu.roll`` only accepts non-negative shifts, so negate modulo the
    axis size (circular roll identity)."""
    if dy:
        v = pltpu.roll(v, (-dy) % v.shape[0], 0)
    if dx:
        v = pltpu.roll(v, (-dx) % v.shape[1], 1)
    return v


def _smooth5(v: jax.Array) -> jax.Array:
    w = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)
    row = w[0] * _shift(v, -2, 0) + w[1] * _shift(v, -1, 0) + w[2] * v
    row = row + w[3] * _shift(v, 1, 0) + w[4] * _shift(v, 2, 0)
    col = w[0] * _shift(row, 0, -2) + w[1] * _shift(row, 0, -1) + w[2] * row
    col = col + w[3] * _shift(row, 0, 1) + w[4] * _shift(row, 0, 2)
    return col


def _kernel(img_hbm, resp_ref, sup_ref, slab, sem, *, tile_rows, k):
    """Double-buffered: program i waits on the copy program i-1 started for
    it (program 0 starts its own), and prefetches tile i+1 into the other
    slab before computing — DMA rides under the VPU work instead of
    serializing ahead of it."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    cur = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def src(j):
        return img_hbm.at[pl.ds(j * tile_rows, tile_rows + 2 * HALO), :]

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(src(0), slab.at[0], sem.at[0]).start()

    @pl.when(i + 1 < n)
    def _():
        pltpu.make_async_copy(src(i + 1), slab.at[nxt], sem.at[nxt]).start()

    pltpu.make_async_copy(src(i), slab.at[cur], sem.at[cur]).wait()

    a = slab[cur]
    ix = 0.5 * (_shift(a, 0, 1) - _shift(a, 0, -1))
    iy = 0.5 * (_shift(a, 1, 0) - _shift(a, -1, 0))
    ixx = _smooth5(ix * ix)
    iyy = _smooth5(iy * iy)
    ixy = _smooth5(ix * iy)
    tr = ixx + iyy
    resp = (ixx * iyy - ixy * ixy) - k * tr * tr

    # 3x3 NMS with the reference's deterministic plateau tie-break:
    # strictly greater than the "previous" 4 neighbors, >= the "next" 4.
    prev = jnp.maximum(
        jnp.maximum(_shift(resp, -1, -1), _shift(resp, -1, 0)),
        jnp.maximum(_shift(resp, -1, 1), _shift(resp, 0, -1)),
    )
    nxt = jnp.maximum(
        jnp.maximum(_shift(resp, 0, 1), _shift(resp, 1, -1)),
        jnp.maximum(_shift(resp, 1, 0), _shift(resp, 1, 1)),
    )
    sup = jnp.where((resp > prev) & (resp >= nxt), resp, _NEG)

    resp_ref[:] = resp[HALO : HALO + tile_rows, :]
    sup_ref[:] = sup[HALO : HALO + tile_rows, :]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def harris_nms_pallas(
    img: jax.Array, k: float = 0.04, interpret: bool | None = None
) -> tuple[jax.Array, jax.Array]:
    """Fused Harris + NMS. Returns (response, suppressed), each (H, W).

    ``interpret=None`` auto-selects interpreter mode off-TPU (tests run on
    the CPU backend — SURVEY.md §6 item 5).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = img.shape
    grid = pl.cdiv(h, TILE_ROWS)
    rows_p = grid * TILE_ROWS + 2 * HALO
    cols_p = ((w + 2 * HALO + 127) // 128) * 128
    padded = jnp.zeros((rows_p, cols_p), jnp.float32)
    padded = padded.at[HALO : HALO + h, HALO : HALO + w].set(
        img.astype(jnp.float32)
    )
    # edge-replicate so border responses stay finite (discarded by border
    # masking downstream, but NaN/Inf must never enter top_k)
    padded = padded.at[:HALO, :].set(padded[HALO, :][None])
    padded = padded.at[HALO + h :, :].set(padded[HALO + h - 1, :][None])
    padded = padded.at[:, :HALO].set(padded[:, HALO][:, None])
    padded = padded.at[:, HALO + w :].set(padded[:, HALO + w - 1][:, None])

    out_shape = jax.ShapeDtypeStruct((grid * TILE_ROWS, cols_p), jnp.float32)
    resp, sup = pl.pallas_call(
        functools.partial(_kernel, tile_rows=TILE_ROWS, k=k),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(
                (TILE_ROWS, cols_p), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE_ROWS, cols_p), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((2, TILE_ROWS + 2 * HALO, cols_p), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * h * w, bytes_accessed=12 * h * w, transcendentals=0
        ),
        interpret=interpret,
    )(padded)
    return (
        resp[:h, HALO : HALO + w],
        sup[:h, HALO : HALO + w],
    )
