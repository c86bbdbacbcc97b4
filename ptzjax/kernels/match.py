"""Pallas TPU kernel: fused descriptor matching (score + top-2 + mutual).

Fast path for ``ptzjax.match`` (the reference's BF matcher + Lowe ratio +
RANSAC gating lives in ``slam_system/image_process.py`` — SURVEY.md §2
layer 3, §8.5). The jax reference materializes the (Q, R) score matrix in
HBM three times over (scores, top-2 masking, column argmax). This kernel
tiles the query axis: each grid program computes its (TQ, R) score block on
the MXU and immediately reduces it to per-row (best, second, argmax) and a
running per-column (max, argmax) in VMEM — the score matrix never leaves
the chip. HBM traffic is just the descriptor reads + O(Q + R) vectors out.

The optional spatial gate (tracking-mode association, ``match_gated``)
fuses in as an elementwise mask on the score block computed from the
keypoint/prediction coordinates — still zero extra HBM traffic.

Decision logic (ratio test, score floor, mutual-best) runs on the O(Q)
reduction vectors in plain jax afterwards; tests assert bit-identical
``MatchResult``s against the jax reference on both paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptzjax.match import MatchResult

_NEG = -1e9
TILE_Q = 128


def _kernel(dq, dr, qv, rv, xq, xr, i1_ref, v1_ref, v2_ref, cb_ref,
            colval, colrow, *, gate_px):
    i = pl.program_id(0)
    tq = dq.shape[0]
    r = dr.shape[0]

    s = jax.lax.dot_general(
        dq[:], dr[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, R)
    if gate_px is not None:
        diff0 = xq[:, 0:1] - xr[:, 0:1].T
        diff1 = xq[:, 1:2] - xr[:, 1:2].T
        d2 = diff0 * diff0 + diff1 * diff1
        s = jnp.where(d2 <= gate_px * gate_px, s, _NEG)
    ok = (qv[0, :][:, None] > 0.0) & (rv[0, :][None, :] > 0.0)
    s = jnp.where(ok, s, _NEG)

    v1 = jnp.max(s, axis=1)
    i1 = jnp.argmax(s, axis=1).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, r), 1)
    v2 = jnp.max(jnp.where(col == i1[:, None], _NEG, s), axis=1)

    i1_ref[0, :] = i1
    v1_ref[0, :] = v1
    v2_ref[0, :] = v2

    # running column max/argmax across query tiles (grid is sequential)
    @pl.when(i == 0)
    def _():
        colval[0, :] = jnp.full((r,), _NEG, jnp.float32)
        colrow[0, :] = jnp.zeros((r,), jnp.int32)

    tile_max = jnp.max(s, axis=0)
    tile_arg = jnp.argmax(s, axis=0).astype(jnp.int32) + i * tq
    better = tile_max > colval[0, :]
    colval[0, :] = jnp.where(better, tile_max, colval[0, :])
    colrow[0, :] = jnp.where(better, tile_arg, colrow[0, :])

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        cb_ref[0, :] = colrow[0, :]


def _pad_rows(a: jax.Array, n: int) -> jax.Array:
    return jnp.pad(a, ((0, n - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))


@functools.partial(
    jax.jit,
    static_argnames=("gate_px", "ratio", "min_score", "mutual", "interpret"),
)
def match_pallas(
    d_query: jax.Array,
    d_ref: jax.Array,
    q_valid: jax.Array,
    r_valid: jax.Array,
    xy_query: jax.Array | None = None,
    xy_ref_pred: jax.Array | None = None,
    gate_px: float | None = None,
    ratio: float = 0.8,
    min_score: float = 0.5,
    mutual: bool = True,
    interpret: bool | None = None,
) -> MatchResult:
    """Fused matcher; same contract as ``match.match_descriptors`` (or
    ``match.match_gated`` when ``gate_px`` is given with coordinates)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q, d = d_query.shape
    r = d_ref.shape[0]
    qp = pl.cdiv(q, TILE_Q) * TILE_Q
    rp = pl.cdiv(r, 128) * 128

    if xy_query is None:
        xy_query = jnp.zeros((q, 2), jnp.float32)
        xy_ref_pred = jnp.zeros((r, 2), jnp.float32)

    dq = _pad_rows(d_query.astype(jnp.float32), qp)
    dr = _pad_rows(d_ref.astype(jnp.float32), rp)
    qv = _pad_rows(q_valid.astype(jnp.float32)[:, None], qp).T  # (1, QP)
    rv = _pad_rows(r_valid.astype(jnp.float32)[:, None], rp).T
    xq = _pad_rows(xy_query.astype(jnp.float32), qp)
    xr = _pad_rows(xy_ref_pred.astype(jnp.float32), rp)

    grid = qp // TILE_Q
    out = pl.pallas_call(
        functools.partial(_kernel, gate_px=gate_px),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE_Q, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, qp), jnp.int32),
            jax.ShapeDtypeStruct((1, qp), jnp.float32),
            jax.ShapeDtypeStruct((1, qp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, rp), jnp.float32),
            pltpu.VMEM((1, rp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * rp * d, bytes_accessed=4 * (qp + rp) * d,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dq, dr, qv, rv, xq, xr)
    i1 = out[0][0, :q]
    v1 = out[1][0, :q]
    v2 = out[2][0, :q]
    col_best = out[3][0, :]

    d1 = jnp.maximum(1.0 - v1, 0.0)
    d2 = jnp.maximum(1.0 - v2, 1e-12)
    if gate_px is not None:
        has2 = v2 > _NEG / 2
        ratio_ok = jnp.where(has2, d1 < ratio * ratio * d2, True)
    else:
        ratio_ok = d1 < ratio * ratio * d2
    ok = q_valid & (v1 > min_score) & ratio_ok
    if mutual:
        ok = ok & (
            col_best[jnp.clip(i1, 0, col_best.shape[0] - 1)]
            == jnp.arange(q, dtype=jnp.int32)
        )
    return MatchResult(idx=jnp.where(ok, i1, 0), ok=ok, score=v1)
