"""Fused Pallas Cholesky for the EKF's per-frame innovation solve.

STATUS (round 4): EXPERIMENTAL — NOT wired into the EKF. The algorithm is
verified exact in Pallas interpret mode (reconstruction ~3e-7 rel, see
tests/test_kernels.py::test_cholesky_pallas_interpret), but the current
axon/Mosaic toolchain on this environment (a) miscompiles the kernel on
real v5e hardware (~1e-2 reconstruction error — first isolated to
non-128-aligned lane-offset value slices, still wrong after replacing
them with one-hot selection matmuls) and (b) hangs AOT compilation
nondeterministically (identical kernel bodies compile in 1-2.5 s on some
invocations and block >9 min on others). ekf.update therefore keeps
jnp.linalg.cholesky (XLA) + the _inv_lower Neumann-product solve, which
is already matmul-shaped. Revisit when the toolchain updates.

XLA's TPU Cholesky expander factors an (n, n) SPD matrix with an n-step
While loop (one pivot per iteration) — measured ~38 us at n=256 and
~2-4x that at n=512 on v5e, the single largest item in the EKF update
after the round-4 layout work. The serial pivot chain is fundamental to
an exact factorization, but its per-step cost is not: this kernel runs
the whole factorization inside ONE Pallas program with the matrix
resident in VMEM, a 32-wide panel algorithm, and the 32 inner pivot
steps fully unrolled at trace time (no loop bookkeeping), so each step
is a handful of VPU instructions on (1, 32)/(32, 32) tiles instead of an
XLA While iteration.

Algorithm (upper-Cholesky U with S = U^T U, returned transposed as L):
  for each 32-row panel j (fori_loop, c0 = 32 j):
    1. factor the 32x32 diagonal block D = U_jj^T U_jj   (unrolled)
    2. invert U_jj with the finite Neumann product (M strictly upper,
       M^32 = 0  =>  (I - M)^-1 = prod_k (I + M^{2^k}), 4 squarings)
    3. full-width row panel: U[c0:c0+32, :] = U_jj^{-T} A'[c0:c0+32, :],
       columns < c0 masked to zero (their inputs hold trailing garbage)
    4. trailing update A' -= U_panel^T U_panel (one MXU dot_general,
       contracting the sublane dim — no transpose relayout)

Panels advance along SUBLANES (row panels of the upper factor), so every
slice in the hot path is 8-aligned; only the 32x32 diagonal block takes
a lane-offset slice, which is cheap at that size.

Parity: bitwise-identical is NOT expected vs jnp.linalg.cholesky (the
reduction orders differ); tests gate on ~1e-5 relative reconstruction
error, same as the XLA factor itself (tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_P = 32  # panel width


def _factor_diag_unrolled(d):
    """Upper-Cholesky of a (P, P) SPD block, fully unrolled.

    Returns U with D = U^T U. Rows below the diagonal are zeroed by the
    per-step lane mask.
    """
    p = d.shape[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    u = jnp.zeros((p, p), jnp.float32)
    # Every step is a full-(P,P) broadcast op: Mosaic compiles (1, P)-slice
    # + concatenate chains pathologically (observed: >9 min AOT hang), so
    # row t / column t are extracted by masked reduces — valid because the
    # trailing submatrix stays SYMMETRIC throughout a right-looking
    # factorization — and the rank-1 update is a (P,1)x(1,P) broadcast
    # product, never a transpose.
    for t in range(p):  # Python int: fully unrolled
        row_m = (ri == t).astype(jnp.float32)
        rowvec = jnp.sum(d * row_m, axis=0, keepdims=True)       # (1, P)
        colvec = jnp.sum(d * (ci == t), axis=1, keepdims=True)   # (P, 1)
        piv = jnp.sum(rowvec * (ci[0:1, :] == t), axis=1, keepdims=True)
        inv_sq = jax.lax.rsqrt(jnp.maximum(piv, 1e-30))          # (1, 1)
        urow = jnp.where(ci[0:1, :] >= t, rowvec * inv_sq, 0.0)  # (1, P)
        ucol = jnp.where(ri[:, 0:1] >= t, colvec * inv_sq, 0.0)  # (P, 1)
        d = d - ucol * urow
        u = u + row_m * urow
    return u


def _inv_upper_neumann(u):
    """Exact inverse of an upper-triangular (P, P) block: U = D(I - M),
    M strictly upper nilpotent => (I-M)^-1 is a finite Neumann product."""
    p = u.shape[0]
    eye = jnp.eye(p, dtype=jnp.float32)
    dinv = 1.0 / jnp.maximum((u * eye).sum(axis=1), 1e-30)       # diag(U)
    m = eye - u * dinv[:, None]                                  # strictly upper
    x = eye + m
    pw = m
    k = 2
    while k < p:
        pw = jnp.dot(pw, pw, preferred_element_type=jnp.float32)
        x = x + jnp.dot(pw, x, preferred_element_type=jnp.float32)
        k *= 2
    return x * dinv[None, :]


def _chol_kernel(s_ref, out_ref, a_ref):
    n = s_ref.shape[0]
    a_ref[:] = s_ref[:]
    lanes_n = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    # The panel loop is unrolled in Python (n is static), so every slice
    # below is STATIC — Mosaic compiles dynamic sublane offsets + a
    # fori-wrapped unrolled body pathologically slowly on this toolchain.
    iota_n0 = jax.lax.broadcasted_iota(jnp.int32, (n, _P), 0)
    iota_p1 = jax.lax.broadcasted_iota(jnp.int32, (n, _P), 1)
    for j in range(n // _P):
        c0 = j * _P
        rows0 = a_ref[c0 : c0 + _P, :]                           # (P, n)
        # diag block via a one-hot selection matmul: value slices at lane
        # offsets that are not 128-aligned MISCOMPILE on this Mosaic
        # toolchain (silently wrong data, ~1e-2 reconstruction error)
        sel = (iota_n0 == c0 + iota_p1).astype(jnp.float32)      # (n, P)
        d = jnp.dot(rows0, sel, preferred_element_type=jnp.float32)
        ujj = _factor_diag_unrolled(d)
        iujj = _inv_upper_neumann(ujj)
        upan = jax.lax.dot_general(
            iujj, rows0,
            dimension_numbers=(((0,), (0,)), ((), ())),          # iujj^T @ rows
            preferred_element_type=jnp.float32,
        )
        upan = jnp.where(lanes_n >= c0, upan, 0.0)
        out_ref[c0 : c0 + _P, :] = upan
        # trailing update: A' -= U_panel^T U_panel (contract sublanes)
        a_ref[:] = a_ref[:] - jax.lax.dot_general(
            upan, upan,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.jit, static_argnames=())
def cholesky_pallas(s: jax.Array) -> jax.Array:
    """Lower-Cholesky factor of an SPD (n, n) fp32 matrix, n % 32 == 0.

    Drop-in for ``jnp.linalg.cholesky`` on sizes the EKF uses (2N = 192,
    256, 512...). Internally computes the upper factor panel-wise in one
    VMEM-resident Pallas program and returns its transpose.
    """
    n = s.shape[0]
    if n % _P != 0:
        raise ValueError(f"cholesky_pallas: n={n} must be a multiple of {_P}")
    u = pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
    )(s.astype(jnp.float32))
    return u.T
