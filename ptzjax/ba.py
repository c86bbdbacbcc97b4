"""Bundle adjustment: Levenberg–Marquardt with the ray-landmark Schur
complement (SURVEY.md §8.4).

TPU-native replacement for the reference's ``slam_system/bundle_adjustment.py``
(scipy ``least_squares(method='trf')`` with a lil_matrix sparsity pattern —
SURVEY.md §2 layer 7, §4.3). Instead of a general sparse solver, we exploit
the problem's exact structure:

- cameras are 3-vectors (pan, tilt, focal), rays are 2-vectors;
- J splits into camera blocks A (2x3) and ray blocks B (2x2);
- the normal equations reduce by eliminating rays: per-ray 2x2 inverses (free
  on the VPU) and a small dense (3K x 3K) reduced camera system solved by
  Cholesky.

Data layout is **ray-major**: a padded (M, C) table of observations where M is
the ray capacity and C the max keyframes-per-ray. Each ray's V block, g_r, and
W row live entirely in its table row, which makes the distributed version a
pure psum over ray shards (SURVEY.md §5): shard M, all-reduce the (3K x 3K)
camera system, solve replicated, scatter per-ray updates locally.

Parameter scaling: focal length enters the parameter vector as f * focal_scale
(default 1e-3) so all parameters are O(1) in fp32 (SURVEY.md §10 hard parts).
All reductions run at Precision.HIGHEST (TPU bf16 default is not enough for
normal equations).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ptzjax.config import SLAMConfig
from ptzjax.geometry import Intrinsics, project_jacobians

_HI = jax.lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    """Padded ray-major BA problem.

    Attributes:
      cams: (K, 3) initial keyframe poses (pan, tilt, f) — f unscaled pixels.
      rays: (M, 2) initial ray angles.
      obs_pix: (M, C, 2) observed pixel positions.
      obs_cam: (M, C) int32 camera index per observation (0 for padding).
      obs_w: (M, C) fp32 weight, 0 for padding/invalid.
      cam_free: (K,) bool — False freezes a camera (gauge fixing / padding).
    """

    cams: jax.Array
    rays: jax.Array
    obs_pix: jax.Array
    obs_cam: jax.Array
    obs_w: jax.Array
    cam_free: jax.Array


class BAResult(NamedTuple):
    cams: jax.Array
    rays: jax.Array
    cost: jax.Array           # final weighted SSE (px^2)
    initial_cost: jax.Array
    iterations: jax.Array     # LM iterations run
    accepted: jax.Array       # number of accepted steps


def _gather_obs(cams: jax.Array, rays: jax.Array, prob: BAProblem, intr: Intrinsics):
    """Residuals + Jacobian blocks for every (ray, slot) observation.

    Returns r (M,C,2), A (M,C,2,3) wrt scaled params, B (M,C,2,2).
    """
    cam_per_obs = cams[prob.obs_cam]                     # (M, C, 3)
    m, c = prob.obs_cam.shape
    pix, j_cam, j_ray = project_jacobians(
        cam_per_obs.reshape(m * c, 1, 3)[:, 0, :],       # (MC, 3)
        rays[:, None, :].repeat(c, 1).reshape(m * c, 1, 2),
        intr,
    )
    r = pix.reshape(m, c, 2) - prob.obs_pix
    a = j_cam.reshape(m, c, 2, 3)
    b = j_ray.reshape(m, c, 2, 2)
    w = prob.obs_w[..., None]
    return r * w, a * w[..., None], b * w[..., None]


def _scale_jac(a: jax.Array, focal_scale: float) -> jax.Array:
    """Rescale the focal column for the scaled parameterization."""
    return a.at[..., 2].divide(focal_scale)


def compute_cost(
    cams: jax.Array, rays: jax.Array, prob: BAProblem, intr: Intrinsics
) -> jax.Array:
    r, _, _ = _gather_obs(cams, rays, prob, intr)
    return jnp.sum(r * r)


def normal_terms(
    cams: jax.Array,
    rays: jax.Array,
    prob: BAProblem,
    intr: Intrinsics,
    focal_scale: float,
):
    """Per-shard LM normal-equation terms (pure; psum-able across ray shards).

    Returns:
      u: (K, 3, 3) camera Gauss-Newton blocks, g_c: (K, 3),
      v: (M, 2, 2) ray blocks, g_r: (M, 2), w_blk: (M, C, 3, 2) A^T B.
    """
    k = cams.shape[0]
    r, a, b = _gather_obs(cams, rays, prob, intr)
    a = _scale_jac(a, focal_scale)

    # camera system: segment-sum A^T A and A^T r by camera index
    ata = jnp.einsum("mcab,mcad->mcbd", a, a, precision=_HI)     # (M,C,3,3)
    atr = jnp.einsum("mcab,mca->mcb", a, r, precision=_HI)       # (M,C,3)
    flat_cam = prob.obs_cam.reshape(-1)
    u = jax.ops.segment_sum(ata.reshape(-1, 3, 3), flat_cam, num_segments=k)
    g_c = jax.ops.segment_sum(atr.reshape(-1, 3), flat_cam, num_segments=k)

    # ray system: local to each table row
    v = jnp.einsum("mcab,mcad->mbd", b, b, precision=_HI)        # (M,2,2)
    g_r = jnp.einsum("mcab,mca->mb", b, r, precision=_HI)        # (M,2)
    w_blk = jnp.einsum("mcab,mcad->mcbd", a, b, precision=_HI)   # (M,C,3,2)
    return u, g_c, v, g_r, w_blk


def _inv2x2(v: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Batched closed-form 2x2 inverse; padding rows (zero blocks) -> ~0."""
    a, b_ = v[..., 0, 0], v[..., 0, 1]
    c, d = v[..., 1, 0], v[..., 1, 1]
    det = a * d - b_ * c + eps
    inv = jnp.stack(
        [jnp.stack([d, -b_], -1), jnp.stack([-c, a], -1)], -2
    ) / det[..., None, None]
    return inv


def _damp(h: jax.Array, lam: jax.Array, eps: float = 1e-8) -> jax.Array:
    """LM damping: H + lam * diag(H) + eps I (Marquardt scaling)."""
    n = h.shape[-1]
    eye = jnp.eye(n, dtype=h.dtype)
    diag = h * eye
    return h + lam * diag + eps * eye


def schur_local(v, g_r, w_blk, obs_cam, num_cams, lam):
    """Shard-local Schur-correction contributions (SURVEY.md §5): everything
    here only touches this shard's ray rows, so sharded BA just psums the
    returned (K,K,3,3) + (K,3) blocks — the one collective on the LM
    critical path."""
    k = num_cams
    v_inv = _inv2x2(_damp(v, lam))                                # (M,2,2)
    y = jnp.einsum("mcab,mbd->mcad", w_blk, v_inv, precision=_HI) # (M,C,3,2)

    # correction blocks for every same-ray camera pair (c, c')
    corr = jnp.einsum("mcab,mdeb->mcdae", y, w_blk, precision=_HI)  # (M,C,C,3,3)
    pair_idx = (obs_cam[:, :, None] * k + obs_cam[:, None, :]).reshape(-1)
    s_corr = jax.ops.segment_sum(
        corr.reshape(-1, 3, 3), pair_idx, num_segments=k * k
    ).reshape(k, k, 3, 3)

    rhs_per_obs = jnp.einsum("mcab,mb->mca", y, g_r, precision=_HI)  # (M,C,3)
    rhs_corr = jax.ops.segment_sum(
        rhs_per_obs.reshape(-1, 3), obs_cam.reshape(-1), num_segments=k
    )
    return s_corr, rhs_corr


def schur_assemble(u, g_c, s_corr, rhs_corr, cam_free, lam):
    """Assemble the damped, gauge-fixed reduced system from (already
    all-reduced) terms. Runs replicated on every shard; S is (3K, 3K) —
    small and dense by design."""
    k = u.shape[0]
    s = jnp.zeros((k, k, 3, 3), u.dtype)
    s = s.at[jnp.arange(k), jnp.arange(k)].set(_damp(u, lam))
    s = s - s_corr
    rhs = -g_c + rhs_corr                                          # (K,3)

    # gauge / padding: frozen cameras get identity rows/cols, zero rhs
    free = cam_free.astype(u.dtype)
    s = s * free[:, None, None, None] * free[None, :, None, None]
    eye3 = jnp.eye(3, dtype=u.dtype)
    s = s.at[jnp.arange(k), jnp.arange(k)].add(
        (1.0 - free)[:, None, None] * eye3
    )
    rhs = rhs * free[:, None]
    return s.transpose(0, 2, 1, 3).reshape(3 * k, 3 * k), rhs.reshape(-1)


def schur_reduce(u, g_c, v, g_r, w_blk, obs_cam, cam_free, lam):
    """Single-device convenience: local contributions + assembly."""
    s_corr, rhs_corr = schur_local(v, g_r, w_blk, obs_cam, u.shape[0], lam)
    return schur_assemble(u, g_c, s_corr, rhs_corr, cam_free, lam)


def back_substitute(v, g_r, w_blk, obs_cam, dc, lam):
    """Per-ray updates dr_j = V_j^{-1} (-g_rj - sum_c W_jc^T dc_{cam});
    embarrassingly parallel over rays (SURVEY.md §8.4)."""
    k3 = dc.shape[0]
    dc_blocks = dc.reshape(-1, 3)
    v_inv = _inv2x2(_damp(v, lam))
    wt_dc = jnp.einsum(
        "mcab,mca->mb", w_blk, dc_blocks[obs_cam], precision=_HI
    )                                                             # (M,2)
    return jnp.einsum("mab,mb->ma", v_inv, -g_r - wt_dc, precision=_HI)


def lm_iteration(
    cams, rays, lam, prob: BAProblem, intr, cfg: SLAMConfig, axis_name=None
):
    """One damped step: build, reduce, solve, back-substitute. Returns the
    candidate parameters (caller decides acceptance).

    With ``axis_name`` set (inside shard_map over ray shards), the camera
    system is psum-reduced over the mesh axis; ray elimination and back
    substitution stay shard-local (SURVEY.md §5, §8.4).
    """
    fs = cfg.ba_focal_scale
    u, g_c, v, g_r, w_blk = normal_terms(cams, rays, prob, intr, fs)
    s_corr, rhs_corr = schur_local(
        v, g_r, w_blk, prob.obs_cam, cams.shape[0], lam
    )
    if axis_name is not None:
        u, g_c, s_corr, rhs_corr = jax.lax.psum(
            (u, g_c, s_corr, rhs_corr), axis_name
        )
    s, rhs = schur_assemble(u, g_c, s_corr, rhs_corr, prob.cam_free, lam)
    chol = jax.scipy.linalg.cho_factor(s, lower=True)
    dc = jax.scipy.linalg.cho_solve(chol, rhs)     # replicated on all shards
    dr = back_substitute(v, g_r, w_blk, prob.obs_cam, dc, lam)  # shard-local
    # np (not jnp) constant: traced-in jnp constants become captured device
    # buffers that stall every dispatch on this backend (kernels/flow.py)
    dc_unscaled = dc.reshape(-1, 3) * np.array([1.0, 1.0, 1.0 / fs], np.float32)
    new_cams = cams + dc_unscaled * prob.cam_free[:, None]
    new_rays = rays + dr
    return new_cams, new_rays


def run(
    prob: BAProblem, intr: Intrinsics, cfg: SLAMConfig, axis_name=None
) -> BAResult:
    """Full LM loop with accept/reject, fixed iteration count (static shape).

    Rejected steps keep parameters and raise lambda; accepted steps lower it
    (SURVEY.md §8.4 LM schedule). Everything stays on device. Works unchanged
    inside shard_map over ray shards when ``axis_name`` is given — costs are
    psum-ed, the reduced camera solve is replicated, rays stay local.
    """

    def total_cost(cams, rays):
        c = compute_cost(cams, rays, prob, intr)
        if axis_name is not None:
            c = jax.lax.psum(c, axis_name)
        return c

    cost0 = total_cost(prob.cams, prob.rays)

    def body(carry, _):
        cams, rays, lam, cost, accepted = carry
        cand_cams, cand_rays = lm_iteration(
            cams, rays, lam, prob, intr, cfg, axis_name=axis_name
        )
        cand_cost = total_cost(cand_cams, cand_rays)
        ok = cand_cost < cost
        cams = jnp.where(ok, cand_cams, cams)
        rays = jnp.where(ok, cand_rays, rays)
        cost = jnp.where(ok, cand_cost, cost)
        lam = jnp.where(
            ok, lam * cfg.ba_lambda_down, lam * cfg.ba_lambda_up
        )
        lam = jnp.clip(lam, 1e-10, 1e6)
        return (cams, rays, lam, cost, accepted + ok.astype(jnp.int32)), cost

    init = (
        prob.cams,
        prob.rays,
        jnp.asarray(cfg.ba_lambda0, prob.cams.dtype),
        cost0,
        jnp.asarray(0, jnp.int32),
    )
    (cams, rays, _, cost, accepted), _ = jax.lax.scan(
        body, init, None, length=cfg.ba_iters
    )
    return BAResult(
        cams=cams,
        rays=rays,
        cost=cost,
        initial_cost=cost0,
        iterations=jnp.asarray(cfg.ba_iters, jnp.int32),
        accepted=accepted,
    )
