"""MonoSLAM-style EKF over the PTZ camera with joint ray landmarks.

TPU-native redesign of the reference's per-frame tracking filter (reference:
``slam_system/ptz_slam.py`` EKF — SURVEY.md §4.2, §8.3). The reference grows
and shrinks its state/covariance dynamically in NumPy; on TPU everything is a
fixed-capacity padded state (N_max ray slots + validity masks) so the whole
predict/update/lifecycle step is one jitted, static-shape computation, and a
full sequence runs as a single ``lax.scan``.

State layout (SURVEY.md §8.3):
    x = (pan, tilt, f, d_pan, d_tilt, d_f, theta_1, phi_1, ..., theta_N, phi_N)
with dense covariance P of size (6 + 2N)^2. For N=256 the heavy ops are
~518x518 matmuls and a 512x512 Cholesky — small enough to live in VMEM and
run entirely on-chip every frame.

Masking convention: slot i inactive or unobserved => its H rows are zeroed and
its innovation zeroed, so the Kalman update is exactly the update of the
observed subproblem; inactive P blocks are kept at identity to stay
well-conditioned.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from functools import partial

from ptzjax.config import SLAMConfig
from ptzjax.geometry import Intrinsics, back_project_pixels, project_jacobians

# Covariance algebra must run at true fp32: TPU's default matmul precision is
# bf16, which destroys the SPD structure of S = H P H^T + R and NaNs the
# Cholesky (observed on v5e; CPU was fine). HIGHEST = 6-pass bf16 ~ fp32.
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


class EKFState(NamedTuple):
    """Padded EKF state. N = ray-slot capacity; dim D = 6 + 2N.

    Attributes:
      cam: (6,) pan, tilt, f, and their per-frame velocities.
      rays: (N, 2) slot ray angles (theta, phi); garbage where inactive.
      cov: (D, D) joint covariance.
      active: (N,) bool slot validity.
      missed: (N,) int32 consecutive frames without an observation.
      rej: (N,) int32 consecutive frames whose MATCHED observation failed
        the motion-consensus gate — positive wrong-motion evidence (a
        moving object claimed this slot), unlike mere absence. Reset by any
        non-rejected frame; reaching cfg.max_rejected retires the slot
        (i.i.d. outliers practically never string 3 consecutive
        rejections; movers do so immediately).
      ray_ids: (N,) int32 global map ray id per slot (-1 = empty).
    """

    cam: jax.Array
    rays: jax.Array
    cov: jax.Array
    active: jax.Array
    missed: jax.Array
    rej: jax.Array
    ray_ids: jax.Array

    @property
    def capacity(self) -> int:
        return self.rays.shape[0]

    @property
    def pose(self) -> jax.Array:
        """(pan, tilt, f) 3-vector."""
        return self.cam[:3]


def init_state(pose: jax.Array, cfg: SLAMConfig) -> EKFState:
    """Fresh state around a known initial pose (SURVEY.md §4.1)."""
    n = cfg.max_rays
    d = 6 + 2 * n
    cam = jnp.concatenate([jnp.asarray(pose, jnp.float32), jnp.zeros(3, jnp.float32)])
    p0 = jnp.eye(d, dtype=jnp.float32)
    # camera starts exactly known (GT init, like the reference's first frame);
    # tiny diagonal keeps Cholesky happy. Velocities get the init prior.
    diag = jnp.concatenate(
        [
            jnp.full((3,), 1e-6, jnp.float32),
            jnp.array(
                [cfg.init_vel_std**2, cfg.init_vel_std**2, cfg.init_vel_std_f**2],
                jnp.float32,
            ),
            jnp.ones((2 * n,), jnp.float32),
        ]
    )
    return EKFState(
        cam=cam,
        rays=jnp.zeros((n, 2), jnp.float32),
        cov=p0 * diag,
        active=jnp.zeros((n,), bool),
        missed=jnp.zeros((n,), jnp.int32),
        rej=jnp.zeros((n,), jnp.int32),
        ray_ids=jnp.full((n,), -1, jnp.int32),
    )


def _process_noise(n: int, cfg: SLAMConfig) -> jax.Array:
    d = 6 + 2 * n
    q = jnp.zeros((d,), jnp.float32)
    accel = jnp.array(
        [cfg.sigma_pan**2, cfg.sigma_tilt**2, cfg.sigma_focal**2], jnp.float32
    )
    # constant-velocity model driven by per-frame acceleration noise:
    # position picks up dt^2/4..dt^2 terms; keep the standard diagonal approx.
    q = q.at[0:3].set(accel * cfg.dt**2)
    q = q.at[3:6].set(accel)
    return jnp.diag(q)


def predict(state: EKFState, cfg: SLAMConfig) -> EKFState:
    """Constant-velocity predict; rays are static (SURVEY.md §8.3)."""
    n = state.capacity
    d = 6 + 2 * n
    cam = state.cam.at[0:3].add(cfg.dt * state.cam[3:6])
    # F = I with dt coupling on the camera block. Apply structurally instead
    # of building F: rows/cols 0:3 pick up dt * rows/cols 3:6.
    p = state.cov
    p = p.at[0:3, :].add(cfg.dt * p[3:6, :])
    p = p.at[:, 0:3].add(cfg.dt * p[:, 3:6])
    p = p + _process_noise(n, cfg)
    return state._replace(cam=cam, cov=p)


class UpdateStats(NamedTuple):
    num_used: jax.Array       # observations that passed gating
    num_observed: jax.Array   # observations offered (active slot + valid)
    innovation_rms: jax.Array # gated-innovation RMS in pixels
    lost: jax.Array           # bool: too few inliers => tracking lost
    used_mask: jax.Array      # (N,) bool: slot's observation passed the gate


def update(
    state: EKFState,
    obs: jax.Array,
    obs_mask: jax.Array,
    intr: Intrinsics,
    cfg: SLAMConfig,
) -> tuple[EKFState, UpdateStats]:
    """Joint EKF measurement update from slot-aligned pixel observations.

    Args:
      obs: (N, 2) measured pixel positions, aligned to ray slots.
      obs_mask: (N,) bool — slot observed this frame.

    Returns:
      Updated state and per-frame statistics (SURVEY.md §4.2: lost detection
      by inlier count).
    """
    n = state.capacity
    d = 6 + 2 * n
    pose = state.cam[:3]
    offered = obs_mask & state.active

    pred_pix, j_cam, j_ray = project_jacobians(pose, state.rays, intr)
    innov = obs - pred_pix  # (N, 2)

    # Structured Kalman algebra: H = [Jc | 0 | blockdiag(Jr)] is NEVER
    # materialized, and the UNMASKED innovation-covariance S_u is built
    # FIRST so the Mahalanobis gate reads its diagonal 2x2 blocks for free
    # (the former standalone gate einsums + a diag-block gather cost
    # ~0.20 ms/frame in context on v5e — the single largest item in the
    # whole frame step). Masking commutes exactly: zeroing H's row-pair i
    # scales S rows/cols and P H^T columns by used in {0,1}, which is
    # fp-exact, so gating AFTER building S_u changes no update value.
    # Obs row-pair i occupies rows 2i:2i+2; H's nonzero cols are 0:3
    # (camera) and 6+2i:6+2i+2 (its own ray).
    hi = jax.lax.Precision.HIGHEST
    jc2 = j_cam.reshape(2 * n, 3)

    # P H^T (unmasked): [d, 2i+a] = P[d,0:3]·Jc[i,a,:] + P[d,2i:2i+2]·Jr[i,a,:]
    pr = state.cov[:, 6:].reshape(d, n, 2)
    ph_t = (
        _mm(state.cov[:, 0:3], jc2.T)
        + jnp.einsum("dnb,nab->dna", pr, j_ray, precision=hi).reshape(
            d, 2 * n
        )
    )                                                    # (D, 2N)

    # S_u = H (P H^T): row-pair i = Jc_i·PHT[0:3] + Jr_i·PHT[6+2i:6+2i+2]
    pht_r = ph_t[6:].reshape(n, 2, 2 * n)
    s = (
        _mm(jc2, ph_t[0:3])
        + jnp.einsum("nab,nbm->nam", j_ray, pht_r, precision=hi).reshape(
            2 * n, 2 * n
        )
    )

    # Mahalanobis innovation gate against the *predicted* per-slot
    # innovation covariance S_i = (S_u diag block) + R. This admits large
    # pixel innovations while the velocity is still uncertain (right after
    # init/reloc) and tightens as the filter converges; a fixed pixel gate
    # deadlocks with constant-velocity startup (lost -> reloc -> zero
    # velocity -> lost). Diag blocks via mask+reduce (one VPU pass — an
    # advanced-indexing gather here serializes).
    eye_n = jnp.eye(n, dtype=jnp.float32)
    s_i = (
        s.reshape(n, 2, n, 2) * eye_n[:, None, :, None]
    ).sum(2) + cfg.sigma_obs**2 * jnp.eye(2)             # (N, 2, 2)
    det = s_i[:, 0, 0] * s_i[:, 1, 1] - s_i[:, 0, 1] * s_i[:, 1, 0]
    maha2 = (
        s_i[:, 1, 1] * innov[:, 0] ** 2
        - (s_i[:, 0, 1] + s_i[:, 1, 0]) * innov[:, 0] * innov[:, 1]
        + s_i[:, 0, 0] * innov[:, 1] ** 2
    ) / jnp.maximum(det, 1e-12)
    px_ok = jnp.linalg.norm(innov, axis=-1) < cfg.innovation_gate_px
    used = offered & (maha2 < cfg.gate_maha2) & px_ok

    # Gate rescue: a camera acceleration beyond the constant-velocity
    # model's process noise (a broadcast operator reversing a pan) shifts
    # ALL innovations coherently past the tight gate at once — which is
    # indistinguishable from "lost" by count alone and used to trigger a
    # spurious relocalization. If the tight gate starves while a widened
    # gate admits a LARGE consistent set (true loss leaves only scattered
    # coincidences, not 3x min_inliers agreeing matches), trust the wide
    # set; the px ceiling still bounds outliers.
    used_wide = offered & (maha2 < cfg.gate_rescue_factor * cfg.gate_maha2) & px_ok
    rescue = (used.sum() < cfg.min_inliers) & (
        used_wide.sum() >= 3 * cfg.min_inliers
    )
    used = jnp.where(rescue, used_wide, used)
    used_f = used.astype(jnp.float32)[:, None]           # (N, 1)
    innov = jnp.where(used[:, None], innov, 0.0)

    # apply the gate: zero unused row-pairs of S / cols of PHT / Jacobians
    u2 = jnp.repeat(used, 2).astype(jnp.float32)         # (2N,)
    ph_t = ph_t * u2[None, :]
    s = s * (u2[:, None] * u2[None, :])
    j_cam = j_cam * used_f[..., None]                    # (N, 2, 3)
    j_ray = j_ray * used_f[..., None]                    # (N, 2, 2)
    jc2 = j_cam.reshape(2 * n, 3)

    r_diag = jnp.full((2 * n,), cfg.sigma_obs**2, jnp.float32)
    s = s + jnp.diag(r_diag)
    # Solve S X = (P H^T)^T via Cholesky; K = X^T.
    chol = jax.scipy.linalg.cho_factor(s, lower=True)
    k = jax.scipy.linalg.cho_solve(chol, ph_t.T).T       # (D, 2N)

    dx = k @ innov.reshape(-1)
    cam = state.cam + dx[:6]
    rays = state.rays + dx[6:].reshape(n, 2)

    # Joseph-form covariance update for fp32 stability. K H reuses the same
    # block structure: cols 0:3 = K·Jc, cols 3:6 = 0, ray col-pair j only
    # sees K's own column pair.
    kr = k.reshape(d, n, 2)
    kh = jnp.concatenate(
        [
            _mm(k, jc2),
            jnp.zeros((d, 3), jnp.float32),
            jnp.einsum("dna,nab->dnb", kr, j_ray, precision=hi).reshape(
                d, 2 * n
            ),
        ],
        axis=1,
    )
    ikh = jnp.eye(d, dtype=jnp.float32) - kh
    cov = _mm(_mm(ikh, state.cov), ikh.T) + _mm(k * r_diag[None, :], k.T)
    cov = 0.5 * (cov + cov.T)

    num_used = used.sum()
    num_obs = offered.sum()
    rms = jnp.sqrt(
        jnp.sum(innov**2) / jnp.maximum(1.0, 2.0 * num_used.astype(jnp.float32))
    )
    stats = UpdateStats(
        num_used=num_used,
        num_observed=num_obs,
        innovation_rms=rms,
        lost=num_used < cfg.min_inliers,
        used_mask=used,
    )
    missed = jnp.where(used, 0, state.missed + state.active.astype(jnp.int32))
    return state._replace(cam=cam, rays=rays, cov=cov, missed=missed), stats


def retire_lost(state: EKFState, cfg: SLAMConfig) -> EKFState:
    """Free slots unobserved for too long (reference: ray deletion, §4.2)."""
    drop = state.active & (
        (state.missed > cfg.max_missed) | (state.rej >= cfg.max_rejected)
    )
    return _clear_slots(state, drop)


def _clear_slots(state: EKFState, drop: jax.Array) -> EKFState:
    n = state.capacity
    keep = ~drop
    active = state.active & keep
    ray_ids = jnp.where(keep, state.ray_ids, -1)
    # reset dropped slots' covariance to identity, zero cross terms
    slot_rows = jnp.repeat(drop, 2)                      # (2N,) aligned to ray block
    full = jnp.concatenate([jnp.zeros((6,), bool), slot_rows])
    cov = jnp.where(full[:, None] | full[None, :], 0.0, state.cov)
    cov = cov + jnp.diag(jnp.where(full, 1.0, 0.0))
    return state._replace(
        active=active, ray_ids=ray_ids, cov=cov,
        missed=jnp.where(keep, state.missed, 0),
        rej=jnp.where(keep, state.rej, 0),
    )


class SlotClaim(NamedTuple):
    """Bookkeeping of candidate -> free-slot assignment (deterministic:
    the j-th accepted candidate claims the j-th free slot).

    Attributes:
      cand_ok: (K,) candidate accepted (masked in and a free slot exists).
      target: (K,) int32 slot index per candidate (n where rejected).
      newly: (N,) bool slot claimed in this call.
      cand_of_slot: (N,) int32 claiming candidate per slot (k where none).
    """

    cand_ok: jax.Array
    target: jax.Array
    newly: jax.Array
    cand_of_slot: jax.Array


def claim_slots(active: jax.Array, cand_mask: jax.Array) -> SlotClaim:
    """Assign accepted candidates to free slots. The only scatters here are
    O(N)/O(K) int32 writes — callers should use ``cand_of_slot`` gathers +
    masked selects for the heavy payloads instead of scattering them (a
    large elementwise scatter is near-serial on TPU and dominated the whole
    frame step before this refactor)."""
    n = active.shape[0]
    k = cand_mask.shape[0]
    free = ~active
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    cand_rank = jnp.cumsum(cand_mask.astype(jnp.int32)) - 1
    num_free = free.sum()
    cand_ok = cand_mask & (cand_rank < num_free)
    slot_of_rank = jnp.full((n,), n, jnp.int32).at[
        jnp.where(free, free_rank, n)
    ].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    target = jnp.where(cand_ok, slot_of_rank[jnp.clip(cand_rank, 0, n - 1)], n)
    newly = jnp.zeros((n,), bool).at[target].set(True, mode="drop")
    cand_of_slot = jnp.full((n,), k, jnp.int32).at[target].set(
        jnp.arange(k, dtype=jnp.int32), mode="drop"
    )
    return SlotClaim(cand_ok, target, newly, cand_of_slot)


def insert_rays(
    state: EKFState,
    pixels: jax.Array,
    cand_mask: jax.Array,
    cand_ids: jax.Array,
    intr: Intrinsics,
    cfg: SLAMConfig,
) -> EKFState:
    """Back-project fresh keypoints into free slots (SURVEY.md §4.2).

    MonoSLAM-style state augmentation: the new ray is g(pose, pixel), so its
    covariance is G_c P_cc G_c^T + G_p R G_p^T with full cross-covariance
    G_c P_c,* against the existing state (including other rays inserted in
    the same call). Without this, new-ray uncertainty is uncorrelated with
    the camera and the filter can silently absorb pose error into the map
    (observed as a locked-in focal-length bias on noiseless data).

    All writes are slot-major gathers + dense masked selects: the previous
    per-candidate scatter of the (2K, 2K) new-new block was ~262k scattered
    elements per frame and alone cost more device time than everything else
    in the tracking step combined (profiled on v5e).

    Args:
      pixels: (K, 2) candidate keypoint positions.
      cand_mask: (K,) bool — candidate is real.
      cand_ids: (K,) int32 global ray ids to record.
    """
    n = state.capacity
    k = pixels.shape[0]
    d = 6 + 2 * n
    pose = state.cam[:3]
    new_rays = back_project_pixels(pose, pixels, intr)   # (K, 2)

    # Jacobians of g(pose, pixel) via autodiff (exact; insertion is not hot).
    def g(c, px):
        return back_project_pixels(c, px[None, :], intr)[0]

    g_cam = jax.vmap(jax.jacfwd(g, argnums=0), (None, 0))(pose, pixels)  # (K,2,3)
    g_pix = jax.vmap(jax.jacfwd(g, argnums=1), (None, 0))(pose, pixels)  # (K,2,2)

    claim = claim_slots(state.active, cand_mask)
    sel = claim.newly                                     # (N,)
    safe = jnp.clip(claim.cand_of_slot, 0, k - 1)         # (N,) gather index

    rays = jnp.where(sel[:, None], new_rays[safe], state.rays)
    active = state.active | sel
    ray_ids = jnp.where(sel, cand_ids[safe], state.ray_ids)
    missed = jnp.where(sel, 0, state.missed)
    rej = jnp.where(sel, 0, state.rej)

    # --- covariance augmentation (slot-major, scatter-free) ---
    zero2 = sel[:, None, None].astype(jnp.float32)
    g_cam_s = g_cam[safe] * zero2                         # (N,2,3), 0 if old
    g_pix_s = g_pix[safe] * zero2                         # (N,2,2)

    # 1) clear the claimed slots' rows/cols (stale identity blocks).
    slot_rows = jnp.repeat(sel, 2)
    full = jnp.concatenate([jnp.zeros((6,), bool), slot_rows])  # (D,)
    cov = jnp.where(full[:, None] | full[None, :], 0.0, state.cov)

    # 2) cross-covariance of new rays vs the whole (cleared) state:
    #    P_new,* = G_c P_pose,*   (velocity/pixel terms have zero Jacobian).
    hi = jax.lax.Precision.HIGHEST
    cross = jnp.einsum("nab,bD->naD", g_cam_s, cov[0:3, :], precision=hi)
    cross_full = jnp.concatenate(
        [jnp.zeros((6, d), jnp.float32), cross.reshape(2 * n, d)]
    )                                                     # (D, D)
    cov = jnp.where(full[:, None], cross_full, cov)
    cov = jnp.where(full[None, :], cross_full.T, cov)

    # 3) new-new blocks: G_ci P_cc G_cj^T + delta_ij (G_p R G_p^T + prior).
    pcc = state.cov[0:3, 0:3]
    gc_p = jnp.einsum("nab,bc->nac", g_cam_s, pcc, precision=hi)     # (N,2,3)
    blocks = jnp.einsum("nac,mdc->namd", gc_p, g_cam_s, precision=hi)
    pix_noise = cfg.sigma_obs**2 * jnp.einsum(
        "nab,ncb->nac", g_pix_s, g_pix_s, precision=hi
    )
    # extra diagonal prior keeps newly inserted rays from being overconfident
    prior = (cfg.init_ray_std**2) * zero2 * jnp.eye(2, dtype=jnp.float32)
    eye_n = jnp.eye(n, dtype=jnp.float32)
    blocks = blocks + eye_n[:, None, :, None] * (pix_noise + prior)[:, :, None, :]
    blocks_full = jnp.pad(blocks.reshape(2 * n, 2 * n), ((6, 0), (6, 0)))
    cov = jnp.where(full[:, None] & full[None, :], blocks_full, cov)

    return state._replace(
        rays=rays, active=active, ray_ids=ray_ids, missed=missed, rej=rej,
        cov=cov
    )


def step(
    state: EKFState,
    obs: jax.Array,
    obs_mask: jax.Array,
    intr: Intrinsics,
    cfg: SLAMConfig,
) -> tuple[EKFState, UpdateStats]:
    """predict + update; jit-friendly single-frame step."""
    state = predict(state, cfg)
    return update(state, obs, obs_mask, intr, cfg)


def scan_track(
    state: EKFState,
    obs_seq: jax.Array,
    mask_seq: jax.Array,
    intr: Intrinsics,
    cfg: SLAMConfig,
) -> tuple[EKFState, tuple[jax.Array, UpdateStats]]:
    """Track a whole sequence of slot-aligned observations with lax.scan.

    Args:
      obs_seq: (T, N, 2), mask_seq: (T, N).

    Returns:
      (final_state, (poses (T, 3), stats)).
    """

    def body(s, frame):
        o, m = frame
        s, st = step(s, o, m, intr, cfg)
        return s, (s.pose, st)

    return jax.lax.scan(body, state, (obs_seq, mask_seq))
