"""BA correctness (SURVEY.md §6 item 4): the JAX LM/Schur solver must reach
the same minimum as scipy.optimize.least_squares on identical problems, and
recover GT on noiseless synthetic multi-keyframe problems."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from ptzjax import ba, synth
from ptzjax.config import SLAMConfig


def build_problem(
    num_kf=6, num_rays_cap=160, noise=0.0, perturb_cam=(5e-3, 3e-3, 30.0),
    perturb_ray=2e-3, seed=0, min_views=2,
):
    """Synthetic multi-keyframe BA problem in ray-major layout + GT."""
    rng = np.random.default_rng(seed)
    seq = synth.make_sequence(
        num_frames=40 * num_kf, num_rays=800, pan_amp=0.25, f_amp=400.0,
        period=40 * num_kf * 1.2, seed=seed,
    )
    frames = np.linspace(0, len(seq.cameras) - 1, num_kf).astype(int)
    gt_cams = seq.cameras[frames]

    per_ray = {}
    for ki, fr in enumerate(frames):
        pix, _, ids = synth.render_frame(seq, int(fr), noise_px=noise, seed=seed)
        for p, rid in zip(pix, ids):
            per_ray.setdefault(int(rid), []).append((ki, p))
    sel = sorted(r for r, v in per_ray.items() if len(v) >= min_views)
    sel = sel[:num_rays_cap]
    m = num_rays_cap
    c = max(len(per_ray[r]) for r in sel)

    obs_pix = np.zeros((m, c, 2), np.float32)
    obs_cam = np.zeros((m, c), np.int32)
    obs_w = np.zeros((m, c), np.float32)
    gt_rays = np.zeros((m, 2), np.float32)
    for j, rid in enumerate(sel):
        gt_rays[j] = seq.rays[rid]
        for s, (ki, p) in enumerate(per_ray[rid]):
            obs_pix[j, s] = p
            obs_cam[j, s] = ki
            obs_w[j, s] = 1.0

    cams0 = gt_cams.copy()
    cams0[1:] += rng.normal(scale=perturb_cam, size=(num_kf - 1, 3)).astype(np.float32)
    rays0 = gt_rays + rng.normal(scale=perturb_ray, size=gt_rays.shape).astype(np.float32)
    rays0[len(sel):] = 0.0
    cam_free = np.ones(num_kf, bool)
    cam_free[0] = False  # gauge anchor

    prob = ba.BAProblem(
        cams=jnp.asarray(cams0),
        rays=jnp.asarray(rays0),
        obs_pix=jnp.asarray(obs_pix),
        obs_cam=jnp.asarray(obs_cam),
        obs_w=jnp.asarray(obs_w),
        cam_free=jnp.asarray(cam_free),
    )
    return prob, seq.intr, gt_cams, gt_rays, len(sel)


def scipy_solve(prob, intr, n_real):
    """fp64 scipy reference on the identical weighted problem."""
    cams0 = np.asarray(prob.cams, np.float64)
    rays0 = np.asarray(prob.rays, np.float64)[:n_real]
    obs_pix = np.asarray(prob.obs_pix, np.float64)[:n_real]
    obs_cam = np.asarray(prob.obs_cam)[:n_real]
    obs_w = np.asarray(prob.obs_w, np.float64)[:n_real]
    free = np.asarray(prob.cam_free)
    k = cams0.shape[0]
    cx, cy = float(intr.cx), float(intr.cy)
    nf = int(free.sum())

    def unpack(x):
        cams = cams0.copy()
        cams[free] = x[: nf * 3].reshape(-1, 3)
        rays = x[nf * 3:].reshape(-1, 2)
        return cams, rays

    def residual(x):
        cams, rays = unpack(x)
        cam = cams[obs_cam]                       # (m, c, 3)
        u = rays[:, None, 0] - cam[..., 0]
        v = rays[:, None, 1] - cam[..., 1]
        f = cam[..., 2]
        x_px = f * np.tan(u) + cx
        y_px = -f * np.tan(v) / np.cos(u) + cy
        r = np.stack([x_px, y_px], -1) - obs_pix
        return (r * obs_w[..., None]).reshape(-1)

    x0 = np.concatenate([cams0[free].reshape(-1), rays0.reshape(-1)])
    out = scipy.optimize.least_squares(residual, x0, method="trf", xtol=1e-12, ftol=1e-12)
    cams, rays = unpack(out.x)
    return cams, rays, 2 * out.cost  # scipy cost = 0.5 * SSE


def test_noiseless_recovers_ground_truth():
    prob, intr, gt_cams, gt_rays, n_real = build_problem(noise=0.0)
    cfg = SLAMConfig(ba_iters=25)
    res = jax.jit(lambda p: ba.run(p, intr, cfg))(prob)
    assert float(res.cost) < 1e-2 * float(res.initial_cost)
    cams = np.asarray(res.cams)
    assert np.abs(cams[:, 0] - gt_cams[:, 0]).max() < 5e-5, "pan"
    assert np.abs(cams[:, 1] - gt_cams[:, 1]).max() < 5e-5, "tilt"
    assert np.abs(cams[:, 2] - gt_cams[:, 2]).max() < 0.5, "focal"
    rays = np.asarray(res.rays)[:n_real]
    assert np.abs(rays - gt_rays[:n_real]).max() < 5e-4


def test_matches_scipy_minimum_on_noisy_problem():
    prob, intr, _, _, n_real = build_problem(noise=0.5, seed=2)
    cfg = SLAMConfig(ba_iters=30)
    res = jax.jit(lambda p: ba.run(p, intr, cfg))(prob)
    sp_cams, sp_rays, sp_cost = scipy_solve(prob, intr, n_real)
    ours = float(res.cost)
    assert ours <= 1.02 * sp_cost, f"ours {ours} vs scipy {sp_cost}"
    np.testing.assert_allclose(np.asarray(res.cams)[:, :2], sp_cams[:, :2], atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.cams)[:, 2], sp_cams[:, 2], atol=1.0)


def test_cost_monotone_and_anchor_fixed():
    prob, intr, gt_cams, _, _ = build_problem(noise=0.5, seed=3)
    cfg = SLAMConfig(ba_iters=15)
    res = ba.run(prob, intr, cfg)
    # converged: this problem drops from ~4e5 to ~189 within 3 iterations;
    # once at the plateau further candidates are float-level ties, so the
    # accepted COUNT is noise — assert convergence, not accept cadence
    assert float(res.cost) < 1e-3 * float(res.initial_cost)
    # frozen anchor camera must not move
    np.testing.assert_array_equal(
        np.asarray(res.cams)[0], np.asarray(prob.cams)[0]
    )
    assert int(res.accepted) >= 2


def test_padding_rays_stay_zero():
    prob, intr, _, _, n_real = build_problem(noise=0.0)
    cfg = SLAMConfig(ba_iters=5)
    res = ba.run(prob, intr, cfg)
    pad = np.asarray(res.rays)[n_real:]
    np.testing.assert_array_equal(pad, np.zeros_like(pad))


def test_schur_equals_dense_solve():
    """The Schur-reduced dc must equal the full dense normal-equation solve."""
    prob, intr, _, _, n_real = build_problem(noise=0.5, seed=4, num_kf=4, num_rays_cap=60)
    cfg = SLAMConfig()
    fs = cfg.ba_focal_scale
    lam = jnp.asarray(1e-3, jnp.float32)
    u, g_c, v, g_r, w_blk = ba.normal_terms(prob.cams, prob.rays, prob, intr, fs)
    s, rhs = ba.schur_reduce(u, g_c, v, g_r, w_blk, prob.obs_cam, prob.cam_free, lam)
    dc = np.linalg.solve(np.asarray(s, np.float64), np.asarray(rhs, np.float64))

    # dense fp64 assembly from the same blocks
    k = prob.cams.shape[0]
    m = prob.rays.shape[0]
    nc, nr = 3 * k, 2 * m
    h = np.zeros((nc + nr, nc + nr))
    g = np.zeros(nc + nr)
    u64 = np.asarray(u, np.float64)
    v64 = np.asarray(v, np.float64)
    w64 = np.asarray(w_blk, np.float64)
    def damp_np(hb, l, eps=1e-8):
        return hb + l * np.diag(np.diag(hb)) + eps * np.eye(hb.shape[0])

    for i in range(k):
        h[3*i:3*i+3, 3*i:3*i+3] = damp_np(u64[i], float(lam))
    for j in range(m):
        h[nc+2*j:nc+2*j+2, nc+2*j:nc+2*j+2] = damp_np(v64[j], float(lam))
    oc = np.asarray(prob.obs_cam)
    for j in range(m):
        for c_ in range(oc.shape[1]):
            i = oc[j, c_]
            h[3*i:3*i+3, nc+2*j:nc+2*j+2] += w64[j, c_]
            h[nc+2*j:nc+2*j+2, 3*i:3*i+3] += w64[j, c_].T
    g[:nc] = -np.asarray(g_c, np.float64).reshape(-1)
    g[nc:] = -np.asarray(g_r, np.float64).reshape(-1)
    # frozen cams: identity rows/cols, zero rhs
    free = np.asarray(prob.cam_free)
    for i in range(k):
        if not free[i]:
            h[3*i:3*i+3, :] = 0; h[:, 3*i:3*i+3] = 0
            h[3*i:3*i+3, 3*i:3*i+3] = np.eye(3)
            g[3*i:3*i+3] = 0
    dense = np.linalg.solve(h, g)
    np.testing.assert_allclose(dc, dense[:nc], rtol=2e-3, atol=2e-5)


def test_fast_path_matches_block_formulation():
    """The component-wise fast path (ba._fast_terms) must reproduce the
    block-tensor reference formulation (normal_terms + schur_local) and the
    same back-substituted step."""
    import jax.numpy as jnp

    prob, intr, _, _, _ = build_problem(noise=0.5, seed=6, num_kf=5, num_rays_cap=80)
    cfg = SLAMConfig()
    fs = cfg.ba_focal_scale
    lam = jnp.asarray(3e-3, jnp.float32)
    k = prob.cams.shape[0]

    u_b, g_c_b, v_b, g_r_b, w_blk = ba.normal_terms(
        prob.cams, prob.rays, prob, intr, fs
    )
    s_corr_b, rhs_corr_b, v_inv = ba.schur_local(
        v_b, g_r_b, w_blk, prob.obs_cam, k, lam
    )

    pre = ba.precompute(prob)
    u_f, g_c_f, s_corr_f, rhs_corr_f, local = ba._fast_terms(
        prob.cams, prob.rays, lam, prob, pre, intr, fs
    )
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_b), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_c_f), np.asarray(g_c_b), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(s_corr_f), np.asarray(s_corr_b), rtol=1e-4, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(rhs_corr_f), np.asarray(rhs_corr_b), rtol=1e-4, atol=1e-2
    )

    s, rhs = ba.schur_assemble(u_b, g_c_b, s_corr_b, rhs_corr_b, prob.cam_free, lam)
    import jax as _jax

    chol = _jax.scipy.linalg.cho_factor(s, lower=True)
    dc = _jax.scipy.linalg.cho_solve(chol, rhs)
    dr_b = ba.back_substitute(v_inv, g_r_b, w_blk, prob.obs_cam, dc)
    dr_f = ba._fast_back_substitute(dc, pre, local)
    np.testing.assert_allclose(
        np.asarray(dr_f), np.asarray(dr_b), rtol=1e-4, atol=1e-5
    )

    # cost parity too
    c_b = float(ba.compute_cost(prob.cams, prob.rays, prob, intr))
    c_f = float(ba.fast_cost(prob.cams, prob.rays, prob, pre, intr))
    np.testing.assert_allclose(c_f, c_b, rtol=1e-5)
