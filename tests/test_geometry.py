"""Geometry golden tests (SURVEY.md §6 item 1): round trips, closed-form
Jacobians vs jax.jacfwd and vs fp64 finite differences, oracle parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptzjax import geometry
from tests.oracle import geometry_np

CX, CY = 640.0, 360.0


def make_intr():
    return geometry.Intrinsics.create(CX, CY)


def random_problem(rng, n=64):
    camera = np.array(
        [rng.uniform(-0.5, 0.5), rng.uniform(-0.3, 0.3), rng.uniform(1500, 4000)]
    )
    # rays near the camera direction so tan stays tame
    rays = np.stack(
        [
            camera[0] + rng.uniform(-0.25, 0.25, n),
            camera[1] + rng.uniform(-0.15, 0.15, n),
        ],
        axis=-1,
    )
    return camera, rays


def test_project_matches_oracle(rng):
    camera, rays = random_problem(rng)
    intr = make_intr()
    ours = geometry.project_rays(
        jnp.asarray(camera, jnp.float32), jnp.asarray(rays, jnp.float32), intr
    )
    ref = geometry_np.project(camera, rays, CX, CY)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=2e-2)


def test_back_project_matches_oracle(rng):
    camera, rays = random_problem(rng)
    intr = make_intr()
    pixels = geometry_np.project(camera, rays, CX, CY)
    ours = geometry.back_project_pixels(
        jnp.asarray(camera, jnp.float32), jnp.asarray(pixels, jnp.float32), intr
    )
    ref = geometry_np.back_project(camera, pixels, CX, CY)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_roundtrip(rng):
    camera, rays = random_problem(rng)
    intr = make_intr()
    cam = jnp.asarray(camera, jnp.float32)
    r = jnp.asarray(rays, jnp.float32)
    pix = geometry.project_rays(cam, r, intr)
    back = geometry.back_project_pixels(cam, pix, intr)
    np.testing.assert_allclose(np.asarray(back), rays, atol=5e-5)
    # and pixel-side round trip
    pix2 = geometry.project_rays(cam, back, intr)
    np.testing.assert_allclose(np.asarray(pix2), np.asarray(pix), atol=0.05)


def test_jacobians_vs_autodiff(rng):
    camera, rays = random_problem(rng, n=16)
    intr = make_intr()
    cam = jnp.asarray(camera, jnp.float32)
    r = jnp.asarray(rays, jnp.float32)
    pix, j_cam, j_ray = geometry.project_jacobians(cam, r, intr)

    pix_direct = geometry.project_rays(cam, r, intr)
    np.testing.assert_allclose(np.asarray(pix), np.asarray(pix_direct), atol=1e-3)

    jac_cam_ad = jax.jacfwd(lambda c: geometry.project_rays(c, r, intr))(cam)
    np.testing.assert_allclose(
        np.asarray(j_cam), np.asarray(jac_cam_ad), rtol=2e-3, atol=2e-2
    )

    jac_ray_ad = jax.jacfwd(lambda rr: geometry.project_rays(cam, rr, intr))(r)
    # jacfwd gives (N,2,N,2); extract the block-diagonal
    jr = np.asarray(jac_ray_ad)[np.arange(16), :, np.arange(16), :]
    np.testing.assert_allclose(np.asarray(j_ray), jr, rtol=2e-3, atol=2e-2)


def test_jacobians_vs_finite_difference(rng):
    camera, rays = random_problem(rng, n=8)
    intr = make_intr()
    _, j_cam, j_ray = geometry.project_jacobians(
        jnp.asarray(camera, jnp.float32), jnp.asarray(rays, jnp.float32), intr
    )
    for i in range(8):
        jc_fd, jr_fd = geometry_np.jacobian_fd(camera, rays[i], CX, CY)
        np.testing.assert_allclose(np.asarray(j_cam)[i], jc_fd, rtol=1e-2, atol=0.5)
        np.testing.assert_allclose(np.asarray(j_ray)[i], jr_fd, rtol=1e-2, atol=0.5)


def test_ray_camera_jacobian_identity(rng):
    """SURVEY.md §8.2: d/d(theta,phi) == -d/d(pan,tilt)."""
    camera, rays = random_problem(rng)
    intr = make_intr()
    _, j_cam, j_ray = geometry.project_jacobians(
        jnp.asarray(camera, jnp.float32), jnp.asarray(rays, jnp.float32), intr
    )
    np.testing.assert_allclose(
        np.asarray(j_ray), -np.asarray(j_cam)[..., :2], atol=0
    )


def test_rays_from_points_matches_oracle(rng):
    center = np.array([0.0, -10.0, 5.0])
    # a random (proper) rotation
    q = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    points = rng.uniform(-30, 30, (32, 3))
    intr = geometry.Intrinsics.create(CX, CY, center=center, base_rotation=q)
    ours = geometry.rays_from_points(jnp.asarray(points, jnp.float32), intr)
    ref = geometry_np.rays_from_points(points, center, q)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_in_view_mask(rng):
    camera, rays = random_problem(rng)
    intr = make_intr()
    cam = jnp.asarray(camera, jnp.float32)
    mask = geometry.in_view_mask(
        cam, jnp.asarray(rays, jnp.float32), intr, 1280.0, 720.0
    )
    pix = geometry_np.project(camera, rays, CX, CY)
    inside = (
        (pix[:, 0] >= 0) & (pix[:, 0] < 1280) & (pix[:, 1] >= 0) & (pix[:, 1] < 720)
    )
    assert np.mean(np.asarray(mask) == inside) > 0.98  # fp32 edge pixels may differ


def test_masked_lanes_stay_finite():
    """Rays far outside the view must not poison masked computations."""
    intr = make_intr()
    cam = jnp.array([0.0, 0.0, 2000.0], jnp.float32)
    rays = jnp.array([[3.0, 0.0], [0.0, -3.0], [np.pi, np.pi / 2]], jnp.float32)
    pix, j_cam, j_ray = geometry.project_jacobians(cam, rays, intr)
    assert np.all(np.isfinite(np.asarray(pix)))
    assert np.all(np.isfinite(np.asarray(j_cam)))
    assert np.all(np.isfinite(np.asarray(j_ray)))


def test_jit_and_vmap():
    intr = make_intr()
    cams = jnp.stack(
        [jnp.array([0.1 * i, 0.02 * i, 2000.0 + 10 * i]) for i in range(4)]
    )
    rays = jnp.zeros((4, 16, 2)) + jnp.array([0.05, 0.02])
    f = jax.jit(jax.vmap(lambda c, r: geometry.project_rays(c, r, intr)))
    out = f(cams, rays)
    assert out.shape == (4, 16, 2)
    assert np.all(np.isfinite(np.asarray(out)))
