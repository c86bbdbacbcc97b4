"""Court-model synthesis: 3D world points -> rays through the base-rotation
camera model, and the full SLAM loop on the resulting sequence (parity with
the reference's ``synthesized/`` court experiments — SURVEY.md §3, §8.1)."""

import jax.numpy as jnp
import numpy as np

from ptzjax import synth
from ptzjax.config import SLAMConfig
from ptzjax.features import synth_features
from ptzjax.geometry import Intrinsics, project_rays, rays_from_points
from ptzjax.slam import PTZSlam


def test_look_at_rotation_orthonormal_and_forward():
    rb = synth.look_at_base_rotation((14.3, -18.0, 7.0), (14.3, 9.0, 0.0))
    np.testing.assert_allclose(rb @ rb.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(rb) > 0.99
    # the look target maps to the optical axis: theta = phi = 0
    d = rb @ (np.array([14.3, 9.0, 0.0]) - np.array([14.3, -18.0, 7.0]))
    assert abs(np.arctan2(d[0], d[2])) < 1e-6
    assert abs(np.arctan2(-d[1], np.hypot(d[0], d[2]))) < 1e-6


def test_rays_from_points_matches_numpy_path():
    """geometry.rays_from_points (device path) must agree with the synth
    generator's host-side conversion for the same court scene."""
    seq, points = synth.make_court_sequence(num_frames=2, seed=3)
    dev = np.asarray(rays_from_points(jnp.asarray(points), seq.intr))
    np.testing.assert_allclose(dev, seq.rays, atol=2e-5)


def test_court_points_project_like_their_rays():
    """Projecting a 3D court point (point -> ray -> pixel) equals projecting
    its precomputed ray: the 3D path is consistent with the SLAM-native
    2-DoF parameterization."""
    seq, points = synth.make_court_sequence(num_frames=5, seed=1)
    cam = jnp.asarray(seq.cameras[2])
    rays_dev = rays_from_points(jnp.asarray(points), seq.intr)
    pix_a = np.asarray(project_rays(cam, rays_dev, seq.intr))
    pix_b = np.asarray(project_rays(cam, jnp.asarray(seq.rays), seq.intr))
    in_view = (
        (np.abs(seq.rays[:, 0] - seq.cameras[2, 0]) < 0.6)
        & (np.abs(seq.rays[:, 1] - seq.cameras[2, 1]) < 0.6)
    )
    assert np.abs(pix_a - pix_b)[in_view].max() < 0.15


def test_slam_tracks_court_sequence():
    """Full online loop on the court model: EKF + keyframes + map recover
    the GT trajectory from noisy court-point observations."""
    frames = 60
    seq, _ = synth.make_court_sequence(
        num_frames=frames, f0=1800.0, f_amp=150.0, period=frames * 1.5, seed=0,
    )
    cfg = SLAMConfig(
        max_rays=128, max_keypoints=256, max_map_rays=2048, max_keyframes=16,
        kf_desc_dim=128, sigma_obs=0.7,
    )
    feats = [
        synth_features(seq, k, cfg.max_keypoints, noise_px=0.5, seed=0)[0]
        for k in range(frames)
    ]
    intr = seq.intr
    slam = PTZSlam(cfg, intr)
    state = slam.init(feats[0].xy, feats[0].desc, feats[0].valid, seq.cameras[0])
    xy = jnp.asarray(np.stack([f.xy for f in feats[1:]]))
    desc = jnp.asarray(np.stack([f.desc for f in feats[1:]]))
    valid = jnp.asarray(np.stack([f.valid for f in feats[1:]]))
    state, infos = slam.run_segment(state, xy, desc, valid)

    pose = np.asarray(infos.pose)
    lost = np.asarray(infos.lost)
    assert not lost.any(), f"lost at {np.nonzero(lost)[0]}"
    pan_err = np.abs(pose[:, 0] - seq.cameras[1:, 0])
    tilt_err = np.abs(pose[:, 1] - seq.cameras[1:, 1])
    f_err = np.abs(pose[:, 2] - seq.cameras[1:, 2])
    assert pan_err.mean() < 1.5e-3, pan_err.mean()
    assert tilt_err.mean() < 1.5e-3, tilt_err.mean()
    assert f_err.mean() < 20.0, f_err.mean()
