"""OpenCV ingestion parity config (BASELINE.md config 1): cv2 SIFT features
through the same SLAM loop, trajectory-level check."""

import numpy as np
import pytest

from ptzjax import synth
from ptzjax.config import SLAMConfig
from ptzjax.frontend_cv2 import extract_features_cv2, has_cv2
from ptzjax.geometry import Intrinsics
from ptzjax.slam import PTZSlam

pytestmark = pytest.mark.skipif(not has_cv2(), reason="cv2 unavailable")

W, H = 640, 360


def test_cv2_features_shape_and_mask():
    rng = np.random.default_rng(0)
    img = rng.random((H, W)).astype(np.float32)
    cfg = SLAMConfig(max_keypoints=64, kf_desc_dim=128)
    f = extract_features_cv2(img, cfg)
    assert f.xy.shape == (64, 2) and f.desc.shape == (64, 128)
    n = np.linalg.norm(f.desc[f.valid], axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-4)

    mask = np.ones((H, W), bool)
    mask[:, : W // 2] = False
    fm = extract_features_cv2(img, cfg, mask=mask)
    assert (fm.xy[fm.valid, 0] >= W // 2 - 1).all()


def test_cv2_slam_tracks_rendered_sequence():
    frames = 30
    pano = synth.make_panorama(
        theta_range=(-0.5, 0.5), phi_range=(-0.3, 0.18),
        texels_per_rad=2200.0, seed=6,
    )
    cams = synth.make_trajectory(
        frames, pan_amp=0.08, tilt0=-0.04, tilt_amp=0.015,
        f0=1100.0, f_amp=40.0, period=frames * 1.8, seed=6,
    )
    intr = Intrinsics.create(W / 2.0, H / 2.0)
    cfg = SLAMConfig(
        image_width=W, image_height=H, max_keypoints=160, max_rays=96,
        max_map_rays=1024, max_keyframes=16, kf_desc_dim=128,
        sigma_obs=1.0, min_inliers=10,
    )
    feats = [
        extract_features_cv2(
            synth.render_image(pano, c, intr, W, H), cfg
        )
        for c in cams
    ]
    slam = PTZSlam(cfg, intr)
    state = slam.init(feats[0].xy, feats[0].desc, feats[0].valid, cams[0])
    import jax.numpy as jnp

    xy = jnp.stack([jnp.asarray(f.xy) for f in feats[1:]])
    desc = jnp.stack([jnp.asarray(f.desc) for f in feats[1:]])
    valid = jnp.stack([jnp.asarray(f.valid) for f in feats[1:]])
    state, infos = slam.run_segment(state, xy, desc, valid)
    pose = np.asarray(infos.pose)
    lost = np.asarray(infos.lost)
    assert not lost.any(), np.nonzero(lost)[0]
    pan_err = np.abs(pose[:, 0] - cams[1:, 0])
    assert pan_err.mean() < 3e-3, pan_err.mean()


def test_track_features_cv2_klt():
    """cv2 KLT frontend (calcOpticalFlowPyrLK + fb check + SIFT refill):
    tracked points must follow the true PTZ motion."""
    from ptzjax.frontend_cv2 import track_features_cv2

    pano = synth.make_panorama(
        theta_range=(-0.5, 0.5), phi_range=(-0.3, 0.18),
        texels_per_rad=2200.0, seed=6,
    )
    intr = Intrinsics.create(W / 2.0, H / 2.0)
    cam0 = np.array([0.02, -0.04, 1100.0], np.float32)
    cam1 = cam0 + np.array([0.004, -0.001, 3.0], np.float32)
    img0 = synth.render_image(pano, cam0, intr, W, H)
    img1 = synth.render_image(pano, cam1, intr, W, H)
    cfg = SLAMConfig(max_keypoints=256)
    f0 = extract_features_cv2(np.asarray(img0), cfg)
    assert f0.valid.sum() > 50
    xy, desc, valid, tracked = track_features_cv2(
        np.asarray(img0), np.asarray(img1), f0.xy, f0.desc, f0.valid, cfg
    )
    assert tracked.sum() > 0.5 * f0.valid.sum()
    # tracked displacement must match projecting through the new camera
    import jax.numpy as jnp

    from ptzjax.geometry import back_project_pixels, project_rays

    rows = np.flatnonzero(tracked)
    rays = back_project_pixels(jnp.asarray(cam0), jnp.asarray(f0.xy[rows]), intr)
    expect = np.asarray(project_rays(jnp.asarray(cam1), rays, intr))
    err = np.linalg.norm(expect - xy[rows], axis=-1)
    assert np.median(err) < 1.0, float(np.median(err))
