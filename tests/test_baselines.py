"""Homography-EKF baseline (reference deprecated/ tracker): it must track
short horizons but drift over long ones — the paper's comparison that
motivates keyframes + BA (SURVEY.md §9)."""

import numpy as np

from ptzjax import synth
from ptzjax.baselines import init_vo, track_homography_ekf
from ptzjax.config import SLAMConfig
from ptzjax.features import synth_features

CFG = SLAMConfig(
    max_rays=96,
    max_keypoints=192,
    max_map_rays=1024,
    max_keyframes=16,
    kf_desc_dim=32,
    sigma_obs=0.7,
    min_inliers=10,
)


def make_features(T=150, seed=5, noise=0.5, desc_noise=0.05):
    seq = synth.make_sequence(
        num_frames=T, num_rays=2500, pan_amp=0.28, tilt_amp=0.03,
        f_amp=300.0, period=T * 1.4, seed=seed,
    )
    rng = np.random.default_rng(seed)
    desc = rng.normal(size=(2500, 32)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    seq = seq._replace(descriptors=desc)
    feats = [
        synth_features(seq, k, CFG.max_keypoints, noise_px=noise,
                       desc_noise=desc_noise)[0]
        for k in range(T)
    ]
    xy = np.stack([f.xy for f in feats])
    desc = np.stack([f.desc for f in feats])
    valid = np.stack([f.valid for f in feats])
    return seq, xy, desc, valid


def run_baseline(seq, xy, desc, valid):
    state = init_vo(seq.cameras[0], xy[0], desc[0], valid[0], CFG)
    state, infos = track_homography_ekf(
        state, xy[1:], desc[1:], valid[1:], intr=seq.intr, cfg=CFG
    )
    return np.asarray(infos.pose), np.asarray(infos.num_inliers)


def test_baseline_tracks_short_horizon():
    seq, xy, desc, valid = make_features(T=40)
    pose, n_inl = run_baseline(seq, xy, desc, valid)
    assert (n_inl[:10] > CFG.min_inliers).all()
    err = np.abs(pose - seq.cameras[1:])
    # short-horizon accuracy: within a few milliradians
    assert err[:20, 0].mean() < 5e-3
    assert err[:20, 2].mean() < 60.0


def test_slam_beats_homography_baseline():
    """The paper's central comparison: the full keyframe+map system must
    hold a bound the frame-to-frame baseline cannot (drift integrates)."""
    from ptzjax.slam import PTZSlam

    # long sequence + realistic pixel noise: drift needs room to integrate
    seq, xy, desc, valid = make_features(T=300, noise=1.5)
    base_pose, _ = run_baseline(seq, xy, desc, valid)
    base_err = np.abs(base_pose - seq.cameras[1:])

    slam = PTZSlam(CFG, seq.intr)
    state = slam.init(xy[0], desc[0], valid[0], seq.cameras[0])
    state, infos = slam.run_segment(state, xy[1:], desc[1:], valid[1:])
    slam_pose = np.asarray(infos.pose)
    slam_err = np.abs(slam_pose - seq.cameras[1:])
    assert not np.asarray(infos.lost).any()

    # the baseline stays sane (it is a working tracker, not a strawman) ...
    assert np.isfinite(base_pose).all()
    assert base_err[:, 0].mean() < 0.05
    # ... but drift integrates: late error dwarfs early error ...
    late, early = base_err[250:, 0].mean(), base_err[:30, 0].mean()
    assert late > 5.0 * early, (early, late)
    # ... while the full keyframe+map system stays bounded: >=3x better on
    # the whole run and >=5x better on the late window
    assert slam_err[:, 0].mean() < base_err[:, 0].mean() / 3.0, (
        slam_err[:, 0].mean(), base_err[:, 0].mean(),
    )
    assert slam_err[250:, 0].mean() < late / 5.0, (slam_err[250:, 0].mean(), late)
