"""Full online SLAM loop on synthetic sequences (SURVEY.md §6 item 2):
tracking with unknown association, keyframe insertion, map growth,
lost/recover via relocalization, and map BA."""

import numpy as np
import pytest

from ptzjax import synth
from ptzjax.config import SLAMConfig
from ptzjax.features import synth_features
from ptzjax.slam import PTZSlam

CFG = SLAMConfig(
    max_rays=96,
    max_keypoints=192,
    max_map_rays=1024,
    max_keyframes=16,
    kf_desc_dim=32,
    sigma_obs=0.7,
    min_inliers=10,
)


def make_seq(T=120, seed=5, pan_amp=0.28):
    seq = synth.make_sequence(
        num_frames=T, num_rays=2500, pan_amp=pan_amp, tilt_amp=0.03,
        f_amp=300.0, period=T * 1.4, seed=seed,
    )
    # narrower descriptors for test speed
    rng = np.random.default_rng(seed)
    desc = rng.normal(size=(2500, 32)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    return seq._replace(descriptors=desc)


def run_slam(seq, cfg=CFG, drop_frames=(), noise=0.5, desc_noise=0.05):
    slam = PTZSlam(cfg, seq.intr)
    feats0, _ = synth_features(
        seq, 0, cfg.max_keypoints, noise_px=noise, desc_noise=desc_noise
    )
    state = slam.init(feats0.xy, feats0.desc, feats0.valid, seq.cameras[0])
    infos = []
    for k in range(1, len(seq.cameras)):
        f, _ = synth_features(
            seq, k, cfg.max_keypoints, noise_px=noise, desc_noise=desc_noise
        )
        valid = f.valid & (k not in drop_frames)
        state, info = slam.process(state, f.xy, f.desc, valid)
        info["frame"] = k
        infos.append(info)
    return slam, state, infos


def pose_errors(seq, infos):
    rows = [(i["frame"], i["pose"]) for i in infos if i["event"] == "track"]
    idx = np.array([r[0] for r in rows])
    poses = np.stack([r[1] for r in rows])
    return np.abs(poses - seq.cameras[idx]), idx


@pytest.fixture(scope="module")
def slam_run():
    seq = make_seq()
    return seq, run_slam(seq)


def test_tracks_full_sequence(slam_run):
    seq, (slam, state, infos) = slam_run
    lost = [i for i in infos if i.get("lost")]
    assert not lost, f"lost at frames {[i['frame'] for i in lost]}"
    err, _ = pose_errors(seq, infos)
    assert err[:, 0].mean() < 1e-3, f"pan err {err[:, 0].mean()}"
    assert err[:, 1].mean() < 1e-3, f"tilt err {err[:, 1].mean()}"
    assert err[:, 2].mean() < 15.0, f"focal err {err[:, 2].mean()}"


def test_keyframes_inserted_and_map_grows(slam_run):
    seq, (slam, state, infos) = slam_run
    n_kf = int(state.kf.count)
    assert 2 <= n_kf <= CFG.max_keyframes
    assert int(state.rays.count) > 100
    # keyframe poses should be near GT at their frames
    kidx = np.asarray(state.kf.frame_idx)[:n_kf]
    kp = np.asarray(state.kf.poses)[:n_kf]
    err = np.abs(kp - seq.cameras[kidx])
    assert err[:, 0].max() < 3e-3


def test_ba_reduces_cost(slam_run):
    seq, (slam, state, infos) = slam_run
    state2, ba_info = slam.bundle_adjust(state)
    assert ba_info["ba_cost_after"] <= ba_info["ba_cost_before"] * 1.0 + 1e-6
    n_kf = int(state2.kf.count)
    kidx = np.asarray(state2.kf.frame_idx)[:n_kf]
    err = np.abs(np.asarray(state2.kf.poses)[:n_kf] - seq.cameras[kidx])
    assert err[:, 0].max() < 3e-3


def test_occlusion_lost_and_relocalize():
    seq = make_seq(T=80)
    drop = set(range(40, 47))
    slam, state, infos = run_slam(seq, drop_frames=drop)
    by_frame = {i["frame"]: i for i in infos}
    # must go lost during the blackout
    assert any(
        by_frame[k].get("lost") or by_frame[k]["event"] == "reloc"
        for k in range(40, 47)
    )
    # must be tracking again (not lost) before the end
    tail = [i for i in infos if i["frame"] >= 60]
    assert tail and all(i["event"] == "track" for i in tail)
    assert not any(i.get("lost") for i in tail)
    # and accurate again after recovery
    err, idx = pose_errors(seq, infos)
    late = err[idx >= 60]
    assert late[:, 0].mean() < 2e-3
    assert late[:, 2].mean() < 30.0


def test_reloc_reports_failure_on_garbage():
    seq = make_seq(T=30)
    slam, state, infos = run_slam(seq)
    # feed pure-garbage features to a manually lost state
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 1280, (CFG.max_keypoints, 2)).astype(np.float32)
    d = rng.normal(size=(CFG.max_keypoints, 32)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    import jax.numpy as jnp

    state = state._replace(lost=jnp.asarray(True))
    state2, info = slam.process(state, xy, d, np.ones(CFG.max_keypoints, bool))
    assert info["event"] == "reloc"
    # random descriptors may accidentally relocalize only with tiny inliers;
    # success with garbage must not be claimed
    assert not info["reloc_success"] or info["reloc_inliers"] < 2 * CFG.reloc_min_matches


def test_keyframe_reloc_mode_recovers():
    """BASELINE.md config 2: nearest-keyframe lookup + pose re-init."""
    seq = make_seq(T=80)
    cfg = CFG.replace(reloc_mode="keyframe")
    drop = set(range(40, 47))
    slam, state, infos = run_slam(seq, cfg=cfg, drop_frames=drop)
    by_frame = {i["frame"]: i for i in infos}
    assert any(
        by_frame[k].get("lost") or by_frame[k]["event"] == "reloc"
        for k in range(40, 47)
    )
    tail = [i for i in infos if i["frame"] >= 60]
    assert tail and all(i["event"] == "track" for i in tail)
    err, idx = pose_errors(seq, infos)
    late = err[idx >= 60]
    assert late[:, 0].mean() < 2e-3
    assert late[:, 2].mean() < 30.0


def test_apply_external_reloc_reinits():
    """Host-side reloc application (the native-forest integration path):
    a lost state + an external RelocResult must re-init and resume."""
    import jax.numpy as jnp

    from ptzjax.reloc import RelocResult

    # T=80 keeps the per-frame pan rate within the innovation gate after a
    # zero-velocity re-init (same regime as the in-graph reloc tests)
    seq = make_seq(T=80)
    slam, state, infos = run_slam(seq)
    state = state._replace(lost=jnp.asarray(True))
    k = 65
    f, _ = synth_features(seq, k, CFG.max_keypoints, noise_px=0.5, desc_noise=0.05)
    res = RelocResult(
        pose=jnp.asarray(seq.cameras[k]),
        inliers=jnp.asarray(int(f.valid.sum()), jnp.int32),
        success=jnp.asarray(True),
        matched_ray_ids=jnp.full((CFG.max_keypoints,), -1, jnp.int32),
        matched_ok=jnp.asarray(f.valid),
    )
    state2 = slam.apply_reloc_result(state, f.xy, f.desc, f.valid, res)
    assert not bool(state2.lost)
    assert int(state2.ekf.active.sum()) > 10
    # next frame must track
    f2, _ = synth_features(seq, k + 1, CFG.max_keypoints, noise_px=0.5, desc_noise=0.05)
    state3, info = slam.process(state2, f2.xy, f2.desc, f2.valid)
    assert info["event"] == "track" and not info["lost"]
    assert abs(info["pose"][0] - seq.cameras[k + 1][0]) < 2e-3
