"""Headline benchmark: online SLAM loop throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches BASELINE.json config 4 ("Online SLAM loop ... at broadcast
frame-rate on 1 chip"): full per-frame pipeline — gated descriptor matching,
joint (camera x 128-ray) EKF update, slot lifecycle, keyframe policy,
reloc branch — in segment (lax.scan) mode on a synthetic broadcast sequence.

Timing methodology (load-bearing on this environment's PJRT tunnel): before
any device->host readback the tunnel runs LAZILY — dispatches are acked
without executing, so wall-clock without a readback measures queueing, not
compute (chained 8k matmuls "finish" in microseconds). The bench therefore
does one tiny readback first (flips the tunnel synchronous) and then times
segment + result readback, best of several reps. Cross-checked against the
device profiler's module time (within ~25%).

vs_baseline: the reference implementation is offline-speed Python with no
published throughput (BASELINE.md: published == {}; reference mount empty),
so the ratio is against the 30 fps broadcast real-time bar that defines the
north star's "online ... at broadcast frame-rate". vs_baseline = fps / 30.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    # persistent XLA compile cache: first run pays ~90s of compiles, reruns
    # start in seconds (the driver invokes this file fresh every round)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ptzjax import synth
    from ptzjax.config import SLAMConfig
    from ptzjax.features import synth_features
    from ptzjax.slam import PTZSlam

    cfg = SLAMConfig(
        max_rays=128,
        max_keypoints=256,
        max_map_rays=2048,
        max_keyframes=32,
        kf_desc_dim=128,
        sigma_obs=0.7,
    )
    frames = 240
    seq = synth.make_sequence(
        num_frames=frames, num_rays=2500, pan_amp=0.28, tilt_amp=0.03,
        f_amp=300.0, period=frames * 1.4, seed=5,
    )
    feats = [
        synth_features(seq, k, cfg.max_keypoints, noise_px=0.5, desc_noise=0.05)[0]
        for k in range(frames)
    ]
    xy = jnp.asarray(np.stack([f.xy for f in feats]))
    desc = jnp.asarray(np.stack([f.desc for f in feats]))
    valid = jnp.asarray(np.stack([f.valid for f in feats]))

    slam = PTZSlam(cfg, seq.intr)
    state = slam.init(feats[0].xy, feats[0].desc, feats[0].valid, seq.cameras[0])

    # warm-up / compile
    s2, infos = slam.run_segment(state, xy[1:], desc[1:], valid[1:])
    jax.block_until_ready(s2)
    # flip the tunnel into synchronous mode (see module docstring): without
    # this, timings measure queue acks, not execution
    _ = float(s2.frame_idx)

    # timed runs: readback INSIDE the clock forces real completion
    reps = 5
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s2, infos = slam.run_segment(state, xy[1:], desc[1:], valid[1:])
        _ = float(s2.ekf.cam[0])
        best = min(best, time.perf_counter() - t0)
    fps = (frames - 1) / best

    # sanity: the run must actually track
    h = jax.device_get(infos)
    err = np.abs(np.asarray(h.pose) - seq.cameras[1:])
    ok = (not h.lost.any()) and err[:, 0].mean() < 1e-3
    if not ok:
        print(
            f"BENCH INVALID: lost={int(h.lost.sum())} pan_err={err[:, 0].mean()}",
            file=sys.stderr,
        )
        sys.exit(1)

    print(
        json.dumps(
            {
                "metric": "online_slam_fps_1chip",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
