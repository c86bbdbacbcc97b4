"""Headline benchmark: online from-pixels SLAM throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches BASELINE.json config 4 ("Online SLAM loop: Pallas
detect+match, map expansion, keyframe insertion at broadcast frame-rate on
1 chip") — and, unlike round 1's bench, the clock now covers the WHOLE
pipeline from raw 720p pixels: Pallas Harris+NMS detection, upright-SIFT
description (zoom-normalized by the live focal estimate), gated matching,
the joint camera x 128-ray EKF update, slot/map lifecycle, keyframe policy
with in-graph windowed BA, and the reloc branch — one scanned device
program per chunk (ptzjax.slam.run_segment_pixels).

Timing methodology (load-bearing on this environment's PJRT tunnel): before
any device->host readback the tunnel runs LAZILY — dispatches are acked
without executing, so wall-clock without a readback measures queueing, not
compute. The bench therefore does one tiny readback first (flips the tunnel
synchronous) and then times segment + result readback, best of several
reps. Cross-checked against the device profiler's module time (within ~25%).

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
    from ptzjax.frontend import extract_features
    from ptzjax.geometry import Intrinsics
    from ptzjax.slam import PTZSlam

    w, h = 1280, 720
    frames = 120
    cfg = SLAMConfig(
        image_width=w,
        image_height=h,
        max_rays=128,
        max_keypoints=256,
        max_map_rays=2048,
        max_keyframes=32,
        kf_desc_dim=128,
        sigma_obs=1.0,
        descriptor_f_ref=2000.0,
    )
    intr = Intrinsics.create(w / 2.0, h / 2.0)
    pano = synth.make_panorama(seed=0)
    cams = synth.make_trajectory(
        frames, pan_amp=0.12, tilt0=-0.05, tilt_amp=0.02,
        f0=2000.0, f_amp=250.0, period=frames * 1.6, seed=0,
    )
    imgs = np.stack(
        [synth.render_image(pano, c, intr, w, h) for c in cams]
    ).astype(np.float32)

    use_pallas = jax.default_backend() == "tpu"
    slam = PTZSlam(cfg, intr)
    f0 = extract_features(
        jnp.asarray(imgs[0]), cfg, use_pallas=use_pallas,
        focal=jnp.asarray(cams[0][2]),
    )
    state = slam.init(*f0, cams[0])
    imgs_d = jnp.asarray(imgs[1:])

    # warm-up / compile (both chunk shapes)
    half = (frames - 1) // 2
    s2, infos = slam.run_segment_pixels(state, imgs_d, use_pallas=use_pallas)
    s3, _ = slam.run_segment_pixels(
        state, imgs_d[:half], use_pallas=use_pallas
    )
    jax.block_until_ready((s2, s3))
    # flip the tunnel into synchronous mode (see module docstring): without
    # this, timings measure queue acks, not execution
    _ = float(s2.frame_idx)

    # timed runs: readback INSIDE the clock forces real completion. The
    # TWO-POINT CHUNK SLOPE (full chunk minus half chunk, best of reps)
    # cancels the tunnel's constant ~25 ms synchronous round-trip — a
    # harness artifact, not compute — while keeping every steady per-frame
    # cost (keyframe inserts + windowed BA at their natural rate); the
    # bootstrap transient of the first half drops out. Cross-checked
    # against benchmarks/profile_pixels.py's independent per-stage slopes.
    reps = 5

    def run_once(x):
        t0 = time.perf_counter()
        s, _ = slam.run_segment_pixels(state, x, use_pallas=use_pallas)
        _ = float(s.ekf.cam[0])
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(reps):
        t_full = run_once(imgs_d)
        t_half = run_once(imgs_d[:half])
        if t_full > t_half:
            best = min(best, t_full - t_half)
    if not np.isfinite(best):
        print("BENCH INVALID: non-positive chunk slope", file=sys.stderr)
        sys.exit(1)
    fps = (frames - 1 - half) / best

    # sanity: the run must actually track (from real pixels)
    hh = jax.device_get(infos)
    err = np.abs(np.asarray(hh.pose) - cams[1:])
    ok = (not hh.lost.any()) and err[:, 0].mean() < 3e-3
    if not ok:
        print(
            f"BENCH INVALID: lost={int(hh.lost.sum())} pan_err={err[:, 0].mean()}",
            file=sys.stderr,
        )
        sys.exit(1)

    print(
        json.dumps(
            {
                "metric": "online_slam_from_pixels_fps_1chip",
                "value": round(fps, 1),
                "unit": "frames/s, two-point chunk slope (720p, full "
                        "pipeline incl. Pallas frontend; r1-r4 rounds "
                        "timed a single chunk, which folded the tunnel's "
                        "constant ~25 ms round-trip into the number)",
                "vs_baseline": round(fps / 30.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
