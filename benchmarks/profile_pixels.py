"""Per-stage breakdown of the from-pixels loop (VERDICT r2 item 3).

Times each stage of ``run_segment_pixels`` separately with the amortized
two-point-slope method (cancels the PJRT tunnel's constant ~30 ms
synchronous round-trip), at the exact bench_from_pixels config: 720p,
256 keypoints, zoom-normalized descriptors. Prints one JSON line per stage
and a summary table; the RESULTS.md 'from-pixels breakdown' section is
generated from this.

Usage: python benchmarks/profile_pixels.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", nargs=2, type=int, default=[128, 256],
                    metavar=("MAX_RAYS", "MAX_KP"))
    ap.add_argument("--map-caps", nargs=2, type=int, default=[2048, 32],
                    metavar=("MAX_MAP_RAYS", "MAX_KF"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.bench_suite import _sync_tunnel, _timeit_sync
    from ptzjax import synth
    from ptzjax.config import SLAMConfig
    from ptzjax.frontend import extract_features
    from ptzjax.geometry import Intrinsics
    from ptzjax.kernels.descriptor import describe_keypoints
    from ptzjax.kernels.detect import detect_keypoints
    from ptzjax.kernels.detect_pallas import harris_nms_pallas
    from ptzjax.slam import PTZSlam, _frame_step

    w, h = 1280, 720
    cfg = SLAMConfig(
        image_width=w, image_height=h, max_rays=args.caps[0],
        max_keypoints=args.caps[1], max_map_rays=args.map_caps[0],
        max_keyframes=args.map_caps[1], kf_desc_dim=128, sigma_obs=1.0,
        descriptor_f_ref=2000.0,
    )
    intr = Intrinsics.create(w / 2.0, h / 2.0)
    use_pallas = jax.default_backend() == "tpu"

    pano = synth.make_panorama(seed=0)
    cams = synth.make_trajectory(
        24, pan_amp=0.12, tilt0=-0.05, tilt_amp=0.02,
        f0=2000.0, f_amp=250.0, period=40.0, seed=0,
    )
    imgs = jnp.asarray(
        np.stack(
            [synth.render_image(pano, c, intr, w, h) for c in cams]
        ).astype(np.float32)
    )

    slam = PTZSlam(cfg, intr)
    f0 = extract_features(
        imgs[0], cfg, use_pallas=use_pallas, focal=jnp.asarray(cams[0][2])
    )
    state = slam.init(*f0, cams[0])

    # feature tables for the slam-step-only stage
    feats = jax.jit(
        lambda xs: jax.lax.map(
            lambda im: extract_features(
                im, cfg, use_pallas=use_pallas, focal=jnp.asarray(2000.0)
            ),
            xs,
        )
    )(imgs)
    jax.block_until_ready(feats)
    xy_all, desc_all, valid_all = feats

    _sync_tunnel()

    def slope_ms(make, n_small=8, n_big=64, retries=2):
        t_start = time.perf_counter()
        for attempt in range(retries + 1):
            f_s, a_s = make(n_small)
            f_b, a_b = make(n_big)
            t_s = _timeit_sync(f_s, *a_s)
            t_b = _timeit_sync(f_b, *a_b)
            slope = t_b - t_s
            if slope > 0:
                print(
                    f"  [stage done in {time.perf_counter() - t_start:.1f}s "
                    f"incl compile; n={n_small}/{n_big} t_s={t_s:.2f} "
                    f"t_b={t_b:.2f}]",
                    file=sys.stderr, flush=True,
                )
                return slope / (n_big - n_small)
            n_big *= 4  # widen the spread until the work beats timer noise
        raise RuntimeError(
            f"non-positive slope even at n_big={n_big} "
            f"(t_s={t_s:.3f}, t_b={t_b:.3f})"
        )

    def frames_arg(n):
        reps = (n + imgs.shape[0] - 1) // imgs.shape[0]
        return jnp.tile(imgs, (reps, 1, 1))[:n]

    stages = {}

    # 1. fused harris+nms pass
    def mk_harris(n):
        return (
            jax.jit(lambda xs: jax.lax.map(harris_nms_pallas, xs)),
            (frames_arg(n),),
        )

    stages["harris_nms"] = slope_ms(mk_harris)

    # 2. full detector (harris + mask/border + top_k + subpixel)
    def mk_detect(n):
        return (
            jax.jit(
                lambda xs: jax.lax.map(
                    lambda im: detect_keypoints(
                        im, max_keypoints=cfg.max_keypoints,
                        threshold=cfg.detector_threshold,
                        use_pallas=use_pallas,
                    ).xy,
                    xs,
                )
            ),
            (frames_arg(n),),
        )

    stages["detect_total"] = slope_ms(mk_detect)

    # 3. descriptors, fixed spacing (scale=None -> 18x18 windows)
    kp = detect_keypoints(
        imgs[1], max_keypoints=cfg.max_keypoints,
        threshold=cfg.detector_threshold, use_pallas=use_pallas,
    )

    def mk_desc_fixed(n):
        return (
            jax.jit(
                lambda xs: jax.lax.map(
                    lambda im: describe_keypoints(
                        im, kp.xy, kp.valid, use_pallas=use_pallas
                    ), xs
                )
            ),
            (frames_arg(n),),
        )

    stages["describe_fixed"] = slope_ms(mk_desc_fixed)

    # 4. descriptors, zoom-normalized (traced scale -> 46x46 windows)
    def mk_desc_scaled(n):
        return (
            jax.jit(
                lambda xs: jax.lax.map(
                    lambda im: describe_keypoints(
                        im, kp.xy, kp.valid, scale=jnp.asarray(1.05),
                        use_pallas=use_pallas,
                    ),
                    xs,
                )
            ),
            (frames_arg(n),),
        )

    stages["describe_scaled"] = slope_ms(mk_desc_scaled)

    # 5. whole frontend
    def mk_frontend(n):
        return (
            jax.jit(
                lambda xs: jax.lax.map(
                    lambda im: extract_features(
                        im, cfg, use_pallas=use_pallas,
                        focal=jnp.asarray(2000.0),
                    )[1],
                    xs,
                )
            ),
            (frames_arg(n),),
        )

    stages["frontend_total"] = slope_ms(mk_frontend)

    # 6. SLAM step from feature tables (match + EKF + lifecycle + keyframes)
    def mk_slam(n):
        reps = (n + xy_all.shape[0] - 1) // xy_all.shape[0]
        xs = (
            jnp.tile(xy_all, (reps, 1, 1))[:n],
            jnp.tile(desc_all, (reps, 1, 1))[:n],
            jnp.tile(valid_all, (reps, 1))[:n],
            jnp.ones((n,), bool),
        )
        return (
            jax.jit(
                lambda s, xy, dc, vl, ok: slam._segment(s, xy, dc, vl, ok)[
                    0
                ].ekf.cam
            ),
            (state, *xs),
        )

    stages["slam_step"] = slope_ms(mk_slam)

    # 7. full from-pixels step (= frontend + slam step in one scan)
    def mk_full(n):
        xs = frames_arg(n)

        def run(s, frames):
            out = slam.run_segment_pixels(s, frames, use_pallas=use_pallas)
            return out[0].ekf.cam

        return run, (state, xs)

    stages["from_pixels_total"] = slope_ms(mk_full)

    for k, v in stages.items():
        print(json.dumps({"stage": k, "ms_per_frame": round(v, 4)}))
    total = stages["from_pixels_total"]
    print(f"\nper-frame breakdown @720p/256kp ({jax.default_backend()}):")
    for k, v in stages.items():
        print(f"  {k:>18}: {v:8.4f} ms  ({v / total:6.1%} of full step)")
    print(f"  implied fps: {1e3 / total:.1f}")


if __name__ == "__main__":
    main()
