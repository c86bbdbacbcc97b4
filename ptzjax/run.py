"""Experiment runner CLI: ``python -m ptzjax.run``.

The engine's counterpart to the reference's per-dataset driver scripts
(SURVEY.md §2 layer 8, §4.5): run the online SLAM loop over a sequence,
optionally bundle-adjust at the end, and emit the §7 observability
artifacts — per-frame JSONL, an eval-summary JSON against ground truth,
and a final trajectory .npz.

Modes:
  --synthetic          keypoint-oracle sequence (no images; EKF/map/BA path)
  --synthetic-court    court-model oracle: landmarks from 3D basketball-court
                       geometry via the base-rotation camera (the reference's
                       synthesized/ experiments)
  --synthetic-images   panorama-rendered video through the vision kernels
  --annotation/--images  dataset mode (.mat/.npz annotations + frames)

Example:
  python -m ptzjax.run --synthetic --frames 240 --out /tmp/run1
  python -m ptzjax.run --annotation seq.mat --images frames/ --out /tmp/run2
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _parse() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="ptzjax SLAM experiment runner")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-court", action="store_true")
    p.add_argument("--synthetic-images", action="store_true")
    p.add_argument("--annotation", type=str, default=None)
    p.add_argument("--images", type=str, default=None)
    p.add_argument("--frames", type=int, default=240)
    p.add_argument("--config", type=str, default=None, help="SLAMConfig JSON")
    p.add_argument("--out", type=str, required=True, help="output directory")
    p.add_argument("--ba", action="store_true", help="final bundle adjustment")
    p.add_argument(
        "--klt", action="store_true",
        help="image modes: carry keypoints between frames with pyramidal LK "
             "optical flow (detect only to refill) instead of re-detecting "
             "every frame — the reference's optical_flow_matching mode",
    )
    p.add_argument(
        "--reloc", type=str, default="map",
        choices=["map", "keyframe", "forest"],
        help="relocalization backend: 'map' matches the global ray store, "
             "'keyframe' does the reference's nearest-keyframe lookup, "
             "'forest' uses the native C++ BTDTR regressor trained online "
             "from keyframes (the reference's rf_map variant)",
    )
    p.add_argument(
        "--frontend", type=str, default="tpu", choices=["tpu", "cv2"],
        help="image modes: 'tpu' = the on-device Harris/SIFT/LK kernels; "
             "'cv2' = OpenCV SIFT + calcOpticalFlowPyrLK ingestion (the "
             "reference's own vision layer — BASELINE.md config 1)",
    )
    p.add_argument(
        "--tracker", type=str, default="slam", choices=["slam", "homography"],
        help="'slam' = the full keyframe+map system; 'homography' = the "
             "frame-to-frame homography-EKF baseline (the reference's "
             "deprecated/ tracker, the paper's drift comparison)",
    )
    p.add_argument(
        "--plot", action="store_true",
        help="write trajectory/error curves (trajectory.png) — the "
             "reference's matplotlib eval plots",
    )
    p.add_argument(
        "--chunk", type=int, default=64,
        help="frames per on-device lax.scan segment; per-frame info is "
             "pulled once per chunk (device->host transfers degrade "
             "dispatch latency on tunneled TPU backends)",
    )
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument(
        "--platform", type=str, default=None,
        help="force a jax platform (e.g. cpu); default is the environment's",
    )
    return p.parse_args()


def main() -> None:
    args = _parse()
    os.makedirs(args.out, exist_ok=True)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from ptzjax import checkpoint as ckpt
    from ptzjax import eval as evallib
    from ptzjax import io as iolib
    from ptzjax import synth
    from ptzjax.config import SLAMConfig
    from ptzjax.geometry import Intrinsics
    from ptzjax.slam import PTZSlam, infos_to_dicts

    cfg = SLAMConfig()
    if args.config:
        cfg = SLAMConfig.from_json(open(args.config).read())
    cfg = cfg.replace(
        image_width=args.width, image_height=args.height, reloc_mode=args.reloc
    )

    # --- assemble (features, gt, intr) per mode -----------------------------
    gt = None
    if args.synthetic_court:
        from ptzjax.features import synth_features

        seq, _points = synth.make_court_sequence(
            num_frames=args.frames, width=args.width, height=args.height,
            f0=1800.0, f_amp=150.0, period=args.frames * 1.5, seed=args.seed,
        )
        feats = [
            synth_features(seq, k, cfg.max_keypoints, seed=args.seed)[0]
            for k in range(args.frames)
        ]
        feats = [(f.xy, f.desc, f.valid) for f in feats]
        gt = seq.cameras
        intr = seq.intr
    elif args.synthetic:
        seq = synth.make_sequence(
            num_frames=args.frames, num_rays=2500,
            width=args.width, height=args.height, seed=args.seed,
        )
        rng = np.random.default_rng(args.seed)
        desc = rng.normal(size=(2500, cfg.kf_desc_dim)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        seq = seq._replace(descriptors=desc)
        from ptzjax.features import synth_features

        feats = [
            synth_features(seq, k, cfg.max_keypoints, seed=args.seed)[0]
            for k in range(args.frames)
        ]
        feats = [(f.xy, f.desc, f.valid) for f in feats]
        gt = seq.cameras
        intr = Intrinsics.create(float(seq.intr.cx), float(seq.intr.cy))
    elif args.synthetic_images:
        extract, track = _make_frontend(args, cfg)
        intr = Intrinsics.create(args.width / 2.0, args.height / 2.0)
        pano = synth.make_panorama(seed=args.seed)
        gt = synth.make_trajectory(args.frames, seed=args.seed)
        feats = []
        prev_img = None
        for c in gt:
            img = synth.render_image(pano, c, intr, args.width, args.height)
            if args.klt and prev_img is not None:
                feats.append(track(prev_img, img, feats[-1]))
            else:
                feats.append(extract(img))
            prev_img = img
    else:
        if not args.annotation or not args.images:
            raise SystemExit("dataset mode needs --annotation and --images")
        extract, track = _make_frontend(args, cfg)
        seqm = iolib.SequenceManager(args.annotation, args.images)
        intr = seqm.ann.intr
        gt = seqm.ann.cameras[: args.frames]
        feats = []
        prev_img = None
        for k in range(min(args.frames, seqm.length)):
            img = seqm.get_image(k)
            mask = seqm.get_mask(k, img.shape[0], img.shape[1])
            if args.klt and prev_img is not None:
                feats.append(track(prev_img, img, feats[-1], mask=mask))
            else:
                feats.append(extract(img, mask=mask))
            prev_img = img

    # --- run ------------------------------------------------------------------
    if args.tracker == "homography":
        _run_homography_baseline(args, cfg, intr, feats, gt)
        return

    slam = PTZSlam(cfg, intr)
    state = slam.init(*feats[0], gt[0])

    forest = None
    trained_kf = 0

    def _train_forest_on_new_keyframes(state):
        """Feed keyframes inserted since the last call to the native forest
        (SURVEY.md §4.1/§4.2 'rf_map.add_keyframe': online training)."""
        nonlocal trained_kf
        n_kf = int(state.kf.count)
        if n_kf <= trained_kf:
            return
        kf = jax.device_get(state.kf)
        rays = jax.device_get(state.rays.rays)
        for i in range(trained_kf, n_kf):
            keep = kf.feat_valid[i] & (kf.ray_ids[i] >= 0)
            ids = np.clip(kf.ray_ids[i], 0, None)
            forest.add_keyframe(kf.desc[i], rays[ids], valid=keep)
        trained_kf = n_kf

    if args.reloc == "forest":
        from ptzjax.reloc_forest import RelocForest, relocalize_rf

        forest = RelocForest()
        _train_forest_on_new_keyframes(state)

    # stacked feature tables: chunks run as single on-device lax.scans and
    # per-frame info is pulled ONCE per chunk (a d2h transfer per frame
    # permanently degrades dispatch latency on tunneled TPU backends)
    xy_all = np.stack([np.asarray(f[0]) for f in feats])
    desc_all = np.stack([np.asarray(f[1]) for f in feats])
    valid_all = np.stack([np.asarray(f[2]) for f in feats])

    chunk = max(1, args.chunk)

    def padded_chunk(k, end):
        """Pad [k, end) to the SAME static length: each distinct chunk shape
        costs a full host-side retrace; padding frames are masked no-ops."""
        n = end - k
        pad = chunk - n
        sl = slice(k, end)
        xy_c = np.concatenate([xy_all[sl], np.repeat(xy_all[end - 1 : end], pad, 0)])
        desc_c = np.concatenate([desc_all[sl], np.repeat(desc_all[end - 1 : end], pad, 0)])
        valid_c = np.concatenate(
            [valid_all[sl], np.zeros((pad,) + valid_all.shape[1:], bool)]
        )
        return xy_c, desc_c, valid_c, np.arange(chunk) < n

    records = []
    interactive = forest is not None or args.checkpoint_every
    if not interactive:
        # single on-device lax.scan over the whole sequence with ZERO
        # device->host transfers inside the clock (the first d2h of a
        # process costs ~60 s and permanently degrades later dispatches
        # ~300x on this PJRT tunnel); per-frame info is pulled once at the
        # end. Warm up trace+compile with an all-masked (no-op) pass first
        # so the reported fps is the loop, not the one-time jit cost.
        t = len(feats) - 1
        # features on device before the clock (the frontend produces them
        # on device in the from-pixels pipeline; here they come from host
        # oracles/stacks)
        xy_d = jnp.asarray(xy_all[1:])
        desc_d = jnp.asarray(desc_all[1:])
        valid_d = jnp.asarray(valid_all[1:])
        state_w, _ = slam.run_segment(
            state, xy_d, desc_d, valid_d, np.zeros((t,), bool)
        )
        jax.block_until_ready(state_w)
        t0 = time.perf_counter()
        state, infos = slam.run_segment(state, xy_d, desc_d, valid_d)
        jax.block_until_ready(state)
        wall = time.perf_counter() - t0
        records = infos_to_dicts(infos, frame0=1)
    else:
        # warm up trace+compile with an all-masked (pure no-op) chunk
        xy_w, desc_w, valid_w, _ = padded_chunk(0, min(chunk, len(feats)))
        state_w, _ = slam.run_segment(
            state, xy_w, desc_w, valid_w, np.zeros((chunk,), bool)
        )
        jax.block_until_ready(state_w)
        # interactive loop (native-forest reloc and/or periodic checkpoints
        # need host decisions): pay the tunnel handshake before the clock
        float(state_w.frame_idx)  # one tiny d2h: absorbs the ~60 s first-transfer cost
        lost_host = False
        t0 = time.perf_counter()
        k = 1
        while k < len(feats):
            if forest is not None and lost_host:
                # forest path: the host resolves frames the in-graph reloc
                # could not recover through the native regressor (SURVEY.md
                # §4.4 path B), one frame at a time until tracking resumes
                xy, desc, valid = feats[k]
                res = relocalize_rf(forest, desc, xy, valid, intr, cfg)
                state = slam.apply_reloc_result(state, xy, desc, valid, res)
                lost_host = not bool(res.success)
                records.append({
                    "frame": k, "event": "reloc", "lost": lost_host,
                    "reloc_success": bool(res.success),
                    "reloc_inliers": int(res.inliers),
                    "pose": np.asarray(jax.device_get(state.ekf.pose)),
                    "num_matches": int(res.inliers), "num_used": int(res.inliers),
                    "innovation_rms": 0.0, "keyframe": False,
                    "active_slots": int(jax.device_get(state.ekf.active.sum())),
                    "max_kf_overlap": 1.0,
                })
                k += 1
                continue
            end = min(k + chunk, len(feats))
            if args.checkpoint_every:
                # stop chunks exactly on checkpoint frames
                next_ckpt = (
                    (k - 1) // args.checkpoint_every + 1
                ) * args.checkpoint_every
                end = min(end, next_ckpt + 1)
            state, infos = slam.run_segment(state, *padded_chunk(k, end))
            recs = infos_to_dicts(infos, frame0=k)[: end - k]
            records.extend(recs)
            if forest is not None:
                if any(r["keyframe"] for r in recs):
                    _train_forest_on_new_keyframes(state)
                lost_host = recs[-1]["lost"]
            if args.checkpoint_every and (end - 1) % args.checkpoint_every == 0:
                ckpt.save_pytree(
                    os.path.join(args.out, f"state_{end - 1:06d}.npz"), state
                )
            k = end
        jax.block_until_ready(state)
        wall = time.perf_counter() - t0

    if args.ba:
        state, ba_info = slam.bundle_adjust(state)
        print("BA:", json.dumps(ba_info))

    # --- artifacts --------------------------------------------------------------
    iolib.write_trajectory_jsonl(os.path.join(args.out, "frames.jsonl"), records)
    pose = np.stack([r["pose"] for r in records])
    np.savez(os.path.join(args.out, "trajectory.npz"), pose=pose, gt=gt[1:])
    summary = {
        **evallib.trajectory_errors(pose, gt[1 : len(pose) + 1]).as_dict(),
        "reprojection_rmse_px": evallib.reprojection_rmse(
            pose, gt[1 : len(pose) + 1], intr, args.width, args.height
        ),
        "fps": (len(feats) - 1) / wall,
        "frames_lost": sum(r["lost"] for r in records),
        "keyframes": sum(r["keyframe"] for r in records),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    if args.plot:
        from ptzjax.plots import plot_run

        plot_run(
            pose, gt[1 : len(pose) + 1], os.path.join(args.out, "trajectory.png"),
            records=records, title=os.path.basename(args.out.rstrip("/")),
        )
    print(json.dumps(summary, indent=2))


def _make_frontend(args, cfg):
    """Return (extract(img, mask=None), track(prev_img, img, prev_feats,
    mask=None)) -> (xy, desc, valid) for the selected --frontend."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.frontend == "cv2":
        from ptzjax.frontend_cv2 import extract_features_cv2, track_features_cv2

        def extract(img, mask=None):
            f = extract_features_cv2(
                np.asarray(img), cfg,
                mask=None if mask is None else np.asarray(mask),
            )
            return f.xy, f.desc, f.valid

        def track(prev_img, img, prev_feats, mask=None):
            xy, desc, valid, _ = track_features_cv2(
                np.asarray(prev_img), np.asarray(img),
                prev_feats[0], prev_feats[1], prev_feats[2], cfg,
                mask=None if mask is None else np.asarray(mask),
            )
            return xy, desc, valid

        return extract, track

    from ptzjax.frontend import extract_features, track_features

    use_pallas = jax.default_backend() == "tpu"

    def extract(img, mask=None):
        return extract_features(
            jnp.asarray(img), cfg,
            mask=None if mask is None else jnp.asarray(mask),
            use_pallas=use_pallas,
        )

    def track(prev_img, img, prev_feats, mask=None):
        xy, desc, valid, _ = track_features(
            jnp.asarray(prev_img), jnp.asarray(img),
            prev_feats[0], prev_feats[2], cfg,
            mask=None if mask is None else jnp.asarray(mask),
            use_pallas=use_pallas,
        )
        return xy, desc, valid

    return extract, track


def _run_homography_baseline(args, cfg, intr, feats, gt) -> None:
    """Baseline-tracker path of the CLI: one lax.scan over the sequence,
    same artifacts as the SLAM path (summary.json, trajectory.npz, plot)."""
    import json
    import os
    import time

    import jax
    import numpy as np

    from ptzjax import eval as evallib
    from ptzjax import io as iolib
    from ptzjax.baselines import init_vo, track_homography_ekf

    xy = np.stack([np.asarray(f[0]) for f in feats])
    desc = np.stack([np.asarray(f[1]) for f in feats])
    valid = np.stack([np.asarray(f[2]) for f in feats])
    state = init_vo(gt[0], xy[0], desc[0], valid[0], cfg)
    # warm-up (compile), then timed run
    _, infos = track_homography_ekf(
        state, xy[1:], desc[1:], valid[1:], intr=intr, cfg=cfg
    )
    jax.block_until_ready(infos)
    t0 = time.perf_counter()
    _, infos = track_homography_ekf(
        state, xy[1:], desc[1:], valid[1:], intr=intr, cfg=cfg
    )
    jax.block_until_ready(infos)
    wall = time.perf_counter() - t0

    h = jax.device_get(infos)
    pose = np.asarray(h.pose)
    records = [
        {
            "frame": k + 1, "event": "track", "pose": pose[k],
            "num_matches": int(h.num_inliers[k]),
            "lost": not bool(h.updated[k]), "keyframe": False,
        }
        for k in range(len(pose))
    ]
    iolib.write_trajectory_jsonl(os.path.join(args.out, "frames.jsonl"), records)
    np.savez(
        os.path.join(args.out, "trajectory.npz"), pose=pose, gt=gt[1 : len(pose) + 1]
    )
    summary = {
        **evallib.trajectory_errors(pose, gt[1 : len(pose) + 1]).as_dict(),
        "reprojection_rmse_px": evallib.reprojection_rmse(
            pose, gt[1 : len(pose) + 1], intr, args.width, args.height
        ),
        "fps": len(pose) / wall,
        "frames_lost": sum(r["lost"] for r in records),
        "tracker": "homography",
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    if args.plot:
        from ptzjax.plots import plot_run

        plot_run(
            pose, gt[1 : len(pose) + 1], os.path.join(args.out, "trajectory.png"),
            records=records, title=f"{os.path.basename(args.out.rstrip('/'))} (homography baseline)",
        )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
