import time, sys, json
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from ptzjax import synth
from ptzjax.config import SLAMConfig
from ptzjax.frontend import extract_features
from ptzjax.geometry import Intrinsics
from ptzjax.slam import PTZSlam

w, h, frames = 1280, 720, 120
cfg = SLAMConfig(image_width=w, image_height=h, max_rays=128,
                 max_keypoints=256, max_map_rays=2048, max_keyframes=32,
                 kf_desc_dim=128, sigma_obs=1.0, descriptor_f_ref=2000.0)
intr = Intrinsics.create(w/2., h/2.)
pano = synth.make_panorama(seed=0)
cams = synth.make_trajectory(frames, pan_amp=0.12, tilt0=-0.05, tilt_amp=0.02,
                             f0=2000.0, f_amp=250.0, period=frames*1.6, seed=0)
imgs = np.stack([synth.render_image(pano, c, intr, w, h) for c in cams]).astype(np.float32)
slam = PTZSlam(cfg, intr)
f0 = extract_features(jnp.asarray(imgs[0]), cfg, use_pallas=True, focal=jnp.asarray(cams[0][2]))
state = slam.init(*f0, cams[0])
s2, infos = slam.run_segment_pixels(state, jnp.asarray(imgs[1:]), use_pallas=True)
infos = jax.device_get(infos)
lost = np.asarray(infos.lost); used = np.asarray(infos.num_used)
pose = np.asarray(infos.pose)
err_pan = np.degrees(np.abs(pose[:,0]-cams[1:,0]))
print("lost frames:", np.nonzero(lost)[0].tolist()[:20], flush=True)
print("num_used first 30:", used[:30].tolist(), flush=True)
print("num_used min/mean:", used.min(), used.mean(), flush=True)
print("pan err deg max/mean:", float(err_pan.max()), float(err_pan.mean()), flush=True)
