"""Image frontend: raw frames -> fixed-capacity ``FrameFeatures``.

The TPU-native analogue of the reference's per-frame OpenCV call sequence
(``slam_system/image_process.py`` ``detect_compute_sift`` + masking —
SURVEY.md §2 layer 3, §4.1/§4.2): one jitted pipeline running the Pallas
Harris detector, the upright-SIFT descriptor kernel, and the padding/mask
logic on device. The output plugs straight into ``PTZSlam.step`` /
``run_segment`` — the SLAM loop is agnostic to whether features came from
here, from OpenCV ingestion (``ptzjax.io``), or from the synthetic oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ptzjax.config import SLAMConfig
from ptzjax.kernels.descriptor import describe_keypoints
from ptzjax.kernels.detect import detect_keypoints


@partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def extract_features(
    img: jax.Array,
    cfg: SLAMConfig,
    mask: jax.Array | None = None,
    use_pallas: bool = True,
):
    """Detect + describe one grayscale frame.

    Args:
      img: (H, W) float grayscale.
      mask: optional (H, W) bool, True where detection is allowed (the
        complement of the reference's player bounding boxes).
      use_pallas: fused TPU detector kernel (jax fallback off-TPU).

    Returns:
      (xy (K, 2), desc (K, D), valid (K,)) with K = cfg.max_keypoints.
    """
    kp = detect_keypoints(
        img,
        max_keypoints=cfg.max_keypoints,
        threshold=cfg.detector_threshold,
        mask=mask,
        use_pallas=use_pallas,
    )
    desc = describe_keypoints(img, kp.xy, kp.valid)
    return kp.xy, desc, kp.valid


def extract_sequence(imgs, cfg: SLAMConfig, masks=None, use_pallas: bool = True):
    """Batch feature extraction over a (T, H, W) stack via ``lax.map``
    (sequential on device: one frame's maps live in HBM at a time)."""
    imgs = jnp.asarray(imgs)
    fn = lambda im: extract_features(im, cfg, use_pallas=use_pallas)
    if masks is None:
        return jax.lax.map(fn, imgs)
    return jax.lax.map(
        lambda args: extract_features(args[0], cfg, mask=args[1], use_pallas=use_pallas),
        (imgs, jnp.asarray(masks)),
    )
