"""OpenCV-features ingestion: the reference-parity frontend.

BASELINE.md config 1 runs the tracker on "reference feature matches" — SIFT
keypoints/descriptors as the reference's own vision layer produces them
(``slam_system/image_process.py`` ``detect_compute_sift``). This module
produces exactly that: cv2 SIFT on the host, padded into the same
``FrameFeatures`` tables the TPU kernels emit, so accuracy comparisons
isolate the SLAM math from detector quality (SURVEY.md §10 "hard parts":
SIFT parity is judged at the trajectory level).

Host-side and optional: import fails cleanly without OpenCV.
"""

from __future__ import annotations

import numpy as np

from ptzjax.config import SLAMConfig
from ptzjax.features import FrameFeatures

try:
    import cv2  # type: ignore

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def has_cv2() -> bool:
    return _HAS_CV2


def extract_features_cv2(
    img: np.ndarray,
    cfg: SLAMConfig,
    mask: np.ndarray | None = None,
) -> FrameFeatures:
    """cv2 SIFT detect+compute -> padded FrameFeatures.

    Args:
      img: (H, W) grayscale in [0, 1] float or uint8.
      mask: (H, W) bool, True where detection is allowed.

    Returns:
      FrameFeatures with capacity cfg.max_keypoints; descriptors
      L2-normalized (SIFT's 0.2-clipped histograms, matching the unit-norm
      convention of the matcher).
    """
    if not _HAS_CV2:
        raise RuntimeError("OpenCV not available")
    if img.dtype != np.uint8:
        img8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    else:
        img8 = img
    m8 = None if mask is None else (mask.astype(np.uint8) * 255)
    sift = cv2.SIFT_create(nfeatures=cfg.max_keypoints)
    kps, desc = sift.detectAndCompute(img8, m8)

    cap = cfg.max_keypoints
    xy = np.zeros((cap, 2), np.float32)
    d = np.zeros((cap, 128), np.float32)
    valid = np.zeros((cap,), bool)
    if kps:
        order = np.argsort([-k.response for k in kps])[:cap]
        n = len(order)
        xy[:n] = np.array([kps[i].pt for i in order], np.float32)
        dn = desc[order].astype(np.float32)
        d[:n] = dn / np.maximum(np.linalg.norm(dn, axis=-1, keepdims=True), 1e-9)
        valid[:n] = True
    if d.shape[1] != cfg.kf_desc_dim:
        raise ValueError(
            f"cv2 SIFT is 128-d; cfg.kf_desc_dim={cfg.kf_desc_dim}"
        )
    return FrameFeatures(xy=xy, desc=d, valid=valid)
