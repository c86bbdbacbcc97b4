"""NumPy oracle for the Harris detector (tests/oracle convention,
SURVEY.md §6 item 1): independent implementation the jax/Pallas kernels
must match."""

from __future__ import annotations

import numpy as np


def smooth5_np(x: np.ndarray) -> np.ndarray:
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float64) / 16.0
    p = np.pad(x, ((2, 2), (0, 0)), mode="edge")
    row = sum(k[i] * p[i : i + x.shape[0], :] for i in range(5))
    p = np.pad(row, ((0, 0), (2, 2)), mode="edge")
    return sum(k[i] * p[:, i : i + x.shape[1]] for i in range(5))


def harris_np(img: np.ndarray, k: float = 0.04) -> np.ndarray:
    img = img.astype(np.float64)
    p = np.pad(img, 1, mode="edge")
    ix = 0.5 * (p[1:-1, 2:] - p[1:-1, :-2])
    iy = 0.5 * (p[2:, 1:-1] - p[:-2, 1:-1])
    ixx = smooth5_np(ix * ix)
    iyy = smooth5_np(iy * iy)
    ixy = smooth5_np(ix * iy)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    return det - k * tr * tr


def nms3_np(resp: np.ndarray) -> np.ndarray:
    neg = -1e30
    p = np.pad(resp, 1, mode="constant", constant_values=neg)
    prev = np.max(
        np.stack([p[:-2, :-2], p[:-2, 1:-1], p[:-2, 2:], p[1:-1, :-2]]), 0
    )
    nxt = np.max(
        np.stack([p[1:-1, 2:], p[2:, :-2], p[2:, 1:-1], p[2:, 2:]]), 0
    )
    keep = (resp > prev) & (resp >= nxt)
    return np.where(keep, resp, neg)
