"""Global map: keyframe registry + ray store, and the map<->BA bridge.

TPU-native redesign of the reference's ``slam_system/scene_map.py`` /
``key_frame.py`` (SURVEY.md §2 layer 4): instead of Python lists of KeyFrame
objects, fixed-capacity padded arrays (a pytree) so that map maintenance,
keyframe-overlap queries, and BA-problem assembly are all jittable with
static shapes.

Design notes:
- every landmark has a *global ray id* = its row in RayStore; EKF slots and
  keyframe feature tables refer to rays by id (-1 = none);
- keyframe insertion policy = angular view-overlap threshold against the
  nearest stored keyframe (reference policy: pan/zoom overlap — SURVEY.md
  §4.2);
- ``build_ba_problem`` converts the keyframe observation tables into the
  ray-major BA layout with a sort + segmented-rank, all static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ptzjax.ba import BAProblem
from ptzjax.config import SLAMConfig


class RayStore(NamedTuple):
    """Global ray landmarks.

    Attributes:
      rays: (M, 2) current estimates.
      desc: (M, D) representative unit descriptor (first observation's).
      valid: (M,) bool.
      views: (M,) int32 number of keyframes observing the ray.
      count: () int32 allocated rows.
    """

    rays: jax.Array
    desc: jax.Array
    valid: jax.Array
    views: jax.Array
    count: jax.Array


class KeyframeStore(NamedTuple):
    """Keyframe records (reference ``KeyFrame`` — SURVEY.md §2 layer 4).

    Attributes:
      poses: (K, 3); frame_idx: (K,) int32; valid: (K,) bool;
      xy: (K, F, 2); desc: (K, F, D); ray_ids: (K, F) int32 (-1 = none);
      feat_valid: (K, F) bool; count: () int32.
    """

    poses: jax.Array
    frame_idx: jax.Array
    valid: jax.Array
    xy: jax.Array
    desc: jax.Array
    ray_ids: jax.Array
    feat_valid: jax.Array
    count: jax.Array


def init_ray_store(cfg: SLAMConfig) -> RayStore:
    m, d = cfg.max_map_rays, cfg.kf_desc_dim
    return RayStore(
        rays=jnp.zeros((m, 2), jnp.float32),
        desc=jnp.zeros((m, d), jnp.float32),
        valid=jnp.zeros((m,), bool),
        views=jnp.zeros((m,), jnp.int32),
        count=jnp.asarray(0, jnp.int32),
    )


def init_keyframe_store(cfg: SLAMConfig) -> KeyframeStore:
    k, f, d = cfg.max_keyframes, cfg.max_keypoints, cfg.kf_desc_dim
    return KeyframeStore(
        poses=jnp.zeros((k, 3), jnp.float32),
        frame_idx=jnp.full((k,), -1, jnp.int32),
        valid=jnp.zeros((k,), bool),
        xy=jnp.zeros((k, f, 2), jnp.float32),
        desc=jnp.zeros((k, f, d), jnp.float32),
        ray_ids=jnp.full((k, f), -1, jnp.int32),
        feat_valid=jnp.zeros((k, f), bool),
        count=jnp.asarray(0, jnp.int32),
    )


def add_rays(
    store: RayStore, rays: jax.Array, desc: jax.Array, mask: jax.Array
) -> tuple[RayStore, jax.Array]:
    """Allocate global ids for new rays (contiguous from store.count).

    Args:
      rays: (B, 2); desc: (B, D); mask: (B,) candidates to allocate.

    Returns:
      (store, ids): ids (B,) int32, -1 where not allocated (masked out or
      capacity exhausted).
    """
    m = store.rays.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    ids = store.count + rank
    ok = mask & (ids < m)
    ids = jnp.where(ok, ids, -1)
    tgt = jnp.where(ok, ids, m)
    new = RayStore(
        rays=store.rays.at[tgt].set(rays, mode="drop"),
        desc=store.desc.at[tgt].set(desc, mode="drop"),
        valid=store.valid.at[tgt].set(True, mode="drop"),
        views=store.views,
        count=jnp.minimum(store.count + mask.sum().astype(jnp.int32), m),
    )
    return new, ids


def update_rays(store: RayStore, ids: jax.Array, rays: jax.Array, mask: jax.Array) -> RayStore:
    """Write refined ray estimates (EKF slots or BA output) back by id."""
    m = store.rays.shape[0]
    tgt = jnp.where(mask & (ids >= 0), ids, m)
    return store._replace(rays=store.rays.at[tgt].set(rays, mode="drop"))


def add_keyframe(
    store: KeyframeStore,
    pose: jax.Array,
    frame_idx: jax.Array,
    xy: jax.Array,
    desc: jax.Array,
    ray_ids: jax.Array,
    feat_valid: jax.Array,
) -> KeyframeStore:
    """Append a keyframe at slot store.count (no-op if at capacity)."""
    k = store.poses.shape[0]
    slot = jnp.minimum(store.count, k - 1)
    at_cap = store.count >= k
    tgt = jnp.where(at_cap, k, slot)
    return KeyframeStore(
        poses=store.poses.at[tgt].set(pose, mode="drop"),
        frame_idx=store.frame_idx.at[tgt].set(frame_idx, mode="drop"),
        valid=store.valid.at[tgt].set(True, mode="drop"),
        xy=store.xy.at[tgt].set(xy, mode="drop"),
        desc=store.desc.at[tgt].set(desc, mode="drop"),
        ray_ids=store.ray_ids.at[tgt].set(ray_ids, mode="drop"),
        feat_valid=store.feat_valid.at[tgt].set(feat_valid, mode="drop"),
        count=jnp.minimum(store.count + 1, k),
    )


def view_overlap(
    pose_a: jax.Array, pose_b: jax.Array, width: float, height: float
) -> jax.Array:
    """Angular view-overlap in [0, 1] between two PTZ poses.

    Product of horizontal and vertical interval overlaps (relative to the
    narrower view). Zoom differences shrink the FOV and therefore the
    overlap automatically.
    """

    def interval_overlap(c1, h1, c2, h2):
        lo = jnp.maximum(c1 - h1, c2 - h2)
        hi = jnp.minimum(c1 + h1, c2 + h2)
        inter = jnp.maximum(hi - lo, 0.0)
        return inter / jnp.maximum(2 * jnp.minimum(h1, h2), 1e-9)

    ha = jnp.arctan2(width / 2, pose_a[..., 2])
    hb = jnp.arctan2(width / 2, pose_b[..., 2])
    va = jnp.arctan2(height / 2, pose_a[..., 2])
    vb = jnp.arctan2(height / 2, pose_b[..., 2])
    h_ov = interval_overlap(pose_a[..., 0], ha, pose_b[..., 0], hb)
    v_ov = interval_overlap(pose_a[..., 1], va, pose_b[..., 1], vb)
    return h_ov * v_ov


def max_overlap_with_keyframes(
    store: KeyframeStore, pose: jax.Array, width: float, height: float
) -> jax.Array:
    """Max view overlap of ``pose`` against all stored keyframes (0 if none).
    Insertion policy: insert a keyframe when this drops below
    cfg.keyframe_overlap (SURVEY.md §4.2)."""
    ov = view_overlap(store.poses, pose[None, :], width, height)
    return jnp.max(jnp.where(store.valid, ov, 0.0))


def build_ba_problem(
    kf: KeyframeStore,
    rays: RayStore,
    max_views_per_ray: int,
    anchor_first: bool = True,
) -> BAProblem:
    """Assemble the ray-major BA problem from keyframe observation tables.

    Static-shape algorithm: flatten all (keyframe, feature) observations,
    sort by global ray id, compute each observation's rank within its ray
    (index - first-occurrence index via searchsorted), and scatter into the
    (M, C) table, dropping ranks >= C.
    """
    k, f = kf.ray_ids.shape
    m = rays.rays.shape[0]
    c = max_views_per_ray

    flat_ids = jnp.where(
        kf.feat_valid & (kf.ray_ids >= 0) & kf.valid[:, None], kf.ray_ids, m
    ).reshape(-1)
    flat_cam = jnp.broadcast_to(
        jnp.arange(k, dtype=jnp.int32)[:, None], (k, f)
    ).reshape(-1)
    flat_xy = kf.xy.reshape(-1, 2)

    order = jnp.argsort(flat_ids)
    s_ids = flat_ids[order]
    first = jnp.searchsorted(s_ids, s_ids, side="left")
    rank = jnp.arange(s_ids.shape[0], dtype=jnp.int32) - first.astype(jnp.int32)
    ok = (s_ids < m) & (rank < c)

    row = jnp.where(ok, s_ids, m)
    col = jnp.where(ok, rank, 0)
    obs_pix = jnp.zeros((m, c, 2), jnp.float32).at[row, col].set(
        flat_xy[order], mode="drop"
    )
    obs_cam = jnp.zeros((m, c), jnp.int32).at[row, col].set(
        flat_cam[order], mode="drop"
    )
    obs_w = jnp.zeros((m, c), jnp.float32).at[row, col].set(1.0, mode="drop")

    cam_free = kf.valid.copy()
    if anchor_first:
        cam_free = cam_free.at[0].set(False)
    return BAProblem(
        cams=kf.poses,
        rays=rays.rays,
        obs_pix=obs_pix,
        obs_cam=obs_cam,
        obs_w=obs_w,
        cam_free=cam_free,
    )


def apply_ba_result(
    kf: KeyframeStore, rays: RayStore, cams: jax.Array, new_rays: jax.Array,
    obs_w: jax.Array,
) -> tuple[KeyframeStore, RayStore]:
    """Write BA-refined poses/rays back into the stores. Rays with no BA
    observations (row weight 0) keep their previous estimate."""
    observed = obs_w.sum(axis=1) > 0
    merged = jnp.where(observed[:, None], new_rays, rays.rays)
    return (
        kf._replace(poses=jnp.where(kf.valid[:, None], cams, kf.poses)),
        rays._replace(rays=merged),
    )
