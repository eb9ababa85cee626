"""Camera models, projection, and batched DLT triangulation.

Replaces the reference's ``cam_intrinsics_estimation.py:78-99`` (make_K,
file loading) and the cv2.triangulatePoints call sites
(``bundle_adjustment.py:69-80``, ``robust_pose_estimator.py:269-296``) with
vectorised, jittable equivalents: triangulation is a batched 4x4 SVD (one
DLT system per correspondence), which XLA maps onto the MXU far better
than a per-point Python loop.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def make_K(fx: float, fy: float, cx: float, cy: float, dtype=jnp.float32) -> jnp.ndarray:
    """Assemble a 3x3 intrinsics matrix."""
    return jnp.asarray([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=dtype)


def make_K_from_fov(width: int, height: int, fov_deg: float = 60.0, dtype=jnp.float32) -> jnp.ndarray:
    """FOV-based intrinsics (parity: ``cam_intrinsics_estimation.py:78-82``)."""
    f = 0.5 * width / np.tan(0.5 * np.deg2rad(fov_deg))
    return make_K(f, f, width * 0.5, height * 0.5, dtype=dtype)


def load_K_from_file(path: Path) -> np.ndarray:
    """Parse an ``fx fy cx cy`` intrinsics line (parity: ``cam_intrinsics_estimation.py:85-99``)."""
    text = Path(path).read_text().strip().split()
    if len(text) < 4:
        raise ValueError(f"{path}: expected 'fx fy cx cy', got {text!r}")
    fx, fy, cx, cy = (float(v) for v in text[:4])
    return np.asarray([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=np.float64)


def project_points(points_3d: jnp.ndarray, K: jnp.ndarray, T_cw: jnp.ndarray) -> jnp.ndarray:
    """Project world points through camera pose T_cw (world→camera), pinhole K.

    points_3d: (..., N, 3); T_cw: (..., 4, 4); returns pixel coords (..., N, 2).
    """
    R = T_cw[..., :3, :3]
    t = T_cw[..., :3, 3]
    cam = points_3d @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    z = jnp.where(jnp.abs(cam[..., 2:3]) < 1e-9, 1e-9, cam[..., 2:3])
    uv = cam[..., :2] / z
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    u = uv[..., 0] * fx[..., None] + cx[..., None]
    v = uv[..., 1] * fy[..., None] + cy[..., None]
    return jnp.stack([u, v], axis=-1)


def camera_depths(points_3d: jnp.ndarray, T_cw: jnp.ndarray) -> jnp.ndarray:
    """Depth (z in camera frame) of world points under pose T_cw."""
    R = T_cw[..., :3, :3]
    t = T_cw[..., :3, 3]
    return (points_3d @ jnp.swapaxes(R, -1, -2) + t[..., None, :])[..., 2]


def triangulate_dlt(
    P1: jnp.ndarray, P2: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray
) -> jnp.ndarray:
    """Batched two-view DLT triangulation.

    P1, P2: (3, 4) projection matrices. pts1, pts2: (N, 2) pixel (or
    normalised) coordinates. Returns (N, 3) euclidean points. One 4x4 SVD
    per correspondence, batched — replaces per-point loops at
    ``homography.py:268-295`` and cv2.triangulatePoints call sites.
    """
    def rows(P, pts):
        # For each point: [u*P3 - P1 ; v*P3 - P2]  (2, 4) rows.
        u = pts[:, 0:1]
        v = pts[:, 1:2]
        r1 = u * P[2:3, :] - P[0:1, :]
        r2 = v * P[2:3, :] - P[1:2, :]
        return jnp.stack([r1, r2], axis=1)  # (N, 2, 4) via broadcasting

    A = jnp.concatenate([rows(P1, pts1), rows(P2, pts2)], axis=1)  # (N, 4, 4)
    # Smallest right singular vector of each A via batched Cholesky inverse
    # iteration (one tiny 4x4 system per correspondence — see geometry.linalg).
    from mvslam_tpu.geometry.linalg import smallest_eigvec_psd

    AtA = jnp.swapaxes(A, -1, -2) @ A
    X = smallest_eigvec_psd(AtA)
    w_component = X[..., 3]
    scale = jnp.where(jnp.abs(w_component) < 1e-12, 1e-12, w_component)
    return X[..., :3] / scale[..., None]


def triangulate_pair(
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
) -> jnp.ndarray:
    """Triangulate with camera 1 at identity and camera 2 at [R|t]."""
    dtype = pts1.dtype
    P1 = K.astype(dtype) @ jnp.concatenate(
        [jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype=dtype)], axis=1
    )
    P2 = K.astype(dtype) @ jnp.concatenate([R.astype(dtype), t.astype(dtype).reshape(3, 1)], axis=1)
    return triangulate_dlt(P1, P2, pts1, pts2)


def normalize_pixels(pts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel → normalised camera coordinates: K⁻¹ [u v 1]."""
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    x = (pts[..., 0] - cx) / fx
    y = (pts[..., 1] - cy) / fy
    return jnp.stack([x, y], axis=-1)


def hartley_normalization(
    pts: jnp.ndarray, weights: jnp.ndarray | None = None, pinned: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hartley point normalisation: zero-mean, mean distance √2.

    Returns (normalised points, 3x3 conditioning transform T) with
    ``x_norm = T @ x``. Optional ``weights`` (..., N) make the statistics
    weighted (used for masked inlier refits under jit). Parity:
    ``homography.py:118-142`` preconditioning.
    """
    if weights is None:
        mean = jnp.mean(pts, axis=-2, keepdims=True)
        centered = pts - mean
        mean_dist = jnp.mean(jnp.linalg.norm(centered, axis=-1), axis=-1)
    else:
        # Weighted = inlier refit. ``pinned=True``: accumulate with
        # order-pinned tree sums so the statistics are bit-identical
        # across mesh/batch shapes (see geometry.linalg.tree_sum);
        # ``pinned=False``: plain sums (single-chip fast path, see
        # RansacConfig.mesh_invariant).
        if pinned:
            from mvslam_tpu.geometry.linalg import tree_sum
        else:
            def tree_sum(x, axis):
                return jnp.sum(x, axis=axis)

        wsum = tree_sum(weights, axis=-1)[..., None]
        wsum = jnp.where(wsum < 1e-12, 1e-12, wsum)
        mean = tree_sum(pts * weights[..., None], axis=-2)[..., None, :] / wsum[..., None]
        centered = pts - mean
        mean_dist = tree_sum(jnp.linalg.norm(centered, axis=-1) * weights, axis=-1) / wsum[..., 0]
    scale = jnp.sqrt(jnp.asarray(2.0, dtype=pts.dtype)) / jnp.where(mean_dist < 1e-12, 1e-12, mean_dist)
    T = jnp.stack(
        [
            jnp.stack([scale, jnp.zeros_like(scale), -scale * mean[..., 0, 0]], axis=-1),
            jnp.stack([jnp.zeros_like(scale), scale, -scale * mean[..., 0, 1]], axis=-1),
            jnp.stack([jnp.zeros_like(scale), jnp.zeros_like(scale), jnp.ones_like(scale)], axis=-1),
        ],
        axis=-2,
    )
    return centered * scale[..., None, None], T
