"""Camera intrinsics estimation utilities.

Parity: reference ``cam_intrinsics_estimation.py`` — vanishing-point focal
estimation from matched line pairs (ref L4-76), FOV-based ``make_K`` (ref
L78-82), and the ``fx fy cx cy`` file parser (ref L85-99; re-exported from
``geometry.projection``).

The vanishing-point method: two families of parallel scene lines project
to image lines meeting at vanishing points v1, v2; for orthogonal
families, (v1 − c)·(v2 − c) + f² = 0 with principal point c — solving for
f. Line intersections and the focal solve are vectorised jnp.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from mvslam_tpu.geometry.projection import load_K_from_file, make_K, make_K_from_fov

__all__ = [
    "make_K",
    "make_K_from_fov",
    "load_K_from_file",
    "line_through_points",
    "intersect_lines",
    "estimate_focal_from_vanishing_points",
    "estimate_focal_from_line_pairs",
]


def line_through_points(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous line(s) through point pairs: l = p1 × p2 (batched)."""
    h1 = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], axis=-1)
    h2 = jnp.concatenate([p2, jnp.ones_like(p2[..., :1])], axis=-1)
    return jnp.cross(h1, h2)


def intersect_lines(l1: jnp.ndarray, l2: jnp.ndarray) -> jnp.ndarray:
    """Intersection point(s) of homogeneous lines: x = l1 × l2, dehomogenised."""
    x = jnp.cross(l1, l2)
    w = jnp.where(jnp.abs(x[..., 2:3]) < 1e-12, 1e-12, x[..., 2:3])
    return x[..., :2] / w


def estimate_focal_from_vanishing_points(
    v1: np.ndarray, v2: np.ndarray, principal_point: np.ndarray
) -> Optional[float]:
    """f from two orthogonal vanishing points: f² = −(v1−c)·(v2−c).

    Returns None when the configuration is degenerate (f² ≤ 0).
    Parity: ``cam_intrinsics_estimation.py:4-76``.
    """
    c = np.asarray(principal_point, dtype=np.float64)
    d1 = np.asarray(v1, dtype=np.float64) - c
    d2 = np.asarray(v2, dtype=np.float64) - c
    f_sq = -float(d1 @ d2)
    if f_sq <= 0:
        return None
    return float(np.sqrt(f_sq))


def estimate_focal_from_line_pairs(
    family_a: Sequence[Tuple[np.ndarray, np.ndarray]],
    family_b: Sequence[Tuple[np.ndarray, np.ndarray]],
    principal_point: np.ndarray,
) -> Optional[float]:
    """Focal from two families of (assumed orthogonal) parallel scene lines.

    Each family is a sequence of image segments ((x1, y1), (x2, y2)); the
    family's vanishing point is the least-squares intersection of its
    lines (smallest-eigenvector of Σ l lᵀ, scale-normalised).
    """
    def vanishing_point(family) -> Optional[np.ndarray]:
        if len(family) < 2:
            return None
        p1 = jnp.asarray([seg[0] for seg in family], dtype=jnp.float32)
        p2 = jnp.asarray([seg[1] for seg in family], dtype=jnp.float32)
        lines = line_through_points(p1, p2)
        norms = jnp.linalg.norm(lines[..., :2], axis=-1, keepdims=True)
        lines = lines / jnp.where(norms < 1e-12, 1e-12, norms)
        # Least-squares point minimising Σ (lᵀ x)²: smallest eigvec of Σ l lᵀ.
        M = jnp.einsum("ni,nj->ij", lines, lines)
        from mvslam_tpu.geometry.linalg import smallest_eigvec_psd

        x = smallest_eigvec_psd(M)
        if abs(float(x[2])) < 1e-9:
            return None
        return np.asarray(x[:2] / x[2], dtype=np.float64)

    va = vanishing_point(family_a)
    vb = vanishing_point(family_b)
    if va is None or vb is None:
        return None
    return estimate_focal_from_vanishing_points(va, vb, principal_point)
