"""Oriented BRIEF (rBRIEF-style) descriptors as fixed-shape gather kernels.

Replaces the cv2 ORB description stage (``feature_pipeline.py.bak:64-77``).
Orientation uses the classic intensity-centroid moment over a radius-15
circular patch; descriptors are 256 brightness comparisons of a
*steered* (rotated) sampling pattern, bit-packed into ``(N, 8)`` uint32
words for compact map storage and XOR/popcount matching.

The sampling pattern is generated once at import from a fixed-seed
Gaussian (σ = patch/5, the BRIEF-recommended distribution) rather than a
hand-copied table — deterministic across runs and platforms.

All functions take padded keypoint arrays + validity masks and are
shape-static, so they vmap over frames and jit cleanly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 15
NUM_PAIRS = 256
_PATTERN_SEED = 0x5EED


def _make_pattern() -> np.ndarray:
    """(NUM_PAIRS, 2, 2) int32 pattern: pairs of (dx, dy) offsets."""
    rng = np.random.default_rng(_PATTERN_SEED)
    sigma = PATCH_RADIUS / 5.0 * 2.0  # BRIEF G(0, S²/25) with S=2R
    pts = rng.normal(0.0, sigma, size=(NUM_PAIRS, 2, 2))
    pts = np.clip(np.round(pts), -(PATCH_RADIUS - 1), PATCH_RADIUS - 1)
    return pts.astype(np.int32)


_PATTERN = _make_pattern()  # (256, 2, 2) as (pair, endpoint, (dx, dy))

# Circular patch offsets for the intensity centroid (radius 15).
_cy, _cx = np.mgrid[-PATCH_RADIUS : PATCH_RADIUS + 1, -PATCH_RADIUS : PATCH_RADIUS + 1]
_circle_mask = (_cx**2 + _cy**2) <= PATCH_RADIUS**2
_MOMENT_DX = _cx[_circle_mask].astype(np.float32)
_MOMENT_DY = _cy[_circle_mask].astype(np.float32)
_MOMENT_OFFSETS = np.stack([_cx[_circle_mask], _cy[_circle_mask]], axis=-1).astype(np.int32)


@dataclass(frozen=True)
class BriefConfig:
    blur_sigma: float = 2.0
    blur_radius: int = 4


def _gather_pixels(image: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Clamped integer gather from an (H, W) image; xs/ys any shape."""
    h, w = image.shape
    xs = jnp.clip(xs, 0, w - 1)
    ys = jnp.clip(ys, 0, h - 1)
    flat = image.reshape(-1)
    return flat[ys * w + xs]


def compute_orientations(image: jnp.ndarray, xy: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint.

    image: (H, W) float32 (blurred). xy: (N, 2) as (x, y). Returns (N,)
    angles in radians. The rotated-BRIEF steering angle of ORB.
    """
    xi = xy[:, 0].astype(jnp.int32)  # (N,)
    yi = xy[:, 1].astype(jnp.int32)
    off = jnp.asarray(_MOMENT_OFFSETS)  # (P, 2)
    px = xi[:, None] + off[None, :, 0]  # (N, P)
    py = yi[:, None] + off[None, :, 1]
    vals = _gather_pixels(image, px, py)  # (N, P)
    m10 = jnp.sum(vals * jnp.asarray(_MOMENT_DX)[None, :], axis=1)
    m01 = jnp.sum(vals * jnp.asarray(_MOMENT_DY)[None, :], axis=1)
    angle = jnp.arctan2(m01, m10)
    return jnp.where(valid, angle, 0.0)


def _rotated_pattern(angles: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Steer the pattern by each keypoint's angle.

    Returns integer (N, 256, 2, 2) offsets split as (dx, dy) int32 arrays.
    """
    c = jnp.cos(angles)[:, None, None]
    s = jnp.sin(angles)[:, None, None]
    pat = jnp.asarray(_PATTERN, dtype=jnp.float32)  # (256, 2, 2)
    dx = pat[None, ..., 0]
    dy = pat[None, ..., 1]
    rx = jnp.round(c * dx - s * dy).astype(jnp.int32)
    ry = jnp.round(s * dx + c * dy).astype(jnp.int32)
    return rx, ry  # each (N, 256, 2)


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) bool → (N, 8) uint32, little-endian within each word."""
    n = bits.shape[0]
    words = bits.reshape(n, 8, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(words << shifts, axis=-1, dtype=jnp.uint32)


def unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 → (N, 256) uint8 bit matrix (for MXU matching)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = (packed[:, :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(packed.shape[0], 256).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("config",))
def describe_keypoints(
    image: jnp.ndarray,
    xy: jnp.ndarray,
    valid: jnp.ndarray,
    config: BriefConfig = BriefConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Steered-BRIEF descriptors for padded keypoints.

    image: (H, W) float32 **already blurred** by the caller (so one blur
    serves detection diagnostics and description). Returns
    ``(descriptors (N, 8) uint32, angles (N,) float32)``. Invalid slots
    hold zero descriptors.
    """
    angles = compute_orientations(image, xy, valid)
    rx, ry = _rotated_pattern(angles)  # (N, 256, 2)
    xi = xy[:, 0].astype(jnp.int32)[:, None, None]
    yi = xy[:, 1].astype(jnp.int32)[:, None, None]
    px = xi + rx
    py = yi + ry
    vals = _gather_pixels(image, px, py)  # (N, 256, 2)
    bits = vals[..., 0] < vals[..., 1]  # (N, 256)
    packed = _pack_bits(bits)
    packed = jnp.where(valid[:, None], packed, jnp.uint32(0))
    return packed, angles
