"""Oriented BRIEF (rBRIEF-style) descriptors as patch-matmul MXU kernels.

Replaces the cv2 ORB description stage (``feature_pipeline.py.bak:64-77``).

TPU redesign rationale: per-pixel gathers are the slowest primitive on the
chip (measured ~17 ms/frame for naive per-point sampling), while matmuls
are nearly free. So description is reformulated as **one patch extraction
+ one matmul**:

1. one 31x31 patch per keypoint via vmapped ``lax.dynamic_slice``
   (contiguous rows — the only gather-ish op left);
2. intensity-centroid orientation = ``patches @ moment_vectors`` (961x2);
3. steering is quantised to 32 discrete angles; for every bin the 256
   comparisons ``I(p2) − I(p1)`` become a static ±1 one-hot bank, so ALL
   bins for ALL keypoints are ``patches (N,961) @ bank (961, 32·256)`` on
   the systolic array, and each keypoint selects its bin's 256 columns;
4. sign → bits → packed ``(N, 8)`` uint32 words.

The sampling pattern is a fixed-seed Gaussian (σ = patch/5, BRIEF's
recommended distribution) constrained to the radius-14 disk so every
rotation stays inside the patch. Deterministic across runs/platforms.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 15
PATCH_SIZE = 2 * PATCH_RADIUS + 1  # 31 (logical patch)
# Patches are carried as 32x32 tiles: the 31x31 logical patch plus one
# dead row/column of adjacent image pixels. Bank/moment rows at the dead
# positions are zero, so results are identical to 31x31 extraction — but
# the tile is lane-aligned (32*32 = 8*128), which removes a slice+copy
# after the Pallas DMA kernel and lets the MXU tile the K dimension
# exactly (961 would be padded to 1024 internally anyway).
PATCH_DIM = 32
PATCH_PIXELS = PATCH_DIM * PATCH_DIM  # 1024
NUM_PAIRS = 256
NUM_ANGLE_BINS = 32
_PATTERN_SEED = 0x5EED
_MAX_OFFSET_NORM = 14.0  # rotations stay inside the 31x31 patch


def _make_pattern() -> np.ndarray:
    """(NUM_PAIRS, 2, 2) float: pairs of (dx, dy) offsets within the disk."""
    rng = np.random.default_rng(_PATTERN_SEED)
    sigma = PATCH_RADIUS / 5.0 * 2.0
    pts = rng.normal(0.0, sigma, size=(NUM_PAIRS, 2, 2))
    norms = np.linalg.norm(pts, axis=-1, keepdims=True)
    over = norms > _MAX_OFFSET_NORM
    pts = np.where(over, pts * (_MAX_OFFSET_NORM / np.maximum(norms, 1e-9)), pts)
    return pts


_PATTERN = _make_pattern()

# Moment vectors over the circular radius-15 patch (for orientation),
# embedded in the 32x32 tile (dead row/col weights are zero).
_cy, _cx = np.mgrid[-PATCH_RADIUS : PATCH_RADIUS + 1, -PATCH_RADIUS : PATCH_RADIUS + 1]
_circle = ((_cx**2 + _cy**2) <= PATCH_RADIUS**2).astype(np.float32)
_MOMENTS = np.zeros((PATCH_DIM, PATCH_DIM, 2), dtype=np.float32)
_MOMENTS[:PATCH_SIZE, :PATCH_SIZE, 0] = _cx * _circle
_MOMENTS[:PATCH_SIZE, :PATCH_SIZE, 1] = _cy * _circle
_MOMENTS = _MOMENTS.reshape(PATCH_PIXELS, 2)  # → m10, m01


def _build_comparison_bank() -> np.ndarray:
    """(961, NUM_ANGLE_BINS * NUM_PAIRS) ±1 bank: column (b, j) computes
    I(p2_j rotated by angle_b) − I(p1_j rotated by angle_b)."""
    bank = np.zeros((PATCH_PIXELS, NUM_ANGLE_BINS, NUM_PAIRS), dtype=np.float32)
    for b in range(NUM_ANGLE_BINS):
        ang = 2.0 * np.pi * b / NUM_ANGLE_BINS
        c, s = np.cos(ang), np.sin(ang)
        rot = np.stack([c * _PATTERN[..., 0] - s * _PATTERN[..., 1],
                        s * _PATTERN[..., 0] + c * _PATTERN[..., 1]], axis=-1)
        ri = np.clip(np.round(rot), -PATCH_RADIUS, PATCH_RADIUS).astype(np.int64)
        for j in range(NUM_PAIRS):
            x1, y1 = ri[j, 0]
            x2, y2 = ri[j, 1]
            idx1 = (y1 + PATCH_RADIUS) * PATCH_DIM + (x1 + PATCH_RADIUS)
            idx2 = (y2 + PATCH_RADIUS) * PATCH_DIM + (x2 + PATCH_RADIUS)
            bank[idx2, b, j] += 1.0
            bank[idx1, b, j] -= 1.0
    return bank.reshape(PATCH_PIXELS, NUM_ANGLE_BINS * NUM_PAIRS)


_COMPARISON_BANK = _build_comparison_bank()


@dataclass(frozen=True)
class BriefConfig:
    blur_sigma: float = 2.0
    blur_radius: int = 4


def extract_patches(image: jnp.ndarray, xy: jnp.ndarray, out_dtype=None) -> jnp.ndarray:
    """(N, 1024) flattened 32x32 tiles around integer keypoint locations
    (31x31 logical patch + one dead row/col zeroed out by the bank).

    ``lax.dynamic_slice`` clamps starts near borders; detection's border
    margin keeps real keypoints fully interior, so clamping only affects
    masked padding slots.

    On TPU this dispatches to the Pallas DMA-pipeline kernel
    (``ops.pallas_patches``): XLA serialises the N dynamic slices at
    ~1.1 µs each (2.23 ms/frame at N=2048) where the kernel overlaps the
    copies — bit-identical output. ``MVSLAM_PALLAS_PATCHES=0`` forces
    the XLA path.
    """
    # The Mosaic kernel's in-register roll is 32-bit-only; integer frames
    # (uint8 PNG decode output) take the XLA path below, which handles any
    # dtype (casting to f32 here would NOT be bit-identical for the
    # out_dtype=None contract).
    if _use_pallas_patches() and image.dtype.itemsize == 4:
        from mvslam_tpu.ops.pallas_patches import extract_patches_pallas

        return extract_patches_pallas(image, xy, out_dtype=out_dtype)
    h, w = image.shape
    # round() not trunc: subpixel-refined coordinates must anchor the
    # patch on the nearest pixel (identical for integer inputs).
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - PATCH_RADIUS, 0, w - PATCH_DIM)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - PATCH_RADIUS, 0, h - PATCH_DIM)

    def one(yy, xx):
        return jax.lax.dynamic_slice(image, (yy, xx), (PATCH_DIM, PATCH_DIM))

    patches = jax.vmap(one)(yi, xi)
    if out_dtype is not None:
        patches = patches.astype(out_dtype)
    return patches.reshape(xy.shape[0], PATCH_PIXELS)


def _use_pallas_patches() -> bool:
    """Trace-time dispatch: Mosaic kernel on TPU backends only."""
    import os

    override = os.environ.get("MVSLAM_PALLAS_PATCHES")
    if override is not None:
        return override not in ("", "0", "false")
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def orientations_from_patches(patches: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle per patch: atan2(m01, m10)."""
    m = jax.lax.dot_general(
        patches.astype(jnp.bfloat16),
        jnp.asarray(_MOMENTS, jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    angle = jnp.arctan2(m[:, 1], m[:, 0])
    return jnp.where(valid, angle, 0.0)


def compute_orientations(image: jnp.ndarray, xy: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Standalone orientation API (re-extracts patches)."""
    return orientations_from_patches(extract_patches(image, xy), valid)


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

    image: (H, W) float32 **already blurred** by the caller. Returns
    ``(descriptors (N, 8) uint32, angles (N,) float32)``. Invalid slots
    hold zero descriptors.
    """
    # bf16 patches: both consumers (moment matmul, comparison-bank matmul)
    # cast to bf16 anyway, so narrowing at extraction is bit-identical and
    # halves the (N, 961) patch buffer's HBM traffic; on TPU the Pallas
    # kernel emits bf16 directly (conversion after the 32-bit roll).
    patches = extract_patches(image, xy, out_dtype=jnp.bfloat16)  # (N, 961)
    angles = orientations_from_patches(patches, valid)
    # Quantise the steering angle to one of NUM_ANGLE_BINS rotations.
    two_pi = 2.0 * jnp.pi
    frac = jnp.mod(angles, two_pi) / two_pi
    bins = jnp.clip(
        jnp.round(frac * NUM_ANGLE_BINS).astype(jnp.int32) % NUM_ANGLE_BINS,
        0,
        NUM_ANGLE_BINS - 1,
    )
    # All comparisons for all bins in ONE matmul on the MXU. bf16 output:
    # only the SIGN of each comparison survives into the descriptor, and
    # ±1-bank sums of 8-bit intensities sit far from bf16 rounding ties —
    # while the f32 response tensor (N, 32·256) is the largest buffer in
    # the tracking program (1 GB per 16-frame window at N=2048), so
    # halving it is pure HBM-bandwidth win.
    resp = jax.lax.dot_general(
        patches.astype(jnp.bfloat16),
        jnp.asarray(_COMPARISON_BANK, jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.bfloat16,
        precision=jax.lax.Precision.DEFAULT,
    )  # (N, 32*256) bf16
    resp = resp.reshape(xy.shape[0], NUM_ANGLE_BINS, NUM_PAIRS)
    chosen = jnp.take_along_axis(resp, bins[:, None, None], axis=1)[:, 0, :]
    bits = chosen > 0.0
    packed = _pack_bits(bits)
    packed = jnp.where(valid[:, None], packed, jnp.uint32(0))
    return packed, angles
