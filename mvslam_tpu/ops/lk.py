"""Pyramidal Lucas-Kanade optical flow as batched fixed-shape TPU ops.

Parity: the reference's offline demo tracks with cv2.calcOpticalFlowPyrLK
first and falls back to feature matching
(``visual_slam_offline_entry_point.py:36-55, 484-539``). This module is
the TPU-native counterpart: all N points advance together through K
static Gauss-Newton iterations per pyramid level — no per-point Python,
no dynamic shapes.

Design: each iteration needs an image window at a *sub-pixel* location.
Gathers are the slow primitive on TPU, so windows ride the same
DMA-pipelined 32x32 patch extractor as BRIEF (``ops.brief`` /
``ops.pallas_patches``): the tile is fetched at the integer corner and
the fractional part is applied in-register as a 4-tap bilinear blend of
statically shifted slices. The 2x2 normal systems for all points solve
in closed form.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from mvslam_tpu.ops.brief import PATCH_RADIUS, extract_patches
from mvslam_tpu.ops.image import downsample2

_WIN = 21  # LK window (cv2 default 21x21)
_TILE = 32


@dataclass(frozen=True)
class LKConfig:
    num_levels: int = 3
    iterations: int = 8
    min_determinant: float = 1e-4
    max_residual: float = 25.0  # mean |dI| gate for a converged track
    # KLT assumes locally linear intensity; pre-smoothing widens the
    # convergence basin on high-frequency texture (cv2 relies on natural
    # image smoothness). 0 disables.
    blur_sigma: float = 1.5
    window: int = _WIN  # fixed; part of the config for reporting


def _bilinear_windows(image: jnp.ndarray, pts: jnp.ndarray, pad: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, _WIN+2·pad, _WIN+2·pad) windows at sub-pixel centers ``pts``.

    The window's integer corner is floor(p) - (_WIN//2 + pad), so the
    central _WIN×_WIN block stays centered on p for any ``pad``; the
    fractional part is applied by blending the four statically shifted
    views of the 32x32 tile. Returns (windows, in_bounds mask).
    """
    h, w = image.shape
    half = _WIN // 2 + pad
    fx = pts[:, 0] - jnp.floor(pts[:, 0])
    fy = pts[:, 1] - jnp.floor(pts[:, 1])
    # extract_patches starts at int(x') - PATCH_RADIUS; pass
    # x' = floor(x) + (PATCH_RADIUS - half) so the corner is floor(x)-half.
    shift = float(PATCH_RADIUS - half)
    xy = jnp.stack([jnp.floor(pts[:, 0]) + shift, jnp.floor(pts[:, 1]) + shift], axis=-1)
    tiles = extract_patches(image, xy).reshape(-1, _TILE, _TILE)

    size = _WIN + 2 * pad
    t00 = tiles[:, :size, :size]
    t01 = tiles[:, :size, 1 : size + 1]
    t10 = tiles[:, 1 : size + 1, :size]
    t11 = tiles[:, 1 : size + 1, 1 : size + 1]
    wx = fx[:, None, None]
    wy = fy[:, None, None]
    win = (
        (1.0 - wy) * (1.0 - wx) * t00
        + (1.0 - wy) * wx * t01
        + wy * (1.0 - wx) * t10
        + wy * wx * t11
    )
    # Bounds: extract_patches clamps the FULL 32px tile into the image,
    # so the mask must require the whole tile in bounds — a looser check
    # on just the sampled square would accept silently shifted windows
    # for points within ~10-30 px of the right/bottom borders.
    x0 = jnp.floor(pts[:, 0]) - half
    y0 = jnp.floor(pts[:, 1]) - half
    ok = (x0 >= 0) & (y0 >= 0) & (x0 + _TILE <= w) & (y0 + _TILE <= h)
    return win, ok


def _lk_level(prev_img, next_img, pts_prev, guess, config: LKConfig):
    """One pyramid level: static GN iterations for all points at once."""
    # Template window + spatial gradients (central differences) at the
    # PREV location: extract with one extra row/col so the 21x21 gradient
    # window uses in-tile neighbors.
    tw, ok_prev = _bilinear_windows(prev_img, pts_prev, pad=1)
    template = tw[:, 1:-1, 1:-1]  # (N, 21, 21)
    ix = 0.5 * (tw[:, 1:-1, 2:] - tw[:, 1:-1, :-2])
    iy = 0.5 * (tw[:, 2:, 1:-1] - tw[:, :-2, 1:-1])
    gxx = jnp.sum(ix * ix, axis=(1, 2))
    gxy = jnp.sum(ix * iy, axis=(1, 2))
    gyy = jnp.sum(iy * iy, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    solvable = det > config.min_determinant
    det_safe = jnp.where(solvable, det, 1.0)

    def body(carry, _):
        d = carry
        win, ok = _bilinear_windows(next_img, pts_prev + d, pad=0)
        di = win - template
        bx = jnp.sum(di * ix, axis=(1, 2))
        by = jnp.sum(di * iy, axis=(1, 2))
        # 2x2 solve: G @ step = -b
        sx = -(gyy * bx - gxy * by) / det_safe
        sy = -(-gxy * bx + gxx * by) / det_safe
        step = jnp.stack([sx, sy], axis=-1)
        # ok_prev gates the step too: a border-clamped template is silently
        # SHIFTED, and refining against it converges d toward the shifted
        # content — doubling the error per pyramid level for points in the
        # border band. Such points must keep their guess (valid=False at
        # the end regardless).
        step = jnp.where((solvable & ok & ok_prev)[:, None], step, 0.0)
        return d + step, None

    d, _ = jax.lax.scan(body, guess, None, length=config.iterations)
    win, ok = _bilinear_windows(next_img, pts_prev + d, pad=0)
    residual = jnp.mean(jnp.abs(win - template), axis=(1, 2))
    valid = solvable & ok & ok_prev & (residual <= config.max_residual)
    return d, residual, valid


@partial(jax.jit, static_argnames=("config",))
def lk_track(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    config: LKConfig = LKConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Track ``pts`` (N, 2) from ``prev_img`` to ``next_img``.

    Returns ``(next_pts (N, 2), residuals (N,), valid (N,))`` — the
    fixed-shape analog of cv2.calcOpticalFlowPyrLK's (nextPts, status,
    err). Invalid input slots (``mask`` False) stay invalid.
    """
    prev_img = prev_img.astype(jnp.float32)
    next_img = next_img.astype(jnp.float32)
    if config.blur_sigma > 0:
        from mvslam_tpu.ops.image import gaussian_blur

        prev_img = gaussian_blur(prev_img, sigma=config.blur_sigma, radius=2)
        next_img = gaussian_blur(next_img, sigma=config.blur_sigma, radius=2)

    # Static pyramid (coarse to fine).
    prevs, nexts = [prev_img], [next_img]
    for _ in range(config.num_levels - 1):
        if min(prevs[-1].shape) < 2 * _TILE:
            break
        prevs.append(downsample2(prevs[-1]))
        nexts.append(downsample2(nexts[-1]))

    d = jnp.zeros_like(pts)
    residual = jnp.zeros(pts.shape[0], dtype=jnp.float32)
    lv_valid = jnp.ones(pts.shape[0], dtype=bool)
    for level in reversed(range(len(prevs))):
        scale = float(2**level)
        # Coarse levels only refine the displacement guess (a point whose
        # coarse window leaves the shrunken image keeps its guess — same
        # as cv2); validity comes from the finest level alone.
        d, residual, lv_valid = _lk_level(
            prevs[level], nexts[level], pts / scale, d, config
        )
        d = d * 2.0 if level > 0 else d
    valid = lv_valid
    # d at this point is the full-resolution displacement.
    next_pts = pts + d
    h, w = next_img.shape
    inside = (
        (next_pts[:, 0] >= 0)
        & (next_pts[:, 0] <= w - 1)
        & (next_pts[:, 1] >= 0)
        & (next_pts[:, 1] <= h - 1)
    )
    valid = valid & inside & mask
    return next_pts, residual, valid
