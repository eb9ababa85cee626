"""FAST-9/16 corner detection as a fixed-shape, fully-vectorised TPU op.

Replaces the cv2.ORB_create detection stage used by the reference
(``feature_pipeline.py.bak:64-77``). Instead of a per-keypoint dynamic
list, detection is formulated as dense per-pixel work over the whole frame
(VPU-friendly: 16 shifted comparisons + windowed arc test), 3x3
non-maximum suppression via max-pooling, and a static **top-K selection**
(optionally per-grid-cell for spatial spread) yielding a padded
``(N, 2)`` keypoint array with a validity mask — the static-shape contract
every downstream kernel (BRIEF, matcher, RANSAC) relies on.

Scores use the standard SAD-above-threshold corner response
(sum of |p_i - c| - t over contributing arc pixels), the same ranking used
by GPU FAST implementations.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# FAST circle of radius 3: 16 (dy, dx) offsets, clockwise from 12 o'clock.
_CIRCLE = np.asarray(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3),
        (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

_ARC_LENGTH = 9  # FAST-9 (the AND-shift chain in ``has_arc`` is built for 9)


@dataclass(frozen=True)
class FastConfig:
    threshold: float = 20.0
    nms_radius: int = 1  # 3x3 NMS window
    border_margin: int = 19  # keep clear of the 31px BRIEF patch + blur
    grid_cells: int = 0  # 0 = global top-K; else GxG cell-balanced selection
    # Fused Pallas detect kernel (score+NMS+border in one VMEM pass,
    # measured 1.6x over XLA on v5e — see pallas_fast.py). None = auto
    # (on for TPU backends, off elsewhere); True/False force it.
    use_pallas: bool | None = None
    # Quadratic subpixel peak refinement on the raw score map. Integer
    # corner positions carry ~0.5 px quantisation noise that dominates
    # window-BA corrections and triangulation at small baselines; the
    # 3-point parabola fit recovers most of it for free (two gathers).
    subpixel: bool = True
    # Per-cell candidate selection kernel: None = auto (approx_max_k on
    # TPU, exact top_k elsewhere); True/False force it. Forcing lets CPU
    # tests exercise the TPU selection path (approx_max_k has a reference
    # lowering on every backend).
    approx_select: bool | None = None


def _circle_stack(image: jnp.ndarray) -> jnp.ndarray:
    """(16, H, W) stack of the image shifted so index i holds circle pixel i."""
    shifted = [jnp.roll(image, shift=(-int(dy), -int(dx)), axis=(-2, -1)) for dy, dx in _CIRCLE]
    return jnp.stack(shifted, axis=0)


def fast_score_map(image: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9 corner response over an (H, W) image.

    Returns (H, W) float32 scores; 0 where the arc test fails. Integer
    images with an integral threshold take an int16 path — identical
    scores (|diff| ≤ 255 and 16-term sums ≤ 3760 are exact in both), at
    half the HBM traffic of the f32 shifted-stack (the score map is
    bandwidth-bound).
    """
    # The int16 path is exact only for 8-bit sample ranges (|diff| <= 255,
    # 16-term sums <= 3760); wider integer types (e.g. uint16 IR frames)
    # would wrap, so they take the float path.
    if image.dtype in (jnp.uint8, jnp.int8) and float(threshold).is_integer():
        t = jnp.int16(int(threshold))
        img = image.astype(jnp.int16)
    else:
        t = jnp.float32(threshold)
        img = image.astype(jnp.float32)
    circle = _circle_stack(img)  # (16, H, W)
    diff = circle - img[None]
    brighter = diff > t
    darker = diff < -t

    def has_arc(mask: jnp.ndarray) -> jnp.ndarray:
        # Circular run of _ARC_LENGTH=9 consecutive Trues via log-depth
        # AND-shift halving on the circular (16, H, W) bool stack:
        # m2(i)=m(i)&m(i+1), m4=m2&m2(+2), m8=m4&m4(+4), and a run of 9
        # starting at i is m8(i)&m(i+8). jnp.roll wraps, giving the
        # circular window for free. 4 boolean passes replace the previous
        # 24-step sequential cumsum (the score map is HBM-bound).
        m2 = mask & jnp.roll(mask, -1, axis=0)
        m4 = m2 & jnp.roll(m2, -2, axis=0)
        m8 = m4 & jnp.roll(m4, -4, axis=0)
        m9 = m8 & jnp.roll(mask, -8, axis=0)
        return jnp.any(m9, axis=0)

    is_bright_corner = has_arc(brighter)
    is_dark_corner = has_arc(darker)
    is_corner = is_bright_corner | is_dark_corner

    excess = jnp.abs(diff) - t
    zero = jnp.zeros((), dtype=excess.dtype)
    bright_score = jnp.sum(jnp.where(brighter, excess, zero), axis=0, dtype=jnp.float32)
    dark_score = jnp.sum(jnp.where(darker, excess, zero), axis=0, dtype=jnp.float32)
    score = jnp.maximum(
        jnp.where(is_bright_corner, bright_score, 0.0),
        jnp.where(is_dark_corner, dark_score, 0.0),
    )
    return jnp.where(is_corner, score, 0.0)


def _nms(score: jnp.ndarray, radius: int) -> jnp.ndarray:
    window = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        score,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(window, window),
        window_strides=(1, 1),
        padding="SAME",
    )
    return jnp.where(score >= pooled, score, 0.0)


def _mask_border(score: jnp.ndarray, margin: int) -> jnp.ndarray:
    h, w = score.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    keep = (ys >= margin) & (ys < h - margin) & (xs >= margin) & (xs < w - margin)
    return jnp.where(keep, score, 0.0)


def _grid_topk(
    score: jnp.ndarray,
    num_keypoints: int,
    cells: int,
    approx_select: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cell-balanced candidate selection: top-(k/cell) per cell, then a
    global top-K over the union. Keeps features spread across the frame
    (the role of cv2 ORB's quadtree distribution)."""
    h, w = score.shape
    ch = -(-h // cells)
    cw = -(-w // cells)
    padded = jnp.pad(score, ((0, ch * cells - h), (0, cw * cells - w)))
    tiles = padded.reshape(cells, ch, cells, cw).transpose(0, 2, 1, 3).reshape(cells * cells, ch * cw)
    per_cell = max(1, -(-num_keypoints // (cells * cells)) * 2)
    per_cell = min(per_cell, ch * cw)
    use_approx = (
        approx_select
        if approx_select is not None
        else jax.default_backend() == "tpu"
    )
    if use_approx and per_cell < ch * cw:
        # TPU's exact top_k lowers to a full per-cell sort (profiled at
        # ~0.33 ms/frame, the #2 op in the tracking program); the
        # bucketed approx_max_k kernel is ~10x cheaper. Missing a few of
        # the weakest per-cell candidates only perturbs the padded tail
        # of the 2x-overfetched candidate pool.
        cell_scores, cell_idx = jax.lax.approx_max_k(
            tiles, per_cell, recall_target=0.95
        )
    else:
        cell_scores, cell_idx = jax.lax.top_k(tiles, per_cell)  # (C², per_cell)
    # Recover global pixel coordinates of each candidate.
    cell_ids = jax.lax.broadcasted_iota(jnp.int32, cell_scores.shape, 0)
    cy = cell_ids // cells
    cx = cell_ids % cells
    py = cell_idx // cw
    px = cell_idx % cw
    ys = cy * ch + py
    xs = cx * cw + px
    flat_scores = cell_scores.reshape(-1)
    flat_lin = (ys * w + xs).reshape(-1)
    # Out-of-bounds padding cells produce score 0; fine (masked later).
    top_scores, pick = jax.lax.top_k(flat_scores, min(num_keypoints, flat_scores.shape[0]))
    lin = flat_lin[pick]
    return top_scores, lin


@partial(jax.jit, static_argnames=("num_keypoints", "config"))
def detect_keypoints(
    image: jnp.ndarray,
    num_keypoints: int = 1024,
    config: FastConfig = FastConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Detect FAST corners with static output shapes.

    Returns ``(xy, scores, valid)``: xy (N, 2) float32 as (x, y) pixel
    coordinates, scores (N,), valid (N,) bool. Invalid slots hold (0, 0)
    with score 0. vmap over a leading frame axis for batched detection.
    """
    use_pallas = (
        config.use_pallas
        if config.use_pallas is not None
        else jax.default_backend() == "tpu"
    )
    # margin >= 4: the kernel's zero halo only matches XLA's circular
    # jnp.roll wraparound when the border mask kills every pixel whose
    # circle taps (radius 3) or NMS pool could touch the wrap seam.
    if use_pallas and config.nms_radius == 1 and config.border_margin >= 4:
        # Fused score + 3x3 NMS + border mask in one VMEM pass (see
        # ops/pallas_fast.py for the measured comparison vs XLA).
        from mvslam_tpu.ops.pallas_fast import fast_detect_pallas

        score, raw = fast_detect_pallas(
            image, float(config.threshold), margin=config.border_margin
        )
    else:
        raw = fast_score_map(image, config.threshold)
        score = _nms(raw, config.nms_radius)
        score = _mask_border(score, config.border_margin)
    h, w = score.shape
    if config.grid_cells > 1:
        top_scores, lin = _grid_topk(
            score, num_keypoints, config.grid_cells, config.approx_select
        )
        if top_scores.shape[0] < num_keypoints:
            pad = num_keypoints - top_scores.shape[0]
            top_scores = jnp.pad(top_scores, (0, pad))
            lin = jnp.pad(lin, (0, pad))
    else:
        flat = score.reshape(-1)
        top_scores, lin = jax.lax.top_k(flat, num_keypoints)
    ys = (lin // w).astype(jnp.float32)
    xs = (lin % w).astype(jnp.float32)
    valid = top_scores > 0.0
    xy = jnp.stack([xs, ys], axis=-1)
    if config.subpixel:
        # 3-point parabola peak on the RAW (pre-NMS) response: the NMS'd
        # map zeroes a peak's neighbours, so it cannot be used here. The
        # border margin keeps every selected peak's 4-neighbourhood in
        # bounds; lin is clamped so invalid (padded) slots stay in range.
        raw_flat = raw.reshape(-1).astype(jnp.float32)
        lin_c = jnp.clip(lin, w + 1, h * w - w - 2)

        def _offset(minus, centre, plus):
            denom = minus - 2.0 * centre + plus
            off = jnp.where(
                jnp.abs(denom) > 1e-6, 0.5 * (minus - plus) / denom, 0.0
            )
            return jnp.clip(off, -0.5, 0.5)

        dx = _offset(raw_flat[lin_c - 1], raw_flat[lin_c], raw_flat[lin_c + 1])
        dy = _offset(raw_flat[lin_c - w], raw_flat[lin_c], raw_flat[lin_c + w])
        xy = xy + jnp.stack([dx, dy], axis=-1)
    xy = jnp.where(valid[:, None], xy, 0.0)
    return xy, jnp.where(valid, top_scores, 0.0), valid
