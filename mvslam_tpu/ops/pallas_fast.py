"""Pallas TPU kernel for the dense FAST-9/16 corner response.

The XLA formulation (``ops.fast.fast_score_map``) materialises 16 rolled
copies of the frame plus the log-depth arc masks, then runs a separate
``reduce_window`` pass for NMS and an iota pass for the border mask. This
kernel streams the frame once through VMEM in row tiles and produces the
final detection response in ONE pass: the 16 circle taps are shifted
in-register views, the contiguous-arc-of-9 test uses the same log-depth
AND-halving as the XLA path (4 stages instead of the 144-way unrolled
window AND of the first kernel revision), and the 3x3 NMS + border mask
are fused on the score rows while they are still in registers.

Halo handling: Pallas Blocked indexing cannot express overlapping blocks,
so the kernel takes TWO views of the padded image — block ``i`` and block
``i+1`` — and stitches the 2·HALO halo rows from the second view.

Numerics match ``_mask_border(_nms(fast_score_map(x), 1), margin)`` to
float rounding (same taps, same SAD-above-threshold score, same >= NMS
tie rule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# FAST circle of radius 3 (dy, dx), same table as ops.fast.
_CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
_ARC = 9
_HALO = 4  # 3 rows for the FAST circle + 1 row for the 3x3 NMS window
_TILE_H = 64
_LANE = 128


def _roll_lanes(x, dx):
    """Circular lane shift by dx (positive = toward higher lane index)."""
    if dx == 0:
        return x
    return pltpu.roll(x, dx % x.shape[1], axis=1)


def _score_rows(work, row0, rows, threshold):
    """FAST-9 score for ``rows`` rows starting at padded-row ``row0``.

    ``work`` must cover [row0 - 3, row0 + rows + 3). Returns (rows, W).
    """
    center = work[row0 : row0 + rows, :]
    brighter = []
    darker = []
    excess_b = jnp.zeros_like(center)
    excess_d = jnp.zeros_like(center)
    for dy, dx in _CIRCLE:
        tap_rows = work[row0 + dy : row0 + dy + rows, :]
        tap = _roll_lanes(tap_rows, -dx)
        diff = tap - center
        b = diff > threshold
        d = diff < -threshold
        brighter.append(b)
        darker.append(d)
        mag = jnp.abs(diff) - threshold
        excess_b = excess_b + jnp.where(b, mag, 0.0)
        excess_d = excess_d + jnp.where(d, mag, 0.0)

    def has_arc(m):
        # Circular run of 9 via log-depth AND-halving over the 16-entry
        # register list (same trick as ops.fast.fast_score_map:79-90, but
        # the "roll" is free list indexing): m2(i)=m(i)&m(i+1),
        # m4=m2&m2(+2), m8=m4&m4(+4), run-of-9 at i = m8(i)&m(i+8).
        m2 = [m[i] & m[(i + 1) % 16] for i in range(16)]
        m4 = [m2[i] & m2[(i + 2) % 16] for i in range(16)]
        m8 = [m4[i] & m4[(i + 4) % 16] for i in range(16)]
        m9 = [m8[i] & m[(i + 8) % 16] for i in range(16)]
        hit = m9[0]
        for i in range(1, 16):
            hit = hit | m9[i]
        return hit

    bright_corner = has_arc(brighter)
    dark_corner = has_arc(darker)
    return jnp.maximum(
        jnp.where(bright_corner, excess_b, 0.0),
        jnp.where(dark_corner, excess_d, 0.0),
    )


def _detect_kernel(threshold, h, w, margin, cur_ref, nxt_ref, out_ref, raw_ref):
    tile_h = out_ref.shape[0]
    # Working view: this tile plus 2*HALO halo rows from the next block.
    work = jnp.concatenate([cur_ref[:, :], nxt_ref[: 2 * _HALO, :]], axis=0)
    # Scores for the tile rows plus one NMS halo row on each side:
    # padded rows [tile_start + HALO - 1, tile_start + HALO + tile_h + 1).
    score_ext = _score_rows(work, _HALO - 1, tile_h + 2, threshold)

    # 3x3 NMS on the centre rows while everything is in registers.
    rows3 = jnp.maximum(
        jnp.maximum(score_ext[0:tile_h, :], score_ext[1 : tile_h + 1, :]),
        score_ext[2 : tile_h + 2, :],
    )
    pooled = jnp.maximum(
        jnp.maximum(_roll_lanes(rows3, -1), rows3), _roll_lanes(rows3, 1)
    )
    score = score_ext[1 : tile_h + 1, :]
    raw_ref[:, :] = score  # pre-NMS response for subpixel peak refinement
    score = jnp.where(score >= pooled, score, 0.0)

    # Border mask with GLOBAL row coordinates (margin also suppresses the
    # circular lane-roll wraparound at the left/right image edges).
    tile = pl.program_id(0)
    ys = tile * tile_h + jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    keep = (ys >= margin) & (ys < h - margin) & (xs >= margin) & (xs < w - margin)
    out_ref[:, :] = jnp.where(keep, score, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold", "margin"))
def fast_detect_pallas(image: jnp.ndarray, threshold: float, margin: int = 19):
    """Fused FAST-9 response + 3x3 NMS + border mask in one HBM pass.

    image: (H, W) → ``(detections, raw)`` float32 (H, W) maps. ``detections``
    equals ``_mask_border(_nms(fast_score_map(image, threshold), 1), margin)``
    for ``margin >= 4``: the kernel pads with zeros where the XLA
    formulation's ``jnp.roll`` wraps circularly, and the border mask only
    hides that difference once it covers the circle taps (radius 3) plus
    the NMS pool. The dispatch in ``ops.fast.detect_keypoints`` falls back
    to XLA for smaller margins. ``raw`` is the pre-NMS response used for
    subpixel peak refinement.
    """
    image = image.astype(jnp.float32)
    h, w = image.shape
    wp = w + (-w % _LANE)
    num_tiles = -(-h // _TILE_H)
    total_rows = (num_tiles + 1) * _TILE_H
    padded = jnp.pad(image, ((_HALO, total_rows - _HALO - h), (0, wp - w)))

    out, raw = pl.pallas_call(
        functools.partial(_detect_kernel, float(threshold), h, w, int(margin)),
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles * _TILE_H, wp), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * _TILE_H, wp), jnp.float32),
        ],
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((_TILE_H, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_H, wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_H, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_H, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(num_tiles * _TILE_H * wp * 180),
            bytes_accessed=int(num_tiles * _TILE_H * wp * 16),
            transcendentals=0,
        ),
    )(padded, padded)
    return out[:h, :w], raw[:h, :w]
