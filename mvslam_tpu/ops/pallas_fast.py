"""Pallas TPU kernel for the dense FAST-9/16 corner response.

The XLA formulation (``ops.fast.fast_score_map``) materialises 16 rolled
copies of the frame plus a cumsum stack for the arc test — ~40 HBM passes
per frame. This kernel streams the frame once through VMEM in row tiles:
each grid step reads its tile plus the next tile (halo rows), forms the 16
circle taps as shifted in-register views, evaluates the contiguous-arc
test with an unrolled window-AND, and writes one score tile. HBM traffic
drops to ~2 passes (read + write); the VPU does the rest.

Halo handling: Pallas Blocked indexing cannot express overlapping blocks,
so the kernel takes TWO views of the padded image — block ``i`` and block
``i+1`` — and stitches the 2·HALO halo rows from the second view.

Numerics match ``fast_score_map`` to float rounding (same taps, same SAD-
above-threshold score).

Measured on v5e (50-iteration in-program loop, 370x1226 frames): this
kernel runs at 1.19 ms/frame vs 0.87 ms/frame for the XLA formulation —
XLA's fusion of the 16-tap stencil plus cumsum arc test is already near
the HBM roofline, and the kernel's unrolled 144-way window-AND costs more
VPU work than the cumsum trick. It therefore stays **opt-in**
(``FastConfig(use_pallas=True)``) as the template for future fused
detect+describe work rather than the default path.
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
_HALO = 3
_TILE_H = 64
_LANE = 128


def _score_kernel(threshold, cur_ref, nxt_ref, out_ref):
    tile_h = out_ref.shape[0]
    # Working view: this tile plus 2*HALO halo rows from the next block.
    work = jnp.concatenate([cur_ref[:, :], nxt_ref[: 2 * _HALO, :]], axis=0)
    center = work[_HALO : _HALO + tile_h, :]

    brighter = []
    darker = []
    excess_b = jnp.zeros_like(center)
    excess_d = jnp.zeros_like(center)
    lanes = work.shape[1]
    for dy, dx in _CIRCLE:
        rows = work[_HALO + dy : _HALO + dy + tile_h, :]
        # pltpu.roll requires non-negative shifts; -dx mod lanes is equivalent.
        tap = pltpu.roll(rows, (-dx) % lanes, axis=1) if dx else rows
        diff = tap - center
        b = diff > threshold
        d = diff < -threshold
        brighter.append(b)
        darker.append(d)
        mag = jnp.abs(diff) - threshold
        excess_b = excess_b + jnp.where(b, mag, 0.0)
        excess_d = excess_d + jnp.where(d, mag, 0.0)

    def has_arc(masks):
        hit = None
        for start in range(16):
            run = masks[start % 16]
            for k in range(1, _ARC):
                run = jnp.logical_and(run, masks[(start + k) % 16])
            hit = run if hit is None else jnp.logical_or(hit, run)
        return hit

    bright_corner = has_arc(brighter)
    dark_corner = has_arc(darker)
    out_ref[:, :] = jnp.maximum(
        jnp.where(bright_corner, excess_b, 0.0),
        jnp.where(dark_corner, excess_d, 0.0),
    )


@functools.partial(jax.jit, static_argnames=("threshold",))
def fast_score_map_pallas(image: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9 response via the Pallas kernel. image: (H, W) → (H, W)."""
    image = image.astype(jnp.float32)
    h, w = image.shape
    wp = w + (-w % _LANE)
    num_tiles = -(-h // _TILE_H)
    # Rows: HALO top + image + padding so that block num_tiles (the halo
    # view of the last tile) exists: (num_tiles + 1) * TILE_H rows total.
    total_rows = (num_tiles + 1) * _TILE_H
    padded = jnp.pad(image, ((_HALO, total_rows - _HALO - h), (0, wp - w)))

    out = pl.pallas_call(
        functools.partial(_score_kernel, float(threshold)),
        out_shape=jax.ShapeDtypeStruct((num_tiles * _TILE_H, wp), jnp.float32),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((_TILE_H, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_H, wp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_H, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=int(num_tiles * _TILE_H * wp * 250),
            bytes_accessed=int(num_tiles * _TILE_H * wp * 12),
            transcendentals=0,
        ),
    )(padded, padded)
    return out[:h, :w]


def pallas_available() -> bool:
    """True when the default backend runs Mosaic kernels (TPU/axon)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
