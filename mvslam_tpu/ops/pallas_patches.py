"""Pallas patch-extraction kernel: pipelined DMA around scattered keypoints.

XLA lowers a batch of 2048 ``dynamic_slice`` ops to a sequential loop at
~1.1 µs per slice (measured 2.23 ms/frame — shape, dtype and alignment of
the slice make no difference, it is pure per-slice dispatch overhead). This
kernel instead keeps the image in compiler-chosen memory, scalar-prefetches
the keypoint coordinates, and keeps a ``DEPTH``-deep rolling window of
async DMA copies in flight, hiding each copy's latency behind the previous
patch's shift/trim. Measured ~3x over XLA, with bit-identical output.

Mosaic constraints shape the design:
- DMA slice starts/shapes must be tile-aligned (8 sublanes x 128 lanes for
  f32) and *provably* so — hence tile indices are passed (y//align,
  x//128) and multiplied back inside the kernel, and the copy grabs an
  aligned slab that always covers the 32x32 output tile.
- The sub-tile offset is applied in-register with ``pltpu.roll`` (dynamic
  rotate, 32-bit dtypes only), then trimmed to the output window; the
  output may be narrowed (bf16) in-register.
- Scalar-prefetch SMEM is ~1 MB; all four per-keypoint fields are packed
  into one int32 (tile_y:12 | tile_x:8 | y_in_tile:4 | x%128:7); sublane
  alignment (and so slab geometry) depends on dtype — 8 rows for f32,
  16 for bf16.

Parity: reference ``feature_pipeline.py.bak`` samples BRIEF pixels with
cv2; this is the TPU substrate for ``ops.brief.extract_patches``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_SIZE = 31
_CHUNK = 256  # keypoints per grid step
_DEPTH = 16  # DMA pipeline depth (measured best among 8/16/32)
_SLAB_W = 256  # lanes: 128-aligned start + 32 patch cols <= 256
_OUT_H, _OUT_W = 32, 32


def _geometry(dtype):
    """(y_align, slab_h) per dtype: DMA row starts must be sublane-tile
    aligned and the slab must cover the max in-tile offset plus the
    32-row output window. Only 32-bit image dtypes are supported: the
    in-register ``pltpu.roll`` below is 32-bit-only, so a bf16 IMAGE
    (as opposed to bf16 *output* narrowing, which converts after the
    roll) would miscompile in Mosaic."""
    if jnp.dtype(dtype).itemsize != 4:
        raise ValueError(
            f"extract_patches_pallas requires a 32-bit image dtype, got {dtype}; "
            "use out_dtype for bf16 narrowing of the patches instead"
        )
    return 8, 40


def _pack_starts(image_hw, xy, y_align):
    """Clamped patch starts packed into one int32 per keypoint:
    y_tile:12 | x_tile:8 | y_in_tile:4 | x_in_tile:7."""
    h, w = image_hw
    radius = PATCH_SIZE // 2
    # Identical clamping to the XLA path: starts clipped so the full
    # 32x32 output tile stays inside the image.
    # round() not trunc: subpixel-refined coordinates must anchor the
    # patch on the nearest pixel (identical for integer inputs).
    yi = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32) - radius, 0, h - _OUT_H)
    xi = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32) - radius, 0, w - _OUT_W)
    return (
        ((yi // y_align) << 19)
        | ((xi // 128) << 11)
        | ((yi % y_align) << 7)
        | (xi % 128)
    )


def _pad_image(image, y_align, slab_h):
    # Aligned slabs can overhang the image by <slab_h rows / <256 lanes.
    h, w = image.shape[-2], image.shape[-1]
    pad_h = (-h) % y_align + slab_h
    pad_w = (-w) % 128 + _SLAB_W
    cfg = [(0, 0)] * (image.ndim - 2) + [(0, pad_h), (0, pad_w)]
    return jnp.pad(image, cfg)


def extract_patches_pallas(
    image: jnp.ndarray, xy: jnp.ndarray, *, out_dtype=None, interpret: bool = False
) -> jnp.ndarray:
    """(N, 1024) flattened 32x32 patch tiles at integer keypoint locations.

    Exact drop-in for the XLA path in ``ops.brief.extract_patches``
    (including its border clamp semantics). ``interpret=True`` runs the
    Mosaic interpreter — used by CPU tests. Under ``vmap`` the custom
    batching rule routes the whole frame window into ONE pallas_call over
    a (frames, chunks) grid rather than the per-frame device loop vmap
    lowering would emit.
    """
    if interpret:
        return _extract_batched(image[None], xy[None], out_dtype=out_dtype, interpret=True)[0]
    if out_dtype is None or out_dtype == image.dtype:
        return _extract_vmappable(image, xy)
    if out_dtype != jnp.bfloat16:
        raise ValueError("only bf16 output narrowing is supported")
    return _extract_vmappable_narrow(image, xy)


def _broadcast_unbatched(axis_size, in_batched, image, xy):
    image_batched, xy_batched = in_batched
    if not image_batched:
        image = jnp.broadcast_to(image[None], (axis_size, *image.shape))
    if not xy_batched:
        xy = jnp.broadcast_to(xy[None], (axis_size, *xy.shape))
    return image, xy


@jax.custom_batching.custom_vmap
def _extract_vmappable(image, xy):
    return _extract_batched(image[None], xy[None])[0]


@_extract_vmappable.def_vmap
def _extract_vmap_rule(axis_size, in_batched, image, xy):
    image, xy = _broadcast_unbatched(axis_size, in_batched, image, xy)
    return _extract_batched(image, xy), True


@jax.custom_batching.custom_vmap
def _extract_vmappable_narrow(image, xy):
    return _extract_batched(image[None], xy[None], out_dtype=jnp.bfloat16)[0]


@_extract_vmappable_narrow.def_vmap
def _extract_vmap_rule_narrow(axis_size, in_batched, image, xy):
    image, xy = _broadcast_unbatched(axis_size, in_batched, image, xy)
    return _extract_batched(image, xy, out_dtype=jnp.bfloat16), True


def _extract_batched(
    image: jnp.ndarray, xy: jnp.ndarray, out_dtype=None, interpret: bool = False
) -> jnp.ndarray:
    """(B, N, 1024) patches with ONE pallas_call over a (B, chunks) grid.

    The single-frame path is the B=1 special case of this kernel — one
    implementation serves both (a previous split version required
    bit-layout edits in two kernels in lockstep).
    """
    b, h, w = image.shape
    n = xy.shape[1]
    out_dtype = out_dtype or image.dtype
    y_align, slab_h = _geometry(image.dtype)
    padded = _pad_image(image, y_align, slab_h)
    packed = _pack_starts((h, w), xy, y_align)  # (B, N)
    num_chunks = -(-n // _CHUNK)
    total = num_chunks * _CHUNK
    if total != n:
        # Repeat the last keypoint into the tail slots; trimmed below.
        packed = jnp.concatenate(
            [packed, jnp.broadcast_to(packed[:, -1:], (b, total - n))], axis=1
        )
    packed = packed.reshape(b * total)

    def kernel(packed_ref, image_ref, out_ref, slabs, sems):
        # out_ref may be a narrower dtype than the slab (e.g. bf16 patches
        # from an f32 image): the rotate runs at 32 bits (Mosaic's dynamic
        # rotate requirement) and the convert happens in-register on the
        # 32x32 window, halving the output write.
        bi = pl.program_id(0)
        i = pl.program_id(1)
        base = (bi * num_chunks + i) * _CHUNK

        def get_dma(k):
            p = packed_ref[base + k]
            ya = (p >> 19) * y_align  # tile index * align: provably aligned
            x128 = ((p >> 11) & 0xFF) * 128
            return pltpu.make_async_copy(
                image_ref.at[bi, pl.ds(ya, slab_h), pl.ds(x128, _SLAB_W)],
                slabs.at[k % _DEPTH],
                sems.at[k % _DEPTH],
            )

        def warm(k, _):
            get_dma(k).start()
            return _

        jax.lax.fori_loop(0, _DEPTH, warm, None, unroll=True)

        def body(k, _):
            get_dma(k).wait()
            p = packed_ref[base + k]
            r = (p >> 7) & 0xF
            c = p & 0x7F
            slab = slabs[k % _DEPTH]
            # Non-negative cyclic shifts; rows/cols of interest never wrap
            # (r < y_align, y_align + 32 <= slab_h; c <= 127, 127 + 32 <= 256).
            slab = pltpu.roll(slab, (slab_h - r) % slab_h, axis=0)
            slab = pltpu.roll(slab, (_SLAB_W - c) % _SLAB_W, axis=1)
            out_ref[0, k] = slab[:_OUT_H, :_OUT_W].astype(out_ref.dtype)

            # Reuses slot k % DEPTH — must start only after the slab is consumed.
            @pl.when(k + _DEPTH < _CHUNK)
            def _():
                get_dma(k + _DEPTH).start()

            return _

        jax.lax.fori_loop(0, _CHUNK, body, None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_chunks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, _CHUNK, _OUT_H, _OUT_W),
            lambda bi, i, s: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((_DEPTH, slab_h, _SLAB_W), image.dtype),
            pltpu.SemaphoreType.DMA((_DEPTH,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, total, _OUT_H, _OUT_W), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(packed, padded)
    return out[:, :n].reshape(b, n, _OUT_H * _OUT_W)
