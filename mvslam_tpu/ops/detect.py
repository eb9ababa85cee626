"""Fused (optionally multi-scale) detect + describe.

cv2's ORB detects over an 8-level image pyramid; this op provides the
TPU equivalent with static shapes: each level gets an equal share of the
keypoint budget, detection/description run on that level's (statically
shaped) image, and keypoint coordinates map back to level-0 pixels
(2x area downsampling ⇒ x₀ = 2ˡ·x + (2ˡ−1)/2). All levels concatenate
into one padded FeatureSet, so downstream matching is scale-oblivious.
"""

from __future__ import annotations

import jax.numpy as jnp

from mvslam_tpu.ops.brief import BriefConfig, describe_keypoints
from mvslam_tpu.ops.fast import FastConfig, detect_keypoints
from mvslam_tpu.ops.image import downsample2, gaussian_blur


def detect_and_describe(
    gray: jnp.ndarray,
    num_features: int,
    fast_config: FastConfig,
    brief_config: BriefConfig,
    num_levels: int = 1,
    score_image: jnp.ndarray = None,
):
    """(H, W) grayscale → (xy, scores, descriptors, angles, valid).

    ``num_levels`` is static; levels beyond what the image supports (or a
    budget share of zero) are simply skipped at trace time.
    """
    num_levels = max(1, int(num_levels))
    per_level = max(1, num_features // num_levels)
    parts = []
    img = gray
    for level in range(num_levels):
        h, w = img.shape[-2], img.shape[-1]
        if h < 2 * fast_config.border_margin + 8 or w < 2 * fast_config.border_margin + 8:
            break
        budget = per_level if level < num_levels - 1 else num_features - per_level * (num_levels - 1)
        budget = max(1, budget)
        # score_image (the raw integer frame, when available) feeds the
        # FAST score map's exact int16 fast path at level 0; description
        # and the pyramid always use the float grayscale.
        src = score_image if (level == 0 and score_image is not None) else img
        xy, scores, valid = detect_keypoints(src, num_keypoints=budget, config=fast_config)
        # (A bf16 blurred image would halve the patch DMA traffic with
        # bit-identical descriptors — description already consumes bf16 —
        # but Mosaic's dynamic rotate only supports 32-bit data, so the
        # slab-shift kernel keeps the image in f32 for now.)
        blurred = gaussian_blur(img, sigma=brief_config.blur_sigma, radius=brief_config.blur_radius)
        desc, angles = describe_keypoints(blurred, xy, valid, config=brief_config)
        scale = float(2**level)
        xy0 = jnp.where(valid[:, None], xy * scale + (scale - 1.0) / 2.0, 0.0)
        parts.append((xy0, scores, desc, angles, valid))
        if level < num_levels - 1:
            img = downsample2(img)

    if not parts:
        # Image smaller than the FAST border at every level: the static-
        # shape contract still holds — an all-invalid padded FeatureSet
        # instead of an obscure empty-concatenate error.
        return (
            jnp.zeros((num_features, 2), jnp.float32),
            jnp.zeros((num_features,), jnp.float32),
            jnp.zeros((num_features, 8), jnp.uint32),
            jnp.zeros((num_features,), jnp.float32),
            jnp.zeros((num_features,), bool),
        )
    xy = jnp.concatenate([p[0] for p in parts], axis=0)
    scores = jnp.concatenate([p[1] for p in parts], axis=0)
    desc = jnp.concatenate([p[2] for p in parts], axis=0)
    angles = jnp.concatenate([p[3] for p in parts], axis=0)
    valid = jnp.concatenate([p[4] for p in parts], axis=0)
    # Pad to the exact static budget if levels were skipped.
    total = xy.shape[0]
    if total < num_features:
        pad = num_features - total
        xy = jnp.pad(xy, ((0, pad), (0, 0)))
        scores = jnp.pad(scores, (0, pad))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        angles = jnp.pad(angles, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    elif total > num_features:
        xy, scores, desc, angles, valid = (
            xy[:num_features],
            scores[:num_features],
            desc[:num_features],
            angles[:num_features],
            valid[:num_features],
        )
    return xy, scores, desc, angles, valid
