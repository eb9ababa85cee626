"""Hypothesis-parallel RANSAC for essential matrices and homographies.

Replaces the reference's 2000-iteration *sequential Python* RANSAC loops
(``homography.py:193-210`` essential, ``homography.py:324-339``
homography) — the dominant Python-side cost of its per-frame hot path
(SURVEY §3.1) — with a **vmapped hypothesis batch**: K minimal samples are
drawn with a masked Gumbel-top-k (distinct, valid indices, keyed PRNG so
runs are bit-stable), K solvers run as one batched eigh, all K×N residuals
are scored in one fused pass, and the best hypothesis is refit on its
inliers with weighted least squares (static IRLS rounds). One device
program, no host round-trips.

Inputs are padded fixed-size correspondence arrays with validity masks.
Essential-matrix variants operate on *normalised* coordinates; pass
``threshold = pixel_threshold / focal``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvslam_tpu.geometry.epipolar import (
    dlt_homography,
    eight_point_essential,
    sampson_error,
    symmetric_transfer_error,
)


@dataclass(frozen=True)
class RansacConfig:
    num_hypotheses: int = 512
    threshold: float = 1.0  # residual threshold (normalised units for E, px for H)
    min_inliers: int = 15
    refit_rounds: int = 2


class RansacResult(NamedTuple):
    model: jnp.ndarray  # (3, 3)
    inliers: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # () int32
    inlier_ratio: jnp.ndarray  # () float32 (vs valid correspondences)
    success: jnp.ndarray  # () bool


def _sample_indices(key, mask: jnp.ndarray, num_hypotheses: int, sample_size: int) -> jnp.ndarray:
    """(K, sample_size) distinct valid indices via masked Gumbel-top-k."""
    n = mask.shape[0]
    u = jax.random.uniform(key, (num_hypotheses, n), minval=1e-12, maxval=1.0)
    gumbel = -jnp.log(-jnp.log(u))
    scores = jnp.where(mask[None, :], gumbel, -jnp.inf)
    _, idx = jax.lax.top_k(scores, sample_size)
    return idx


def _ransac(
    key,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
    config: RansacConfig,
    solver,
    scorer,
    sample_size: int,
    threshold=None,
    hypothesis_sharding=None,
) -> RansacResult:
    # ``threshold`` may be a traced value (adaptive thresholds); falls back
    # to the static config threshold.
    if threshold is None:
        threshold = config.threshold
    thresh_sq = jnp.square(jnp.asarray(threshold, dtype=pts1.dtype))
    num_valid = jnp.sum(mask)

    # The hypothesis set is sampled from the global key regardless of any
    # sharding, so a meshed run and a single-chip run draw IDENTICAL
    # hypotheses (mesh-invariant determinism). Only the K-wise solve +
    # K×N scoring below is sharded (the dominant cost); XLA's SPMD
    # partitioner splits it across chips and the argmax travels over ICI.
    idx = _sample_indices(key, mask, config.num_hypotheses, sample_size)  # (K, S)
    if hypothesis_sharding is not None:
        idx = jax.lax.with_sharding_constraint(idx, hypothesis_sharding)
    s1 = pts1[idx]  # (K, S, 2)
    s2 = pts2[idx]
    models = solver(s1, s2, None)  # batched: (K, 3, 3)
    if hypothesis_sharding is not None:
        models = jax.lax.with_sharding_constraint(models, hypothesis_sharding)

    err = scorer(models, pts1[None], pts2[None])  # (K, N)
    if hypothesis_sharding is not None:
        err = jax.lax.with_sharding_constraint(err, hypothesis_sharding)
    inl = (err < thresh_sq) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    best_inliers = inl[best]

    # Masked refit on inliers (static IRLS rounds).
    model = models[best]
    inliers = best_inliers
    for _ in range(config.refit_rounds):
        w = inliers.astype(pts1.dtype)
        # Guard: refitting needs ≥ sample_size inliers; keep previous model otherwise.
        enough = jnp.sum(w) >= sample_size
        refit = solver(pts1, pts2, w)
        model = jnp.where(enough, refit, model)
        err = scorer(model[None], pts1[None], pts2[None])[0]
        inliers = (err < thresh_sq) & mask

    count = jnp.sum(inliers)
    ratio = count / jnp.maximum(num_valid, 1)
    success = (count >= config.min_inliers) & (num_valid >= sample_size)
    return RansacResult(model, inliers, count.astype(jnp.int32), ratio.astype(jnp.float32), success)


@partial(jax.jit, static_argnames=("config", "hypothesis_sharding"))
def ransac_essential(
    key,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
    config: RansacConfig = RansacConfig(threshold=2e-3),
    threshold=None,
    hypothesis_sharding=None,
) -> RansacResult:
    """Essential-matrix RANSAC over normalised correspondences.

    ``threshold`` optionally overrides the static config threshold with a
    traced value (adaptive thresholds stay on-device). Parity:
    ``homography.py:302-345`` (Sampson-scored essential RANSAC) with
    hypothesis batching instead of iteration. ``hypothesis_sharding``
    (a ``NamedSharding`` over the hypothesis axis) shards solve+scoring
    across a mesh without changing any result bit.
    """
    return _ransac(
        key, pts1, pts2, mask, config,
        solver=eight_point_essential,
        scorer=sampson_error,
        sample_size=8,
        threshold=threshold,
        hypothesis_sharding=hypothesis_sharding,
    )


@partial(jax.jit, static_argnames=("config", "hypothesis_sharding"))
def ransac_homography(
    key,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
    config: RansacConfig = RansacConfig(threshold=3.0),
    threshold=None,
    hypothesis_sharding=None,
) -> RansacResult:
    """Homography RANSAC scored by symmetric transfer error.

    Parity: ``homography.py:148-216``.
    """
    return _ransac(
        key, pts1, pts2, mask, config,
        solver=dlt_homography,
        scorer=symmetric_transfer_error,
        sample_size=4,
        threshold=threshold,
        hypothesis_sharding=hypothesis_sharding,
    )


def adaptive_ransac_threshold(
    base_threshold: float,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Scale a base threshold by median match displacement / 25, clipped to
    [0.5, 2.0]x — parity: ``feature_pipeline.py.bak:114-129``.
    """
    disp = jnp.linalg.norm(pts2 - pts1, axis=-1)
    disp = jnp.where(mask, disp, jnp.nan)
    median = jnp.nanmedian(disp)
    median = jnp.where(jnp.isnan(median), 25.0, median)
    scale = jnp.clip(median / 25.0, 0.5, 2.0)
    return base_threshold * scale
