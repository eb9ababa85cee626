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
    HYPOTHESIS_EIGVEC_ITERS,
    REFIT_EIGVEC_ITERS,
    _smallest_singular_vector,
    dlt_homography,
    eight_point_essential,
    essential_from_vec,
    essential_rows,
    homography_from_vec,
    homography_rows,
    sampson_error,
    symmetric_transfer_error,
)


@dataclass(frozen=True)
class RansacConfig:
    num_hypotheses: int = 512
    threshold: float = 1.0  # residual threshold (normalised units for E, px for H)
    min_inliers: int = 15
    refit_rounds: int = 2
    # True = accumulate grams/scores through order-pinned tree reductions so
    # results are bit-identical at ANY mesh/per-device batch shape (the
    # meshed wrappers in parallel/mesh.py force this). False (default) =
    # pick the faster form per workload SIZE (static at trace time): dot
    # contractions at large N, pinned elementwise at small N — see
    # _PINNED_N_CUTOFF. Either way runs are run-to-run deterministic for a
    # fixed program; only agreement ACROSS mesh sizes is given up when the
    # dot form engages (VERDICT r3 item 3 suspect i).
    mesh_invariant: bool = False


# Measured on v5e (benchmark_ransac_ab, same process, r4): dual RANSAC at
# 2048 matches = 1.51 ms dot vs 3.71 ms pinned (MXU contraction wins the
# big grams/score maps), at 512 matches = 1.22 ms dot vs 0.80 ms pinned
# (MXU dispatch overhead dominates small shapes; the elementwise pinned
# form stays on the VPU). N is a static shape, so the fast form is chosen
# at trace time; the product tracking path (max_matches=512) therefore
# keeps the mesh-invariant jaxpr for free.
_PINNED_N_CUTOFF = 1024


def _auto_pinned(n: int, *configs: "RansacConfig") -> bool:
    return any(c.mesh_invariant for c in configs) or n <= _PINNED_N_CUTOFF


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
    pinned = _auto_pinned(pts1.shape[-2], config)
    return _ransac(
        key, pts1, pts2, mask, config,
        solver=partial(eight_point_essential, pinned=pinned),
        scorer=partial(sampson_error, pinned=pinned),
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
    pinned = _auto_pinned(pts1.shape[-2], config)
    return _ransac(
        key, pts1, pts2, mask, config,
        solver=partial(dlt_homography, pinned=pinned),
        scorer=partial(symmetric_transfer_error, pinned=pinned),
        sample_size=4,
        threshold=threshold,
        hypothesis_sharding=hypothesis_sharding,
    )


class DualRansacResult(NamedTuple):
    essential: RansacResult
    homography: RansacResult


def ransac_dual_model(
    key_e,
    key_h,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
    config_e: RansacConfig,
    config_h: RansacConfig,
    threshold_e=None,
    threshold_h=None,
) -> DualRansacResult:
    """Essential + homography RANSAC fused into ONE solver chain.

    Running :func:`ransac_essential` and :func:`ransac_homography`
    back-to-back costs two full sequential solve chains (gram → 9×9
    Gauss-Jordan inverse → 10 inverse-iteration matvecs) plus four refit
    chains — and the dual-model stage is latency-bound, not compute-bound
    (docs/PERF.md: ~0.08 GFLOP across 2.5 ms). Both minimal solvers reduce
    to the same shape of work — E contributes one ``kron`` row per
    correspondence (8 rows/sample), H two DLT rows per correspondence
    (2×4 rows/sample) — so the K_e + K_h hypothesis systems are solved as
    ONE batched (K_e+K_h, 8, 9) null-space problem, and each IRLS round
    solves both models' refits as one (2, 2N, 9) problem (the E rows
    zero-padded from N to 2N: zero rows leave AᵀA unchanged). Scoring
    stays per-model (Sampson vs symmetric transfer).

    Sampling, thresholds, vote counting, and refit gating are bit-identical
    to the single-model entry points given the same keys. Used by the
    fused tracking step; the product path shards the *frame* axis of the
    superwindow, so no hypothesis-sharding argument here (see
    ``parallel/mesh.py`` for hypothesis-sharded single-model RANSAC).

    Parity: ``robust_pose_estimator.py:89-134`` runs both model estimates
    per frame; ``homography.py:302-345`` / ``homography.py:148-216``.
    """
    thresh_e = config_e.threshold if threshold_e is None else threshold_e
    thresh_h = config_h.threshold if threshold_h is None else threshold_h
    thr2_e = jnp.square(jnp.asarray(thresh_e, dtype=pts1.dtype))
    thr2_h = jnp.square(jnp.asarray(thresh_h, dtype=pts1.dtype))
    num_valid = jnp.sum(mask)
    k_e, k_h = config_e.num_hypotheses, config_h.num_hypotheses
    pinned = _auto_pinned(pts1.shape[-2], config_e, config_h)

    idx_e = _sample_indices(key_e, mask, k_e, 8)  # (K_e, 8)
    idx_h = _sample_indices(key_h, mask, k_h, 4)  # (K_h, 4)
    rows_e = essential_rows(pts1[idx_e], pts2[idx_e])  # (K_e, 8, 9)
    rows_h, T1, T2 = homography_rows(pts1[idx_h], pts2[idx_h], pinned=pinned)  # (K_h, 8, 9)
    # One null-space chain for ALL hypotheses of both models. rescue=False:
    # a numerically-failed hypothesis merely loses its RANSAC vote.
    vecs = _smallest_singular_vector(
        jnp.concatenate([rows_e, rows_h], axis=0),
        rescue=False,
        iterations=HYPOTHESIS_EIGVEC_ITERS,
        pinned=pinned,
    )
    models_e = essential_from_vec(vecs[:k_e], exact_rank2=False)
    models_h = homography_from_vec(vecs[k_e:], T1, T2)

    err_e = sampson_error(models_e, pts1[None], pts2[None], pinned=pinned)  # (K_e, N)
    err_h = symmetric_transfer_error(models_h, pts1[None], pts2[None], pinned=pinned)  # (K_h, N)
    inl_e = (err_e < thr2_e) & mask[None, :]
    inl_h = (err_h < thr2_h) & mask[None, :]
    best_e = jnp.argmax(jnp.sum(inl_e, axis=1))
    best_h = jnp.argmax(jnp.sum(inl_h, axis=1))

    model_e, inliers_e = models_e[best_e], inl_e[best_e]
    model_h, inliers_h = models_h[best_h], inl_h[best_h]
    rounds = max(config_e.refit_rounds, config_h.refit_rounds)
    for r in range(rounds):
        w_e = inliers_e.astype(pts1.dtype)
        w_h = inliers_h.astype(pts1.dtype)
        re = essential_rows(pts1, pts2, w_e)  # (N, 9)
        rh, T1f, T2f = homography_rows(pts1, pts2, w_h, pinned=pinned)  # (2N, 9)
        re_padded = jnp.concatenate([re, jnp.zeros_like(re)], axis=0)
        # One chain for both refits; rescue=True — a poisoned refit would
        # poison the frame's final model. REFIT iterations: clean inlier
        # spectra converge in 1-2 rounds (must mirror the single-model
        # refit path in eight_point_essential/dlt_homography bit-for-bit).
        v2 = _smallest_singular_vector(
            jnp.stack([re_padded, rh]),
            rescue=True,
            iterations=REFIT_EIGVEC_ITERS,
            pinned=pinned,
        )
        refit_e = essential_from_vec(v2[0], exact_rank2=True)
        refit_h = homography_from_vec(v2[1], T1f, T2f)
        if r < config_e.refit_rounds:
            model_e = jnp.where(jnp.sum(w_e) >= 8, refit_e, model_e)
            inliers_e = (
                sampson_error(model_e[None], pts1[None], pts2[None], pinned=pinned)[0] < thr2_e
            ) & mask
        if r < config_h.refit_rounds:
            model_h = jnp.where(jnp.sum(w_h) >= 4, refit_h, model_h)
            inliers_h = (
                symmetric_transfer_error(model_h[None], pts1[None], pts2[None], pinned=pinned)[0]
                < thr2_h
            ) & mask

    def _result(model, inliers, cfg, sample_size):
        count = jnp.sum(inliers)
        ratio = count / jnp.maximum(num_valid, 1)
        success = (count >= cfg.min_inliers) & (num_valid >= sample_size)
        return RansacResult(
            model, inliers, count.astype(jnp.int32), ratio.astype(jnp.float32), success
        )

    return DualRansacResult(
        essential=_result(model_e, inliers_e, config_e, 8),
        homography=_result(model_h, inliers_h, config_h, 4),
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
