"""Robust dual-model relative pose estimation with stability gates.

Parity with the reference's ``robust_pose_estimator.py``: estimates BOTH an
essential-matrix candidate and a homography candidate, scores each as
``bias × inlier_ratio × max(median_parallax, min_parallax)``
(ref L168-172, L204-207), selects the winner, computes a cheirality ratio
by triangulation (ref L269-296), and raises
:class:`PoseEstimationFailure` with ``recovery_action="relocalize"`` when
stability gates trip (ref L226-251). Translation is unit-normalised
(ref L299-305).

TPU-first architecture: the *entire* dual-model estimation — two RANSAC
hypothesis batches, both decompositions, parallax and cheirality
statistics — is ONE jitted device program (:func:`estimate_pose_device`).
The host wrapper transfers back a handful of scalars, applies the gates,
and owns the failure-path control flow (dynamic decisions stay off-device
per the design stance in SURVEY §7).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.geometry.epipolar import (
    decompose_essential,
    decompose_homography,
    sampson_error,
    triangulate_normalized,
)
from mvslam_tpu.geometry.linalg import inv3x3
from mvslam_tpu.geometry.projection import normalize_pixels
from mvslam_tpu.ops.ransac import RansacConfig, ransac_dual_model


@dataclass(frozen=True)
class RobustPoseEstimatorConfig:
    """Parity: ``robust_pose_estimator.py:42-70``."""

    num_hypotheses: int = 512
    # 4-point homography samples hit all-inliers with probability w⁴ vs the
    # essential model's w⁸, so H reaches the same RANSAC confidence with far
    # fewer hypotheses. 0 ⇒ num_hypotheses // 2.
    homography_hypotheses: int = 0
    essential_threshold_px: float = 1.5
    homography_threshold_px: float = 3.0
    adaptive_threshold: bool = True
    min_matches: int = 12
    min_inliers: int = 15
    min_inlier_ratio: float = 0.25
    min_parallax_deg: float = 0.15
    min_cheirality_ratio: float = 0.55
    min_displacement_px: float = 0.75  # median inlier flow below this = stationary
    essential_bias: float = 1.0
    homography_bias: float = 0.85
    # Model selection by support share S_H/(S_H+S_E): below
    # `homography_selection_share` the scene is decisively 3-D (strong
    # parallax, H only explains one depth band) and E wins outright; above
    # `homography_force_share` E is degenerate/unsupported and H wins
    # outright; in the ambiguous low-parallax band between them the
    # parallax-weighted scores break the tie (where H on the dominant
    # plane is often the more accurate model).
    homography_selection_share: float = 0.42
    homography_force_share: float = 0.52
    refit_rounds: int = 2
    # Order-pinned (mesh-invariant) reductions in the RANSAC chain: forced
    # True by the meshed wrappers (parallel/mesh.py); False = pick the
    # faster reduction form from the (static) match-count workload — dot
    # contractions at large N, pinned at the product's 512-match workload
    # (see ops.ransac._PINNED_N_CUTOFF for the measured numbers).
    mesh_invariant: bool = False

    def __post_init__(self):
        if self.min_inliers < 8:
            raise ValueError("min_inliers must be >= 8")
        if not 0.0 <= self.min_inlier_ratio <= 1.0:
            raise ValueError("min_inlier_ratio must be in [0, 1]")


class PoseEstimationFailure(Exception):
    """Tracking-loss signal consumed by the relocalization path.

    Parity: ``robust_pose_estimator.py:226-251``.
    """

    def __init__(self, reason: str, metrics: Optional[Dict] = None, recovery_action: str = "relocalize"):
        super().__init__(reason)
        self.reason = reason
        self.recovery_action = recovery_action
        self.metrics = dict(metrics or {})


@dataclass(frozen=True)
class PoseEstimate:
    """Host-side result of a successful estimation."""

    rotation: np.ndarray  # (3, 3)
    translation: np.ndarray  # (3,) unit norm
    model_type: str  # "essential" | "homography"
    num_inliers: int
    inlier_ratio: float
    median_parallax_deg: float
    cheirality_ratio: float
    score: float
    inlier_mask: np.ndarray = field(repr=False, default=None)


class DevicePoseResult(NamedTuple):
    """Raw device outputs of the fused dual-model program."""

    rotation: jnp.ndarray  # (3, 3)
    translation: jnp.ndarray  # (3,) unit
    use_essential: jnp.ndarray  # () bool
    num_inliers: jnp.ndarray  # () int32
    inlier_ratio: jnp.ndarray  # () float32
    median_parallax_deg: jnp.ndarray  # () float32
    cheirality_ratio: jnp.ndarray  # () float32
    score: jnp.ndarray  # () float32
    essential_score: jnp.ndarray
    homography_score: jnp.ndarray
    inliers: jnp.ndarray  # (N,) bool
    num_valid_matches: jnp.ndarray  # () int32
    median_displacement_px: jnp.ndarray  # () float32 — zero-motion detector
    homography_share: jnp.ndarray  # () float32 — S_H/(S_H+S_E) selection ratio


def _parallax_and_cheirality(R, t, pts1, pts2, inliers):
    """Median parallax angle (deg) + positive-depth ratio over inliers."""
    X = triangulate_normalized(R, t, pts1, pts2)  # (N, 3) in cam1
    z1 = X[..., 2]
    cam2 = X @ R.T + t
    z2 = cam2[..., 2]
    w = inliers.astype(X.dtype)
    cheirality = jnp.sum(((z1 > 1e-6) & (z2 > 1e-6)).astype(X.dtype) * w) / jnp.maximum(jnp.sum(w), 1.0)
    # Parallax: angle between the two viewing rays of each point.
    c2 = -R.T @ t  # camera-2 centre in cam1 frame
    r1 = X
    r2 = X - c2
    dot = jnp.sum(r1 * r2, axis=-1)
    norms = jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1)
    cosang = jnp.clip(dot / jnp.where(norms < 1e-12, 1e-12, norms), -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(cosang))
    ang = jnp.where(inliers, ang, jnp.nan)
    median = jnp.nanmedian(ang)
    median = jnp.where(jnp.isnan(median), 0.0, median)
    return median, cheirality


@partial(jax.jit, static_argnames=("config",))
def estimate_pose_device(
    key,
    pts1_px: jnp.ndarray,
    pts2_px: jnp.ndarray,
    mask: jnp.ndarray,
    K: jnp.ndarray,
    config: RobustPoseEstimatorConfig = RobustPoseEstimatorConfig(),
) -> DevicePoseResult:
    """Fused dual-model pose estimation: one device program per frame pair."""
    fx = K[0, 0]
    n1 = normalize_pixels(pts1_px, K)
    n2 = normalize_pixels(pts2_px, K)

    # ONE masked median of the match displacements serves all three of its
    # consumers (both adaptive RANSAC thresholds and the zero-motion
    # detector) — the device sort of N values is one of the longer serial
    # ops in this latency-bound program, and relying on XLA CSE to dedup
    # three structurally-identical sorts is not a guarantee.
    disp = jnp.linalg.norm(pts2_px - pts1_px, axis=-1)
    disp_nan = jnp.where(mask, disp, jnp.nan)
    median_nan = jnp.nanmedian(disp_nan)
    median_disp = jnp.where(jnp.isnan(median_nan), 0.0, median_nan)

    e_thresh_px = jnp.asarray(config.essential_threshold_px, jnp.float32)
    h_thresh = jnp.asarray(config.homography_threshold_px, jnp.float32)
    if config.adaptive_threshold:
        # Same semantics as ops.ransac.adaptive_ransac_threshold, sharing
        # the single median above.
        median_t = jnp.where(jnp.isnan(median_nan), 25.0, median_nan)
        scale = jnp.clip(median_t / 25.0, 0.5, 2.0)
        e_thresh_px = config.essential_threshold_px * scale
        h_thresh = config.homography_threshold_px * scale

    key_e, key_h = jax.random.split(key)
    ransac_cfg = RansacConfig(
        num_hypotheses=config.num_hypotheses,
        min_inliers=config.min_inliers,
        refit_rounds=config.refit_rounds,
        mesh_invariant=config.mesh_invariant,
    )
    # Both models are fit in well-conditioned *normalised* coordinates;
    # pixel thresholds convert by 1/fx. Thresholds stay traced values so
    # the adaptive scaling never recompiles.
    ransac_cfg_h = RansacConfig(
        num_hypotheses=config.homography_hypotheses or config.num_hypotheses // 2,
        min_inliers=config.min_inliers,
        refit_rounds=config.refit_rounds,
        mesh_invariant=config.mesh_invariant,
    )
    # E + H hypothesis batches, refits, and scoring run as ONE fused
    # solver chain (see ops/ransac.py::ransac_dual_model — the stage is
    # latency-bound, so halving the sequential op chain matters more than
    # any FLOP count here).
    dual = ransac_dual_model(
        key_e, key_h, n1, n2, mask, ransac_cfg, ransac_cfg_h,
        threshold_e=e_thresh_px / fx, threshold_h=h_thresh / fx,
    )
    res_e, res_h = dual.essential, dual.homography

    w_e = res_e.inliers.astype(jnp.float32)
    R_e, t_e, _ = decompose_essential(res_e.model, n1, n2, weights=w_e)
    R_h, t_h, _ = decompose_homography(res_h.model, n1, n2)
    # Both models' triangulation/parallax statistics as one batched chain.
    par, che = jax.vmap(_parallax_and_cheirality, in_axes=(0, 0, None, None, 0))(
        jnp.stack([R_e, R_h]),
        jnp.stack([t_e, t_h]),
        n1,
        n2,
        jnp.stack([res_e.inliers, res_h.inliers]),
    )
    par_e, par_h = par[0], par[1]
    che_e, che_h = che[0], che[1]

    min_par = jnp.asarray(config.min_parallax_deg, jnp.float32)
    score_e = jnp.where(
        res_e.success,
        config.essential_bias * res_e.inlier_ratio * jnp.maximum(par_e, min_par),
        0.0,
    )
    score_h = jnp.where(
        res_h.success,
        config.homography_bias * res_h.inlier_ratio * jnp.maximum(par_h, min_par),
        0.0,
    )
    # Selection: support-count share S_H/(S_H+S_E) classifies the scene
    # regime. Both models are scored on ALL valid matches with two support
    # votes per match under the same χ² 95% pixel cutoff: E via Sampson
    # distance (counted twice), H via forward/backward transfer distances.
    # Planar scenes saturate both models (share ≈ 0.5); strong-parallax
    # 3-D scenes cap H at its dominant depth band (share « 0.5); a
    # degenerate E collapses its own support (share → 1). In the ambiguous
    # low-parallax band the parallax-weighted scores above decide, which
    # preserves the reference's behavior at
    # ``robust_pose_estimator.py:168-207`` exactly where it is accurate.
    # σ tied to the configured essential RANSAC threshold so the 1-dof 95%
    # cutoff (1.96σ) coincides with the E inlier definition.
    sigma_sq = (e_thresh_px / 1.96) ** 2
    # E support uses the Sampson distance (same metric as its RANSAC
    # inliers), counted twice so its ceiling matches H's two transfer
    # votes. Per-direction point-to-line distances are NOT robust here:
    # with the epipole inside the image (forward motion) they diverge for
    # points near it even for a perfect E.
    d2_e = sampson_error(res_e.model, n1, n2) * fx * fx

    H_inv = inv3x3(res_h.model)

    def _transfer_sq(M, src, dst):
        y = jnp.concatenate([src, jnp.ones_like(src[..., :1])], axis=-1) @ M.T
        w = jnp.where(jnp.abs(y[..., 2:3]) < 1e-12, 1e-12, y[..., 2:3])
        d = y[..., :2] / w - dst
        return jnp.sum(d * d, axis=-1)

    d2_h_fwd = _transfer_sq(res_h.model, n1, n2) * fx * fx
    d2_h_bwd = _transfer_sq(H_inv, n2, n1) * fx * fx

    def _rho(d2, cutoff):
        return jnp.sum((mask & (d2 < cutoff)).astype(jnp.float32))

    s_e = 2.0 * _rho(d2_e, 3.84 * sigma_sq)
    s_h = _rho(d2_h_fwd, 3.84 * sigma_sq) + _rho(d2_h_bwd, 3.84 * sigma_sq)
    h_share = s_h / jnp.maximum(s_h + s_e, 1e-9)
    prefer_h = (h_share > config.homography_force_share) | (
        (h_share >= config.homography_selection_share) & (score_h > score_e)
    )
    # Gate-aware health: a model whose decomposition would trip the
    # cheirality/parallax stability gates must not win selection while the
    # other model would pass them — picking the doomed model turns a
    # recoverable frame into a tracking loss.
    healthy_e = (
        res_e.success
        & (che_e >= config.min_cheirality_ratio)
        & (par_e >= min_par)
    )
    healthy_h = (
        res_h.success
        & (che_h >= config.min_cheirality_ratio)
        & (par_h >= min_par)
    )
    use_e = jnp.where(
        healthy_e & healthy_h,
        ~prefer_h,
        jnp.where(healthy_e | healthy_h, healthy_e, res_e.success),
    )

    R = jnp.where(use_e, R_e, R_h)
    t = jnp.where(use_e, t_e, t_h)
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    return DevicePoseResult(
        rotation=R,
        translation=t,
        use_essential=use_e,
        num_inliers=jnp.where(use_e, res_e.num_inliers, res_h.num_inliers),
        inlier_ratio=jnp.where(use_e, res_e.inlier_ratio, res_h.inlier_ratio),
        median_parallax_deg=jnp.where(use_e, par_e, par_h),
        cheirality_ratio=jnp.where(use_e, che_e, che_h),
        score=jnp.maximum(score_e, score_h),
        essential_score=score_e,
        homography_score=score_h,
        inliers=jnp.where(use_e, res_e.inliers, res_h.inliers),
        num_valid_matches=jnp.sum(mask).astype(jnp.int32),
        median_displacement_px=median_disp.astype(jnp.float32),
        homography_share=h_share.astype(jnp.float32),
    )


def apply_stability_gates(config: RobustPoseEstimatorConfig, metrics: Dict) -> None:
    """Raise :class:`PoseEstimationFailure` when a gate trips.

    Shared by the host estimator facade and the SLAM system's fused
    tracking path. Parity: ``robust_pose_estimator.py:226-251``.
    """
    if metrics.get("num_matches", 0) < config.min_matches:
        raise PoseEstimationFailure("insufficient_matches", metrics=metrics)
    if metrics.get("median_displacement_px", float("inf")) < config.min_displacement_px:
        raise PoseEstimationFailure("insufficient_motion", metrics=metrics)
    if metrics.get("score", 0.0) <= 0.0:
        raise PoseEstimationFailure("no_valid_model", metrics=metrics)
    if metrics.get("num_inliers", 0) < config.min_inliers:
        raise PoseEstimationFailure("low_inliers", metrics=metrics)
    if metrics.get("inlier_ratio", 0.0) < config.min_inlier_ratio:
        raise PoseEstimationFailure("low_inlier_ratio", metrics=metrics)
    if metrics.get("median_parallax_deg", 0.0) < config.min_parallax_deg:
        raise PoseEstimationFailure("low_parallax", metrics=metrics)
    if metrics.get("cheirality_ratio", 0.0) < config.min_cheirality_ratio:
        raise PoseEstimationFailure("low_cheirality", metrics=metrics)


class RobustPoseEstimator:
    """Host facade applying stability gates to the fused device program.

    Parity: ``robust_pose_estimator.py:89-134`` (estimate_pose) and
    L226-251 (gates).
    """

    def __init__(self, config: Optional[RobustPoseEstimatorConfig] = None) -> None:
        self.config = config or RobustPoseEstimatorConfig()

    def estimate_pose(
        self,
        pts1_px,
        pts2_px,
        mask,
        K,
        key,
    ) -> PoseEstimate:
        cfg = self.config
        pts1_px = jnp.asarray(pts1_px, jnp.float32)
        pts2_px = jnp.asarray(pts2_px, jnp.float32)
        mask = jnp.asarray(mask)
        num_matches = int(jnp.sum(mask))
        if num_matches < cfg.min_matches:
            raise PoseEstimationFailure(
                "insufficient_matches",
                metrics={"num_matches": num_matches, "min_matches": cfg.min_matches},
            )
        dev = estimate_pose_device(key, pts1_px, pts2_px, mask, jnp.asarray(K, jnp.float32), cfg)
        metrics = {
            "num_matches": num_matches,
            "num_inliers": int(dev.num_inliers),
            "inlier_ratio": float(dev.inlier_ratio),
            "median_parallax_deg": float(dev.median_parallax_deg),
            "cheirality_ratio": float(dev.cheirality_ratio),
            "score": float(dev.score),
            "essential_score": float(dev.essential_score),
            "homography_score": float(dev.homography_score),
            "model_type": "essential" if bool(dev.use_essential) else "homography",
            "median_displacement_px": float(dev.median_displacement_px),
        }
        apply_stability_gates(cfg, metrics)
        return PoseEstimate(
            rotation=np.asarray(dev.rotation),
            translation=np.asarray(dev.translation),
            model_type=metrics["model_type"],
            num_inliers=metrics["num_inliers"],
            inlier_ratio=metrics["inlier_ratio"],
            median_parallax_deg=metrics["median_parallax_deg"],
            cheirality_ratio=metrics["cheirality_ratio"],
            score=metrics["score"],
            inlier_mask=np.asarray(dev.inliers),
        )
