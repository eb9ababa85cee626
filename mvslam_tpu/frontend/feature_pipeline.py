"""Feature pipeline: detection + description + matching as jitted TPU steps.

Public-surface parity with the reference's ``feature_pipeline.py`` (the six
symbols its package contract requires — see SURVEY snapshot note and
``feature_pipeline.py.bak:12-129``): ``FeaturePipelineConfig``,
``MatchStats``, ``FeaturePipeline``, ``build_feature_pipeline``,
``matches_to_points``, ``adaptive_ransac_threshold``.

TPU-first differences from the cv2 design:
- ``detect_and_describe`` is ONE jitted program (grayscale → FAST → NMS →
  top-K → blur → oriented BRIEF) returning a fixed-shape :class:`FeatureSet`
  (padded arrays + validity mask) instead of variable-length cv2 KeyPoint
  lists.
- ``match`` is one jitted program (MXU Hamming matmul → cross-check/ratio →
  distance-sorted cap) returning padded index pairs.
- Determinism is structural (no RNG in detection/description at all).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.ops.brief import BriefConfig
from mvslam_tpu.ops.fast import FastConfig
from mvslam_tpu.ops.hamming import (
    MatchConfig,
    SelectedMatches,
    gather_matched_points,
    match_descriptors,
    select_matches,
)
from mvslam_tpu.ops.image import rgb_to_gray
from mvslam_tpu.ops.ransac import adaptive_ransac_threshold as _adaptive_threshold_device


@dataclass(frozen=True)
class FeaturePipelineConfig:
    """Parity: ``feature_pipeline.py.bak:12-31`` (defaults preserved where
    they transfer: 2000 features, ratio 0.8, cross-check, 500 match cap)."""

    detector: str = "fast_brief"
    num_features: int = 2048  # padded static keypoint budget (ref: 2000)
    fast_threshold: float = 20.0
    grid_cells: int = 8
    use_ratio_test: bool = False
    ratio: float = 0.8
    cross_check: bool = True
    max_matches: int = 512  # ref: 500, rounded to lane multiple
    blur_sigma: float = 2.0
    num_pyramid_levels: int = 1  # cv2 ORB uses 8; levels share the budget

    def __post_init__(self):
        if self.num_features <= 0:
            raise ValueError("num_features must be positive")
        if not 0.0 < self.ratio <= 1.0:
            raise ValueError("ratio must be in (0, 1]")
        if self.max_matches <= 0:
            raise ValueError("max_matches must be positive")
        if self.detector not in ("fast_brief", "orb"):
            raise ValueError(f"unknown detector {self.detector!r}")
        if self.num_pyramid_levels < 1:
            raise ValueError("num_pyramid_levels must be >= 1")


class FeatureSet(NamedTuple):
    """Fixed-shape detection result (replaces cv2 KeyPoint lists)."""

    xy: jnp.ndarray  # (N, 2) float32 (x, y)
    scores: jnp.ndarray  # (N,)
    descriptors: jnp.ndarray  # (N, 8) uint32 packed 256-bit BRIEF
    angles: jnp.ndarray  # (N,) float32 radians
    valid: jnp.ndarray  # (N,) bool

    @property
    def num_valid(self) -> int:
        return int(jnp.sum(self.valid))


@dataclass(frozen=True)
class MatchStats:
    """Parity: ``feature_pipeline.py.bak`` MatchStats."""

    num_features_1: int
    num_features_2: int
    num_matches: int
    mean_distance: float
    min_distance: float
    max_distance: float


@partial(jax.jit, static_argnames=("num_features", "fast_config", "brief_config", "num_levels"))
def _detect_and_describe(
    frame: jnp.ndarray,
    num_features: int,
    fast_config: FastConfig,
    brief_config: BriefConfig,
    num_levels: int = 1,
) -> FeatureSet:
    from mvslam_tpu.ops.detect import detect_and_describe

    gray = rgb_to_gray(frame)
    xy, scores, desc, angles, valid = detect_and_describe(
        gray, num_features, fast_config, brief_config, num_levels=num_levels
    )
    return FeatureSet(xy, scores, desc, angles, valid)


class FeaturePipeline:
    """Detect/describe/match facade. Parity: ``ORBFeaturePipeline``
    (feature_pipeline.py.bak:64-95), re-architected as two jitted programs.
    """

    def __init__(self, config: Optional[FeaturePipelineConfig] = None) -> None:
        self.config = config or FeaturePipelineConfig()
        self._fast_config = FastConfig(
            threshold=self.config.fast_threshold,
            grid_cells=self.config.grid_cells,
        )
        self._brief_config = BriefConfig(blur_sigma=self.config.blur_sigma)
        self._match_config = MatchConfig(
            ratio=self.config.ratio,
            cross_check=self.config.cross_check,
            use_ratio_test=self.config.use_ratio_test,
        )

    def detect_and_describe(self, frame: jnp.ndarray) -> FeatureSet:
        """One jitted device program per frame. frame: (H, W) gray or
        (H, W, 3) color, uint8 or float."""
        return _detect_and_describe(
            jnp.asarray(frame),
            self.config.num_features,
            self._fast_config,
            self._brief_config,
            num_levels=self.config.num_pyramid_levels,
        )

    def detect_and_describe_batch(self, frames: jnp.ndarray) -> FeatureSet:
        """vmapped detection over a (B, H, W[, 3]) frame window — the
        data-parallel axis for multi-chip scaling."""
        fn = partial(
            _detect_and_describe,
            num_features=self.config.num_features,
            fast_config=self._fast_config,
            brief_config=self._brief_config,
            num_levels=self.config.num_pyramid_levels,
        )
        return jax.vmap(fn)(jnp.asarray(frames))

    def match(self, features1: FeatureSet, features2: FeatureSet) -> SelectedMatches:
        result = match_descriptors(
            features1.descriptors,
            features1.valid,
            features2.descriptors,
            features2.valid,
            self._match_config,
        )
        return select_matches(result, max_matches=self.config.max_matches)

    def match_stats(self, features1: FeatureSet, features2: FeatureSet, selected: SelectedMatches) -> MatchStats:
        m = np.asarray(selected.valid)
        d = np.asarray(selected.distances)[m]
        return MatchStats(
            num_features_1=features1.num_valid,
            num_features_2=features2.num_valid,
            num_matches=int(m.sum()),
            mean_distance=float(d.mean()) if len(d) else 0.0,
            min_distance=float(d.min()) if len(d) else 0.0,
            max_distance=float(d.max()) if len(d) else 0.0,
        )


def build_feature_pipeline(config: Optional[FeaturePipelineConfig] = None) -> FeaturePipeline:
    """Parity: ``feature_pipeline.py.bak:98-101``."""
    return FeaturePipeline(config)


def matches_to_points(
    features1: FeatureSet, features2: FeatureSet, selected: SelectedMatches
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Matched (K, 2) point arrays + (K,) mask.

    Parity: ``feature_pipeline.py.bak:104-112`` (returns arrays rather
    than lists; padded slots are zeroed).
    """
    p1, p2 = gather_matched_points(features1.xy, features2.xy, selected)
    return p1, p2, selected.valid


def adaptive_ransac_threshold(
    base_threshold: float,
    pts1,
    pts2,
    mask=None,
) -> float:
    """Median-displacement-scaled RANSAC threshold.

    Parity: ``feature_pipeline.py.bak:114-129`` (scale = median/25 clipped
    to [0.5, 2.0]).
    """
    pts1 = jnp.asarray(pts1, dtype=jnp.float32)
    pts2 = jnp.asarray(pts2, dtype=jnp.float32)
    if mask is None:
        mask = jnp.ones(pts1.shape[0], dtype=bool)
    return float(_adaptive_threshold_device(base_threshold, pts1, pts2, jnp.asarray(mask)))
