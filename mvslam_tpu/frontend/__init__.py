"""Front-end: feature pipeline + robust pose estimation (reference L2)."""

from mvslam_tpu.frontend.feature_pipeline import (
    FeaturePipeline,
    FeaturePipelineConfig,
    FeatureSet,
    MatchStats,
    adaptive_ransac_threshold,
    build_feature_pipeline,
    matches_to_points,
)
from mvslam_tpu.frontend.pose_estimator import (
    PoseEstimate,
    PoseEstimationFailure,
    RobustPoseEstimator,
    RobustPoseEstimatorConfig,
)

__all__ = [
    "FeaturePipeline",
    "FeaturePipelineConfig",
    "FeatureSet",
    "MatchStats",
    "adaptive_ransac_threshold",
    "build_feature_pipeline",
    "matches_to_points",
    "PoseEstimate",
    "PoseEstimationFailure",
    "RobustPoseEstimator",
    "RobustPoseEstimatorConfig",
]
