"""TPU compute kernels: the batched replacements for cv2 ORB / BFMatcher /
Python RANSAC loops (reference L2 hot path, SURVEY §3.1)."""

from mvslam_tpu.ops.image import gaussian_blur, rgb_to_gray, build_pyramid
from mvslam_tpu.ops.fast import detect_keypoints, FastConfig
from mvslam_tpu.ops.brief import compute_orientations, describe_keypoints, BriefConfig
from mvslam_tpu.ops.hamming import hamming_distance_matrix, match_descriptors, MatchConfig
from mvslam_tpu.ops.ransac import (
    RansacConfig,
    ransac_essential,
    ransac_homography,
)

__all__ = [
    "gaussian_blur",
    "rgb_to_gray",
    "build_pyramid",
    "detect_keypoints",
    "FastConfig",
    "compute_orientations",
    "describe_keypoints",
    "BriefConfig",
    "hamming_distance_matrix",
    "match_descriptors",
    "MatchConfig",
    "RansacConfig",
    "ransac_essential",
    "ransac_homography",
]
