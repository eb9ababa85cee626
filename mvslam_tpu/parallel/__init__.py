"""Device-mesh scaling of the tracking/RANSAC steps (pjit/shard_map)."""

from mvslam_tpu.parallel.mesh import (
    make_mesh,
    batched_track_pairs,
    run_bundle_adjustment_sharded,
    sharded_ransac_essential,
    solve_problem_sharded,
    track_superwindow_meshed,
)

__all__ = [
    "make_mesh",
    "batched_track_pairs",
    "run_bundle_adjustment_sharded",
    "sharded_ransac_essential",
    "solve_problem_sharded",
    "track_superwindow_meshed",
]
