"""Stability-gate evaluation throughput (parity: reference benchmark_algorithmic_stability_gates.py)."""
from benchmarks._harness import run_benchmark

def main(n: int = 100_000):
    from mvslam_tpu.frontend.pose_estimator import (
        PoseEstimationFailure, RobustPoseEstimatorConfig, apply_stability_gates)
    cfg = RobustPoseEstimatorConfig()
    metrics = {"num_matches": 100, "num_inliers": 60, "inlier_ratio": 0.6,
               "median_parallax_deg": 2.0, "cheirality_ratio": 0.9, "score": 1.0,
               "median_displacement_px": 10.0}

    def workload():
        passed = 0
        for i in range(n):
            try:
                apply_stability_gates(cfg, metrics)
                passed += 1
            except PoseEstimationFailure:
                pass
        return passed

    run_benchmark("stability_gates", workload, items=n, unit="gates/s")

if __name__ == "__main__":
    main()
