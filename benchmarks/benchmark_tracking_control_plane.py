"""Tracking control plane pairing throughput
(parity: reference benchmark_tracking_control_plane.py)."""
import numpy as np
from benchmarks._harness import emit, measured

def main(frames: int = 32):
    from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
    from mvslam_tpu.runtime.feature_plane import FeatureControlConfig, FeatureControlPlane
    from mvslam_tpu.runtime.tracking_plane import TrackingControlConfig, TrackingControlPlane
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, size=(370, 1226), dtype=np.uint8) for _ in range(frames)]
    plane = FeatureControlPlane(FeaturePipelineConfig(num_features=2048), FeatureControlConfig(num_workers=2))
    tracking = TrackingControlPlane(plane, TrackingControlConfig(max_pending=64, frame_ttl_s=600))
    tracking.submit_frame(10_000, 0.0, imgs[0]); tracking.collect(timeout=300)  # warmup
    report = {}
    with measured(report):
        for i, img in enumerate(imgs):
            tracking.submit_frame(i, 0.1 * i, img)
        results = tracking.collect(timeout=300)
    emit("tracking_plane_throughput", len(results) / max(report["elapsed_s"], 1e-9), "frames/s", **report)
    plane.close()

if __name__ == "__main__":
    main()
