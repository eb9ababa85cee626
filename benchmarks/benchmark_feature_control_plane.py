"""Feature control plane end-to-end throughput
(parity: reference benchmark_feature_control_plane.py)."""
import numpy as np
from benchmarks._harness import emit, measured

def main(frames: int = 32):
    from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
    from mvslam_tpu.runtime.feature_plane import FeatureControlConfig, FeatureControlPlane
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, size=(370, 1226), dtype=np.uint8) for _ in range(frames)]
    plane = FeatureControlPlane(FeaturePipelineConfig(num_features=2048), FeatureControlConfig(num_workers=2))
    plane.submit(10_000, imgs[0]); plane.collect(timeout=300)  # warmup/compile
    report = {}
    with measured(report):
        for i, img in enumerate(imgs):
            plane.submit(i, img)
        results = plane.collect(timeout=300)
    emit("feature_plane_throughput", len(results) / max(report["elapsed_s"], 1e-9), "frames/s",
         **report, cache_hits=plane.health_snapshot()["cache_hits"])
    plane.close()

if __name__ == "__main__":
    main()
