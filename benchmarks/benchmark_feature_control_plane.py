"""Feature control plane end-to-end throughput
(parity: reference benchmark_feature_control_plane.py).

Compares the reference-shaped per-frame thread-pool path (batch_size=1)
against the device-batch assembler (SURVEY §2.5: batched/vmapped feature
kernels are the real data-parallel axis) at several batch widths.
"""
import numpy as np
from benchmarks._harness import emit, measured


def _run(imgs, config_kwargs, metric):
    from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
    from mvslam_tpu.runtime.feature_plane import FeatureControlConfig, FeatureControlPlane

    plane = FeatureControlPlane(
        FeaturePipelineConfig(num_features=2048),
        FeatureControlConfig(max_inflight=32, **config_kwargs),
    )
    plane.warmup(imgs[0])  # compile outside the timed region
    report = {}
    with measured(report):
        for i, img in enumerate(imgs):
            plane.submit(i, img)
        results = plane.collect(timeout=300)
    health = plane.health_snapshot()
    emit(
        metric,
        len(results) / max(report["elapsed_s"], 1e-9),
        "frames/s",
        **report,
        cache_hits=health["cache_hits"],
        batches=health["batches"],
        mean_batch_fill=health["mean_batch_fill"],
    )
    plane.close()
    return len(results) / max(report["elapsed_s"], 1e-9)


def main(frames: int = 32):
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, size=(370, 1226), dtype=np.uint8) for _ in range(frames)]
    single = _run(imgs, {"batch_size": 1, "num_workers": 2}, "feature_plane_threadpool_throughput")
    best = single
    for batch in (4, 8):
        fps = _run(
            imgs,
            {"batch_size": batch, "flush_timeout_s": 0.01},
            f"feature_plane_batch{batch}_throughput",
        )
        best = max(best, fps)
    emit("feature_plane_batch_speedup", best / max(single, 1e-9), "x")


if __name__ == "__main__":
    main()
