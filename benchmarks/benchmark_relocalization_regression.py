"""Relocalizer query latency (parity: reference benchmark_relocalization_regression.py)."""
import numpy as np
from benchmarks._harness import emit, measured

def main(queries: int = 10, keyframes: int = 20, n_pts: int = 512):
    import jax
    from mvslam_tpu.loopclosure.map_builder import MapBuilderConfig, MapSnapshotBuilder
    from mvslam_tpu.loopclosure.persistent_map import MapKeyframe, MapRelocalizer
    rng = np.random.default_rng(0)
    K = np.array([[718.0, 0, 607.0], [0, 718.0, 185.0], [0, 0, 1]])
    kfs = []
    for k in range(keyframes):
        pose = np.eye(4); pose[0, 3] = k
        kfs.append(MapKeyframe(
            frame_id=k, pose=pose,
            keypoints=rng.uniform(50, 1150, size=(n_pts, 2)).astype(np.float32),
            descriptors=rng.integers(0, 2**32, size=(n_pts, 8), dtype=np.uint32),
            valid=np.ones(n_pts, bool)))
    snapshot, _ = MapSnapshotBuilder(MapBuilderConfig(vocab_size=64), key=jax.random.key(0)).build_snapshot(kfs)
    reloc = MapRelocalizer(snapshot, K, min_inliers=1000)  # force full candidate sweep
    q = kfs[3]
    reloc.relocalize(q.keypoints, q.descriptors, q.valid)  # warmup
    report = {}
    with measured(report):
        for _ in range(queries):
            reloc.relocalize(q.keypoints, q.descriptors, q.valid)
    emit("relocalization_query", queries / max(report["elapsed_s"], 1e-9), "queries/s", **report)

if __name__ == "__main__":
    main()
