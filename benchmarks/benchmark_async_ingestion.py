"""Async ingestion pipeline throughput + failure counters
(parity: reference benchmark_async_ingestion.py)."""
import numpy as np
from benchmarks._harness import emit, measured

def synthetic_read(path):
    idx = int(str(path).split("_")[-1])
    if idx % 37 == 13:
        return None  # injected decode failure
    return np.random.default_rng(idx).integers(0, 255, size=(370, 1226), dtype=np.uint8)

def main(n_frames: int = 200):
    from mvslam_tpu.runtime.ingestion import AsyncIngestionPipeline, IngestionPipelineConfig
    pipe = AsyncIngestionPipeline(
        [f"frame_{i}" for i in range(n_frames)],
        config=IngestionPipelineConfig(num_workers=4, queue_capacity=16),
        read_fn=synthetic_read,
    )
    report = {}
    with measured(report):
        count = sum(1 for _ in pipe)
    fr = pipe.failure_report().to_dict()
    emit("async_ingestion_throughput", count / max(report["elapsed_s"], 1e-9), "frames/s", **report, **fr)

if __name__ == "__main__":
    main()
