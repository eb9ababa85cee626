"""Backpressure escalation loop (parity: reference benchmark_control_plane_backpressure_escalation.py)."""
from benchmarks._harness import run_benchmark

def main(ticks: int = 5000):
    from mvslam_tpu.runtime.ingestion_control import (
        AdaptiveBoundedQueue, DynamicWorkerPool, StageSupervisor)
    q = AdaptiveBoundedQueue(8)
    for i in range(8):
        q.put(i)
    sup = StageSupervisor(q, DynamicWorkerPool())
    run_benchmark("backpressure_ticks", lambda: [sup.tick() for _ in range(ticks)], items=ticks, unit="ticks/s")

if __name__ == "__main__":
    main()
