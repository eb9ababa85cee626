"""Queue/breaker/reorder primitive throughput
(parity: reference benchmark_ingestion_control_plane.py)."""
from benchmarks._harness import run_benchmark

def main(n_ops: int = 100_000):
    from mvslam_tpu.runtime.ingestion_control import AdaptiveBoundedQueue, CircuitBreaker, DeterministicReorderBuffer

    def workload():
        q = AdaptiveBoundedQueue(1024)
        for i in range(n_ops // 2):
            q.put(i)
            q.get()
        cb = CircuitBreaker()
        for i in range(n_ops // 4):
            cb.record_success()
        buf = DeterministicReorderBuffer()
        for i in range(n_ops // 4):
            buf.push(i, i)
        buf.pop_ready()

    run_benchmark("ingestion_control_ops", workload, items=n_ops, unit="ops/s")

if __name__ == "__main__":
    main()
