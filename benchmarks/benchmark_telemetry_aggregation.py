"""Streaming telemetry digest throughput (parity: reference benchmark_telemetry_aggregation.py)."""
from benchmarks._harness import run_benchmark

def main(events: int = 20000):
    from mvslam_tpu.eval.telemetry_intelligence import TelemetryDigest
    payload = [
        {"name": f"stage_{i % 5}", "duration_s": 0.001 * (i % 7),
         "metadata": {"success": True, "memory_delta_bytes": i}}
        for i in range(events)
    ]

    def workload():
        digest = TelemetryDigest()
        for event in payload:
            digest.update(event)
        return digest.summary()

    run_benchmark("telemetry_aggregation", workload, items=events, unit="events/s")

if __name__ == "__main__":
    main()
