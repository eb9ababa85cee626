"""Correlation-id derivation throughput (parity: reference benchmark_telemetry_correlation_summary.py)."""
from benchmarks._harness import run_benchmark

def main(n: int = 20000):
    from mvslam_tpu.core.telemetry import TelemetryCorrelationRegistry
    reg = TelemetryCorrelationRegistry(0, "hash", "run")
    run_benchmark("telemetry_correlation", lambda: [reg.correlation_id(f"stage_{i % 100}") for i in range(n)],
                  items=n, unit="ids/s")

if __name__ == "__main__":
    main()
