"""Drift evaluation throughput (parity: reference benchmark_telemetry_intelligence.py)."""
from benchmarks._harness import run_benchmark

def main(metrics: int = 5000):
    from mvslam_tpu.eval.telemetry_intelligence import TelemetryDriftEvaluator
    current = {f"m{i}": 1.0 + (i % 7) * 0.1 for i in range(metrics)}
    baseline = {f"m{i}": 1.0 for i in range(metrics)}
    ev = TelemetryDriftEvaluator()
    run_benchmark("telemetry_drift_eval", lambda: ev.evaluate(current, baseline), items=metrics, unit="metrics/s")

if __name__ == "__main__":
    main()
