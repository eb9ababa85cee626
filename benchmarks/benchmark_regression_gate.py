"""Regression-gate comparison throughput (parity: reference benchmark_regression_gate.py)."""
from benchmarks._harness import run_benchmark

def main(n: int = 5000):
    from mvslam_tpu.eval.baselines import MetricThreshold, compare_metrics
    thresholds = {f"m{i}": MetricThreshold(direction="lower", tolerance=0.05) for i in range(20)}
    current = {f"m{i}": 1.0 + (i % 3) * 0.01 for i in range(20)}
    baseline = {f"m{i}": 1.0 for i in range(20)}
    run_benchmark("gate_comparisons", lambda: [compare_metrics(current, baseline, thresholds) for _ in range(n)],
                  items=n * 20, unit="metrics/s")

if __name__ == "__main__":
    main()
