"""CI severity scoring throughput (parity: reference benchmark_ci_runner.py)."""
from benchmarks._harness import run_benchmark

def main(n: int = 20000):
    from mvslam_tpu.eval.ci_runner import SeverityWeights, score_run
    weights = SeverityWeights()
    detail = {"baseline_comparisons": {"metrics": {"comparisons": [
        {"metric": "ATE_RMSE", "status": "regressed", "current": 1.3, "baseline": 1.0},
        {"metric": "RPE_RMSE", "status": "pass", "current": 1.0, "baseline": 1.0},
    ]}}}
    run_benchmark("ci_severity", lambda: [score_run(detail, weights) for _ in range(n)], items=n, unit="scores/s")

if __name__ == "__main__":
    main()
