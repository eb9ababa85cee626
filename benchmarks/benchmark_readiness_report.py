"""Readiness rollup throughput (parity: reference benchmark_readiness_report.py)."""
from benchmarks._harness import run_benchmark

def main(n: int = 2000):
    from mvslam_tpu.eval.readiness import generate_readiness_report
    cp = {"stages": {f"s{i}": {"state": "healthy"} for i in range(8)}}
    ev = {"status": "pass", "aggregate": {"ATE_RMSE": 0.1}}
    tm = {"total_events": 100, "stages": {"a": {"errors": 0}}}
    run_benchmark("readiness_report", lambda: [generate_readiness_report(cp, ev, tm) for _ in range(n)],
                  items=n, unit="reports/s")

if __name__ == "__main__":
    main()
