"""Governance runner overhead (parity: reference benchmark_benchmark_governance.py)."""
from benchmarks._harness import run_benchmark

def main(n: int = 5):
    from mvslam_tpu.eval.governance import BenchmarkSpec, run_benchmark as run_gov
    spec = BenchmarkSpec(name="noop", command=["python", "-c", "print('{\"metric\": \"x\", \"value\": 1}')"])
    run_benchmark("governance_subprocess", lambda: [run_gov(spec) for _ in range(n)], items=n, unit="runs/s")

if __name__ == "__main__":
    main()
