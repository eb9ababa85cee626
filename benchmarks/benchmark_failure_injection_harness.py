"""Chaos harness throughput (parity: reference benchmark_failure_injection_harness.py:16-35)."""
from benchmarks._harness import run_benchmark

def main(steps: int = 5000):
    from mvslam_tpu.runtime.failure_injection import (
        FailureInjectionChaosHarness, FailureInjectionConfig, build_failure_plan)
    plan = build_failure_plan(FailureInjectionConfig(seed=1, num_steps=steps, failure_probability=0.1))
    harness = FailureInjectionChaosHarness(plan, num_threads=4)
    run_benchmark("failure_injection_chaos", harness.run, items=steps, unit="steps/s")

if __name__ == "__main__":
    main()
