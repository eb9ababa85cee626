"""Seed derivation throughput at 200k iters (parity: reference benchmark_determinism_registry.py:13-36)."""
from benchmarks._harness import run_benchmark

def main(n: int = 200_000):
    from mvslam_tpu.core.determinism import DeterminismRegistry
    reg = DeterminismRegistry(seed=42)
    run_benchmark("seed_derivation", lambda: [reg.seed_for(f"c{i % 977}") for i in range(n)], items=n, unit="seeds/s")

if __name__ == "__main__":
    main()
