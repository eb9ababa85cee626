"""Loop-closure validation throughput (parity: reference benchmark_loop_closure_validation.py)."""
from benchmarks._harness import run_benchmark

def main(samples: int = 5000):
    from mvslam_tpu.loopclosure.validation import LoopClosureSample, validate_loop_closures
    batch = [
        LoopClosureSample(
            query_frame=100 + i, candidate_frame=i % 50,
            inlier_ratio=0.3 + (i % 7) * 0.1, reprojection_error_px=1.0 + (i % 5) * 0.5,
            match_count=20 + i % 80, rotation_error_deg=(i % 12), translation_error=(i % 4) * 0.3,
            is_true_loop=i % 3 == 0,
        )
        for i in range(samples)
    ]
    run_benchmark("loop_validation", lambda: validate_loop_closures(batch), items=samples, unit="samples/s")

if __name__ == "__main__":
    main()
