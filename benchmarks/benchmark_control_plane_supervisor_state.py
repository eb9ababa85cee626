"""Supervisor state digest cost (parity: reference benchmark_control_plane_supervisor_state.py)."""
from benchmarks._harness import run_benchmark

def main(n: int = 500):
    from mvslam_tpu.runtime.supervisor import ControlPlaneSupervisor
    sup = ControlPlaneSupervisor(clock=lambda: 0.0)
    for k in range(50):
        sup.update({f"stage{k % 4}": ({"backpressure_ratio": 0.9}, [{"type": "error", "message": "failed"}])})
    run_benchmark("supervisor_digest", lambda: [sup.digest() for _ in range(n)], items=n, unit="digests/s")

if __name__ == "__main__":
    main()
