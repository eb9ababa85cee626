"""Supervisor FSM update throughput (parity: reference benchmark_control_plane_supervisor.py)."""
from benchmarks._harness import run_benchmark

def main(updates: int = 2000):
    from mvslam_tpu.runtime.supervisor import ControlPlaneSupervisor
    sup = ControlPlaneSupervisor(clock=lambda: 0.0)
    obs = {
        stage: ({"backpressure_ratio": 0.1, "breaker_trips": 0}, [{"type": "ok", "message": ""}])
        for stage in ("ingestion", "feature", "tracking", "optimization")
    }
    run_benchmark("supervisor_updates", lambda: [sup.update(obs) for _ in range(updates)],
                  items=updates, unit="updates/s")

if __name__ == "__main__":
    main()
