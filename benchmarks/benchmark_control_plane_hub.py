"""Hub k-way merge + digest throughput (parity: reference benchmark_control_plane_hub.py)."""
from benchmarks._harness import run_benchmark

def main(stages: int = 8, events_per_stage: int = 2000):
    from mvslam_tpu.runtime.hub import ControlPlaneHub, ControlPlaneStageAdapter
    adapters = [
        ControlPlaneStageAdapter(
            name=f"stage{s}",
            health_snapshot=lambda s=s: {"stage": f"stage{s}", "state": "healthy"},
            events=lambda s=s: [
                {"type": "tick", "message": str(i), "timestamp_s": float(i * stages + s), "metadata": {}}
                for i in range(events_per_stage)
            ],
        )
        for s in range(stages)
    ]
    hub = ControlPlaneHub(adapters)
    run_benchmark("hub_merge", hub.generate_report, items=stages * events_per_stage, unit="events/s")

if __name__ == "__main__":
    main()
