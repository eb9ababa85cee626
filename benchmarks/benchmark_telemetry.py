"""Telemetry record overhead at 5000 events (parity: reference benchmark_telemetry.py:13-35)."""
from benchmarks._harness import run_benchmark

def main(events: int = 5000):
    from mvslam_tpu.core.telemetry import RunTelemetryRecorder, timed_event
    rec = RunTelemetryRecorder()

    def workload():
        for i in range(events):
            with timed_event(rec, "stage", metadata={"i": i}):
                pass

    run_benchmark("telemetry_record", workload, items=events, unit="events/s")

if __name__ == "__main__":
    main()
