"""Event digest throughput at 10k events (parity: reference benchmark_event_stream_digest.py:32+)."""
from benchmarks._harness import run_benchmark

def main(events: int = 10_000):
    from mvslam_tpu.core.integrity import stable_event_digest
    payload = [
        {"type": f"t{i % 9}", "message": "m", "timestamp_s": float(i), "metadata": {"i": i}}
        for i in range(events)
    ]
    run_benchmark("event_stream_digest", lambda: stable_event_digest(payload), items=events, unit="events/s")

if __name__ == "__main__":
    main()
