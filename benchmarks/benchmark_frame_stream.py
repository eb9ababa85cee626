"""Frame-stream throughput (parity: reference benchmark_frame_stream.py:36-60)."""
import numpy as np
from benchmarks._harness import run_benchmark

def synthetic_read(path):
    idx = int(str(path).split("_")[-1])
    return np.random.default_rng(idx).integers(0, 255, size=(370, 1226), dtype=np.uint8)

def main(n_frames: int = 200):
    from mvslam_tpu.runtime.frame_stream import FrameStream
    stream = FrameStream([f"frame_{i}" for i in range(n_frames)], read_fn=synthetic_read, buffer_size=16)
    run_benchmark("frame_stream_throughput", lambda: sum(1 for _ in stream), items=n_frames, unit="frames/s")

if __name__ == "__main__":
    main()
