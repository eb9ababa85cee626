"""Streaming frame-diagnostics summary throughput
(parity: reference benchmark_frame_diagnostics_summary.py)."""
import json
import tempfile
from pathlib import Path
from benchmarks._harness import run_benchmark

def main(frames: int = 20000):
    from mvslam_tpu.core.persistence import summarize_frame_diagnostics_streaming
    path = Path(tempfile.mkdtemp()) / "diag.json"
    path.write_text(json.dumps([
        {"frame_id": i, "pose_success": i % 11 != 0, "is_keyframe": i % 5 == 0,
         "num_matches": 100 + i % 50, "num_inliers": 80 + i % 40, "inlier_ratio": 0.8}
        for i in range(frames)
    ]))
    run_benchmark("frame_diagnostics_summary", lambda: summarize_frame_diagnostics_streaming(path),
                  items=frames, unit="frames/s")

if __name__ == "__main__":
    main()
