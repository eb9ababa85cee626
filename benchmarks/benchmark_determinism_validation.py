"""Run-dir digest throughput (parity: reference benchmark_determinism_validation.py)."""
import json
import tempfile
from pathlib import Path
import numpy as np
from benchmarks._harness import run_benchmark

def main(artifacts: int = 50):
    from mvslam_tpu.eval.determinism_validation import build_run_digest
    tmp = Path(tempfile.mkdtemp())
    for i in range(artifacts):
        np.savez(tmp / f"a{i}.npz", data=np.arange(1000) + i)
        (tmp / f"m{i}.json").write_text(json.dumps({"i": i}))
    run_benchmark("run_digest", lambda: build_run_digest(tmp), items=artifacts * 2, unit="artifacts/s")

if __name__ == "__main__":
    main()
