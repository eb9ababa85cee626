"""Block-CG Gauss-Newton solve at 60 poses: elapsed, peak MB, residual norm
(parity: reference benchmark_block_sparse_solver.py:16-52)."""
import json
import numpy as np
from pathlib import Path
from benchmarks._harness import emit, measured

def main(nodes: int = 60, out: str = "artifacts/block_sparse_solver_benchmark.json"):
    from mvslam_tpu.backend.pose_graph import PoseGraph3D
    from mvslam_tpu.backend.solvers import SolverConfig
    rng = np.random.default_rng(0)
    g = PoseGraph3D()
    for _ in range(nodes):
        g.add_pose(np.asarray([1.0, 0, 0, 0, 0, 0.1]) + rng.normal(scale=0.02, size=6))
    g.add_loop(0, nodes, np.zeros(6), weight=5.0)
    cfg = SolverConfig(max_iterations=15, damping=1e-4, method="cg", cg_iterations=100)
    g.optimize(cfg)  # warmup
    report = {}
    with measured(report):
        result = g.optimize(cfg)
    payload = {"elapsed_s": report["elapsed_s"], "peak_memory_mb": report["peak_memory_mb"],
               "residual_norm": result.final_cost, "poses": nodes}
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    Path(out).write_text(json.dumps(payload, indent=2))
    emit("block_sparse_gn_solve", report["elapsed_s"], "s", **payload)

if __name__ == "__main__":
    main()
