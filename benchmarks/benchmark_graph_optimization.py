"""SE2/SE3/Sim3 pose-graph solver wall time
(parity: reference benchmark_graph_optimization.py:22-60)."""
import numpy as np
from benchmarks._harness import emit, measured

def main(nodes: int = 200):
    from mvslam_tpu.backend.pose_graph import PoseGraph, PoseGraph3D, PoseGraphSim3D
    from mvslam_tpu.backend.solvers import SolverConfig
    rng = np.random.default_rng(0)
    for name, cls, dim in (("se2", PoseGraph, 3), ("se3", PoseGraph3D, 6), ("sim3", PoseGraphSim3D, 7)):
        g = cls()
        for _ in range(nodes):
            delta = np.zeros(dim); delta[0] = 1.0
            g.add_pose(delta + rng.normal(scale=0.02, size=dim))
        g.add_loop(0, nodes, np.zeros(dim), weight=5.0)
        cfg = SolverConfig(max_iterations=15, damping=1e-4)
        g.optimize(cfg)  # warmup/compile
        report = {}
        with measured(report):
            result = g.optimize(cfg)
        emit(f"pose_graph_{name}_optimize", report["elapsed_s"], "s",
             nodes=nodes, edges=nodes + 1, final_cost=result.final_cost, **report)

if __name__ == "__main__":
    main()
