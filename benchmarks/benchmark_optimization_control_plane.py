"""Supervised solver runs/s (parity: reference benchmark_optimization_control_plane.py)."""
import numpy as np
from benchmarks._harness import run_benchmark

def main(runs: int = 10):
    from mvslam_tpu.backend.optimization_control import OptimizationSupervisor
    from mvslam_tpu.backend.pose_graph import PoseGraph3D
    from mvslam_tpu.backend.solvers import SolverConfig
    rng = np.random.default_rng(0)
    g = PoseGraph3D()
    for _ in range(60):
        g.add_pose(np.asarray([1.0, 0, 0, 0, 0, 0.1]) + rng.normal(scale=0.02, size=6))
    g.add_loop(0, 60, np.zeros(6), weight=5.0)
    problem = g._build_graph().build_problem()
    sup = OptimizationSupervisor()
    cfg = SolverConfig(max_iterations=10, damping=1e-4)
    sup.run(problem, "gauss_newton", cfg)  # warmup
    run_benchmark("optimization_supervised_runs",
                  lambda: [sup.run(problem, "gauss_newton", cfg) for _ in range(runs)],
                  items=runs, unit="runs/s")

if __name__ == "__main__":
    main()
