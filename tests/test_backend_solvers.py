"""Factor graph + solver tests (reference parity: tests/test_pose_graph_loop.py,
tests/test_block_sparse_solver.py, tests/test_factor_graph_stress.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mvslam_tpu.backend.factor_graph import (
    MODELS,
    FactorGraph,
    SE2Model,
    SE3Model,
    make_linearize_fn,
    make_residual_fn,
)
from mvslam_tpu.backend.pose_graph import PoseGraph, PoseGraph3D, PoseGraphSim3D
from mvslam_tpu.backend.solvers import (
    DEFAULT_REGISTRY,
    RobustLoss,
    SolverConfig,
    conditioning_stats,
    solve_problem,
)


class TestModels:
    def test_se2_residual_zero_for_exact(self):
        m = SE2Model()
        xi = jnp.asarray([1.0, 2.0, 0.3])
        delta = jnp.asarray([0.5, -0.1, 0.2])
        xj = m.compose(xi, delta)
        res = m.residual(xi, xj, delta)
        assert np.abs(np.asarray(res)).max() < 1e-6

    def test_se3_residual_zero_for_exact(self):
        m = SE3Model()
        xi = jnp.asarray([1.0, 2.0, 3.0, 0.1, -0.2, 0.3])
        delta = jnp.asarray([0.5, -0.1, 0.2, 0.05, 0.02, -0.04])
        xj = m.compose(xi, delta)
        res = m.residual(xi, xj, delta)
        assert np.abs(np.asarray(res)).max() < 1e-5

    def test_sim3_residual_zero_for_exact(self):
        m = MODELS["sim3"]
        xi = jnp.asarray([1.0, 2.0, 3.0, 0.1, -0.2, 0.3, 0.2])
        delta = jnp.asarray([0.5, -0.1, 0.2, 0.05, 0.02, -0.04, -0.1])
        xj = m.compose(xi, delta)
        res = m.residual(xi, xj, delta)
        assert np.abs(np.asarray(res)).max() < 1e-5

    def test_linearize_matches_fd(self):
        m = SE2Model()
        lin = make_linearize_fn(m)
        x = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.2, 0.4]])
        edges = jnp.asarray([[0, 1]], dtype=jnp.int32)
        meas = jnp.asarray([[0.9, 0.1, 0.35]])
        w = jnp.asarray([1.0])
        res, Ji, Jj = lin(x, edges, meas, w)
        eps = 1e-4
        for k in range(3):
            xp = x.at[1, k].add(eps)
            xm = x.at[1, k].add(-eps)
            rfn = make_residual_fn(m)
            fd = (rfn(xp, edges, meas, w) - rfn(xm, edges, meas, w)) / (2 * eps)
            assert np.allclose(np.asarray(Jj[0, :, k]), np.asarray(fd[0]), atol=1e-2)


class TestRobustLoss:
    def test_huber_quadratic_then_linearish(self):
        loss = RobustLoss("huber", scale=1.0)
        s = jnp.asarray([0.25, 4.0])
        rho = np.asarray(loss.rho(s))
        assert rho[0] == pytest.approx(0.25)
        assert rho[1] < 4.0  # deweighted
        w = np.asarray(loss.weight(s))
        assert w[0] == 1.0 and w[1] < 1.0

    def test_all_losses_finite(self):
        for name in ("trivial", "huber", "cauchy", "tukey"):
            loss = RobustLoss(name, scale=2.0)
            s = jnp.asarray([0.0, 1.0, 100.0])
            assert np.isfinite(np.asarray(loss.rho(s))).all()
            assert np.isfinite(np.asarray(loss.weight(s))).all()


def square_trajectory_graph(noise=0.05, seed=0):
    """Noisy square loop in SE(2): odometry drifts, loop closure fixes it."""
    rng = np.random.default_rng(seed)
    g = PoseGraph(solver="gauss_newton")
    true_deltas = [[1.0, 0.0, 0.0]] * 4 + [[0.0, 0.0, np.pi / 2]]
    deltas = []
    for side in range(4):
        for _ in range(4):
            deltas.append([1.0, 0.0, 0.0])
        deltas.append([0.0, 0.0, np.pi / 2])
    for d in deltas:
        noisy = np.asarray(d) + rng.normal(scale=noise, size=3) * [1, 1, 0.5]
        g.add_pose(noisy)
    return g


class TestPoseGraphs:
    def test_se2_loop_closure_reduces_endpoint_error(self):
        g = square_trajectory_graph()
        # Ground truth: trajectory returns to start.
        before = np.linalg.norm(g.params[-1][:2])
        g.add_loop(0, len(g) - 1, np.zeros(3), weight=10.0)
        result = g.optimize(SolverConfig(max_iterations=25, damping=1e-4))
        after = np.linalg.norm(g.params[-1][:2])
        assert result.final_cost < result.initial_cost
        assert after < before * 0.5

    def test_se3_chain_and_loop(self):
        rng = np.random.default_rng(1)
        g = PoseGraph3D()
        for k in range(10):
            delta = np.asarray([1.0, 0, 0, 0, 0, 0.1]) + rng.normal(scale=0.02, size=6)
            g.add_pose(delta)
        g.add_loop(0, 10, np.asarray([10.0, 0, 0, 0, 0, 1.0]), weight=5.0)
        result = g.optimize(SolverConfig(max_iterations=20, damping=1e-4))
        assert result.final_cost < result.initial_cost
        assert g.poses().shape == (11, 4, 4)

    def test_sim3_scale_correction(self):
        g = PoseGraphSim3D()
        # Each step claims unit translation but accumulated scale drift.
        for k in range(6):
            g.add_pose(np.asarray([1.0, 0, 0, 0, 0, 0, 0.05]))
        g.add_loop(0, 6, np.asarray([6.0, 0, 0, 0, 0, 0, 0.0]), weight=10.0)
        result = g.optimize(SolverConfig(max_iterations=25, damping=1e-4))
        assert result.final_cost < result.initial_cost
        # log-scales should shrink towards 0
        assert abs(g.params[-1][6]) < 0.3

    def test_snapshot_digest_deterministic(self):
        g1 = square_trajectory_graph(seed=3)
        g2 = square_trajectory_graph(seed=3)
        assert g1.snapshot().digest == g2.snapshot().digest
        g2.add_loop(0, 3, np.zeros(3))
        assert g1.snapshot().digest != g2.snapshot().digest


class TestSolvers:
    def _problem(self):
        g = square_trajectory_graph()
        g.add_loop(0, len(g) - 1, np.zeros(3), weight=10.0)
        return g._build_graph().build_problem()

    def test_cg_matches_cholesky(self):
        problem = self._problem()
        r_chol = solve_problem(problem, SolverConfig(max_iterations=15, method="cholesky", damping=1e-4))
        r_cg = solve_problem(problem, SolverConfig(max_iterations=15, method="cg", damping=1e-4, cg_iterations=100))
        assert r_chol.final_cost < r_chol.initial_cost
        assert r_cg.final_cost == pytest.approx(r_chol.final_cost, rel=0.2)

    def test_scipy_fallback(self):
        pytest.importorskip("scipy")
        problem = self._problem()
        result = DEFAULT_REGISTRY.get("scipy").solve(problem, SolverConfig(max_iterations=30))
        assert result.final_cost < result.initial_cost

    def test_registry(self):
        assert set(DEFAULT_REGISTRY.names()) >= {"gauss_newton", "scipy"}
        with pytest.raises(KeyError):
            DEFAULT_REGISTRY.get("nope")

    def test_diagnostics_and_histogram(self):
        problem = self._problem()
        result = solve_problem(problem, SolverConfig(max_iterations=10, damping=1e-4))
        assert len(result.diagnostics) >= 1
        assert result.diagnostics[0].cost >= result.diagnostics[-1].cost
        hist = result.residual_histogram
        assert sum(hist.counts) == problem.num_factors
        assert len(hist.edges) == len(hist.counts) + 1

    def test_empty_problem(self):
        g = FactorGraph(model_name="se2")
        g.add_variable(0, np.zeros(3))
        result = solve_problem(g.build_problem(), SolverConfig())
        assert result.converged

    def test_conditioning_stats(self):
        problem = self._problem()
        stats = conditioning_stats(problem, damping=1e-6)
        assert stats["condition_number"] > 1.0
        assert np.isfinite(stats["condition_number"])

    def test_anchor_is_fixed(self):
        problem = self._problem()
        result = solve_problem(problem, SolverConfig(max_iterations=10, damping=1e-4))
        assert np.allclose(result.x[0], np.asarray(problem.x0[0]), atol=1e-6)


class TestBucketPadding:
    """Bucket padding (solve_problem pads variables/edges to power-of-two
    buckets so growing pose graphs reuse compiled programs) must be
    numerically invisible: zero-weight edges scale residuals AND
    Jacobians, and padded variables are anchored identity rows, so the
    padded terms are exact zeros. The larger dense solve / segment_sum
    shapes may still differ in reduction order, so agreement is
    ULP-tight, not bitwise (measured max 2.4e-7 over 12 GN iterations)."""

    def _problem(self, n_loops=1):
        g = square_trajectory_graph()
        for k in range(n_loops):
            g.add_loop(k % 3, len(g) - 1 - (k % 2), np.zeros(3), weight=10.0)
        return g._build_graph().build_problem()

    def test_padding_is_numerically_invisible(self):
        from mvslam_tpu.backend.solvers import gauss_newton_core

        problem = self._problem()
        # Sizes must actually trigger padding, or the test is vacuous.
        assert problem.num_variables & (problem.num_variables - 1) or \
            problem.num_factors & (problem.num_factors - 1)
        config = SolverConfig(max_iterations=12, damping=1e-4)
        padded = solve_problem(problem, config)
        x_raw, cost_raw, *_ = gauss_newton_core(
            jnp.asarray(problem.x0),
            jnp.asarray(problem.edges, jnp.int32),
            jnp.asarray(problem.measurements),
            jnp.asarray(problem.weights),
            jnp.asarray(problem.anchor_mask, bool),
            problem.model_name,
            config,
        )
        np.testing.assert_allclose(padded.x, np.asarray(x_raw), atol=1e-5, rtol=1e-5)
        assert padded.final_cost == pytest.approx(float(cost_raw), rel=1e-6, abs=1e-8)

    def test_sizes_within_band_share_one_program(self):
        # solve_problem dispatches the PACKED wrapper (one-fetch output
        # packing), so that is the program whose cache must not grow.
        from mvslam_tpu.backend.solvers import _bucket, gauss_newton_core_packed

        config = SolverConfig(max_iterations=4, damping=1e-4)
        base = self._problem(n_loops=1)
        cache_before = gauss_newton_core_packed._cache_size()
        solve_problem(base, config)
        first = gauss_newton_core_packed._cache_size()
        # Grow the graph loop-by-loop (the offline pipeline's access
        # pattern); every size inside the same (variables, edges) bucket
        # band must hit the already-compiled program.
        grown = self._problem(n_loops=2)
        assert _bucket(grown.num_variables) == _bucket(base.num_variables)
        assert _bucket(grown.num_factors) == _bucket(base.num_factors)
        solve_problem(grown, config)
        assert gauss_newton_core_packed._cache_size() == first > cache_before

    def test_histogram_counts_real_factors_only(self):
        problem = self._problem()
        result = solve_problem(problem, SolverConfig(max_iterations=6, damping=1e-4))
        assert sum(result.residual_histogram.counts) == problem.num_factors
