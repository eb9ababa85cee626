"""Bundle adjustment + optimization supervisor tests (reference parity:
tests/test_algorithmic_stability_gates.py, optimization control tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mvslam_tpu.backend.bundle_adjustment import (
    BundleAdjustmentConfig,
    Observation,
    run_bundle_adjustment,
    triangulate_points,
)
from mvslam_tpu.backend.optimization_control import (
    OptimizationControlConfig,
    OptimizationSupervisor,
)
from mvslam_tpu.backend.pose_graph import PoseGraph
from mvslam_tpu.backend.solvers import SolverConfig
from mvslam_tpu.geometry.lie import se3_matrix, so3_exp


def synthetic_ba_problem(W=4, P=40, noise_px=0.5, pose_noise=0.02, seed=0):
    rng = np.random.default_rng(seed)
    K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]])
    points = np.stack(
        [rng.uniform(-3, 3, P), rng.uniform(-2, 2, P), rng.uniform(6, 14, P)], axis=1
    )
    poses_true = []
    for w in range(W):
        R = np.asarray(so3_exp(jnp.asarray([0.0, 0.02 * w, 0.0], dtype=jnp.float64)))
        t = np.array([0.5 * w, 0.0, 0.0])
        poses_true.append(np.asarray(se3_matrix(jnp.asarray(R), jnp.asarray(t))))
    poses_true = np.stack(poses_true)

    observations = []
    for w in range(W):
        T_cw = np.linalg.inv(poses_true[w])
        cam = points @ T_cw[:3, :3].T + T_cw[:3, 3]
        uv = (cam[:, :2] / cam[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        uv += rng.normal(scale=noise_px, size=uv.shape)
        for p in range(P):
            observations.append(Observation(w, p, uv[p]))

    poses_init = poses_true.copy()
    for w in range(2, W):  # first two poses fix the gauge
        poses_init[w][:3, 3] += rng.normal(scale=pose_noise, size=3)
    points_init = points + rng.normal(scale=0.05, size=points.shape)
    return poses_true, poses_init, points, points_init, observations, K


class TestBundleAdjustment:
    def test_reduces_reprojection_cost(self):
        poses_true, poses_init, pts_true, pts_init, obs, K = synthetic_ba_problem()
        result = run_bundle_adjustment(
            poses_init, pts_init, obs, K, BundleAdjustmentConfig(max_iterations=8)
        )
        d = result.diagnostics
        assert not d.conditioning_tripped
        assert d.final_cost < d.initial_cost * 0.5
        # Poses move toward truth.
        err_before = np.linalg.norm(poses_init[2:, :3, 3] - poses_true[2:, :3, 3])
        err_after = np.linalg.norm(result.poses[2:, :3, 3] - poses_true[2:, :3, 3])
        assert err_after < err_before

    def test_anchored_poses_fixed(self):
        _, poses_init, _, pts_init, obs, K = synthetic_ba_problem()
        result = run_bundle_adjustment(poses_init, pts_init, obs, K)
        assert np.allclose(result.poses[0], poses_init[0], atol=1e-6)
        # Gauge: pose 1's camera-frame translation (the scale pin) is fixed.
        t_cw_before = np.linalg.inv(poses_init[1])[:3, 3]
        t_cw_after = np.linalg.inv(result.poses[1])[:3, 3]
        assert np.allclose(t_cw_after, t_cw_before, atol=1e-5)

    def test_empty_observations_noop(self):
        poses = np.stack([np.eye(4)] * 3)
        result = run_bundle_adjustment(poses, np.zeros((0, 3)), [], np.eye(3))
        assert result.diagnostics.converged
        assert np.allclose(result.poses, poses)

    def test_condition_number_is_real(self):
        """Diagnostics carry the measured Schur-system conditioning, not a
        1.0 placeholder (VERDICT r2: 'the diagnostics lie about what was
        checked')."""
        _, poses_init, _, pts_init, obs, K = synthetic_ba_problem()
        result = run_bundle_adjustment(poses_init, pts_init, obs, K)
        d = result.diagnostics
        assert not d.conditioning_tripped
        assert np.isfinite(d.condition_number)
        assert 1.0 < d.condition_number < 1e8

    def test_ill_conditioned_window_trips(self):
        """Far-away points make the free poses' translations unobservable:
        the reduced system's condition number blows up and the gate must
        trip, returning the prior state (parity: reference
        bundle_adjustment.py:135-158)."""
        rng = np.random.default_rng(4)
        K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]])
        W, P = 3, 30
        # Points ~1e6 units away; camera baseline ~1 unit.
        points = np.stack(
            [rng.uniform(-3e5, 3e5, P), rng.uniform(-2e5, 2e5, P), rng.uniform(2e6, 3e6, P)],
            axis=1,
        )
        poses = []
        for w in range(W):
            T = np.eye(4)
            T[0, 3] = 0.5 * w
            poses.append(T)
        poses = np.stack(poses)
        observations = []
        for w in range(W):
            T_cw = np.linalg.inv(poses[w])
            cam = points @ T_cw[:3, :3].T + T_cw[:3, 3]
            uv = (cam[:, :2] / cam[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
            for p in range(P):
                observations.append(Observation(w, p, uv[p]))
        result = run_bundle_adjustment(
            poses, points, observations, K, BundleAdjustmentConfig(max_iterations=4)
        )
        d = result.diagnostics
        assert d.conditioning_tripped
        assert d.condition_number > 1e8
        np.testing.assert_allclose(result.poses, poses)

    def test_triangulate_points(self):
        poses_true, _, pts_true, _, obs, K = synthetic_ba_problem(noise_px=0.0)
        uv1 = np.stack([o.uv for o in obs if o.pose_index == 0])
        uv2 = np.stack([o.uv for o in obs if o.pose_index == 3])
        X = triangulate_points(poses_true[0], poses_true[3], uv1, uv2, K)
        assert np.abs(X - pts_true).max() < 0.1


class TestOptimizationSupervisor:
    def _graph(self, seed=0):
        rng = np.random.default_rng(seed)
        g = PoseGraph()
        for _ in range(12):
            g.add_pose(np.asarray([1.0, 0, 0.15]) + rng.normal(scale=0.03, size=3))
        g.add_loop(0, 12, np.zeros(3), weight=5.0)
        return g

    def test_supervised_solve(self):
        sup = OptimizationSupervisor(clock=lambda: 0.0)
        g = self._graph()
        g.supervisor = sup
        result = g.optimize(SolverConfig(max_iterations=15, damping=1e-4))
        assert result.final_cost < result.initial_cost
        report = sup.last_report
        assert report.attempts >= 1
        assert not report.conditioning_tripped
        assert report.snapshot.digest
        health = sup.health_snapshot()
        assert health["runs"] == 1
        assert health["event_digest"]

    def test_conditioning_gate_trips(self):
        cfg = OptimizationControlConfig(max_condition_number=1.0)  # impossible
        sup = OptimizationSupervisor(cfg, clock=lambda: 0.0)
        g = self._graph()
        problem = g._build_graph().build_problem()
        result = sup.run(problem, "gauss_newton", SolverConfig())
        assert result.status == -2
        assert np.allclose(result.x, np.asarray(problem.x0))
        assert sup.last_report.conditioning_tripped

    def test_regression_gate(self):
        sup = OptimizationSupervisor(clock=lambda: 0.0)
        problem = self._graph()._build_graph().build_problem()
        sup.run(problem, "gauss_newton", SolverConfig(max_iterations=15, damping=1e-4))
        assert sup.last_report.regression.status == "no_baseline"
        sup.run(problem, "gauss_newton", SolverConfig(max_iterations=15, damping=1e-4))
        assert sup.last_report.regression.status == "pass"

    def test_event_digest_deterministic(self):
        def run_once():
            sup = OptimizationSupervisor(clock=lambda: 0.0)
            problem = self._graph(seed=2)._build_graph().build_problem()
            sup.run(problem, "gauss_newton", SolverConfig(max_iterations=10, damping=1e-4))
            return sup.health_snapshot()["event_digest"]

        assert run_once() == run_once()


class TestWindowBundleAdjuster:
    def test_refine_window_from_keyframes(self):
        """Windowed BA over synthetic keyframes observing a shared 3D scene."""
        import jax
        import jax.numpy as jnp

        from mvslam_tpu.backend.bundle_adjustment import WindowBundleAdjuster
        from mvslam_tpu.backend.keyframes import Keyframe
        from mvslam_tpu.ops.brief import _pack_bits

        rng = np.random.default_rng(0)
        K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]])
        n = 96
        pts3d = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(8, 16, n)], axis=1
        )
        # Shared descriptors so adjacent keyframes match 1:1.
        desc = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
        kfs = []
        poses_true = []
        for w in range(3):
            T = np.eye(4)
            T[0, 3] = 0.6 * w
            poses_true.append(T.copy())
            T_cw = np.linalg.inv(T)
            cam = pts3d @ T_cw[:3, :3].T + T_cw[:3, 3]
            uv = (cam[:, :2] / cam[:, 2:]) * [400, 400] + [160, 120]
            uv += rng.normal(scale=0.3, size=uv.shape)
            pose_init = T.copy()
            if w == 2:
                pose_init[:3, 3] += rng.normal(scale=0.05, size=3)
            kfs.append(
                Keyframe(
                    frame_id=w, timestamp=0.1 * w, pose=pose_init,
                    keypoints=uv.astype(np.float32), descriptors=desc,
                    valid=np.ones(n, bool),
                )
            )
        perturbed = kfs[2].pose[:3, 3].copy()
        adjuster = WindowBundleAdjuster(K)
        result = adjuster.refine_window(kfs)
        assert result is not None
        d = adjuster.last_diagnostics
        assert not d.conditioning_tripped
        assert d.final_cost <= d.initial_cost
        # Third pose moves toward truth.
        err_before = np.linalg.norm(perturbed - poses_true[2][:3, 3])
        err_after = np.linalg.norm(kfs[2].pose[:3, 3] - poses_true[2][:3, 3])
        assert err_after <= err_before + 1e-6

    def test_degenerate_window_returns_none(self, monkeypatch):
        """When every chained track fails the triangulation sanity gate
        (non-finite points), refine_window must return None, not crash on
        an empty observation stack (regression)."""
        import mvslam_tpu.backend.bundle_adjustment as ba_mod
        from mvslam_tpu.backend.bundle_adjustment import WindowBundleAdjuster
        from mvslam_tpu.backend.keyframes import Keyframe

        rng = np.random.default_rng(1)
        K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]])
        n = 64
        desc = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
        kfs = []
        for w in range(3):
            T = np.eye(4)
            T[0, 3] = 0.5 * w
            uv = rng.uniform([0, 0], [320, 240], size=(n, 2)).astype(np.float32)
            kfs.append(
                Keyframe(
                    frame_id=w, timestamp=0.1 * w, pose=T,
                    keypoints=uv, descriptors=desc, valid=np.ones(n, bool),
                )
            )
        monkeypatch.setattr(
            ba_mod,
            "triangulate_points",
            lambda *a, **k: np.full((len(a[2]), 3), np.inf),
        )
        adjuster = WindowBundleAdjuster(K)
        assert adjuster.refine_window(kfs) is None

    def test_pair_cache_reuses_sliding_window_matches(self):
        """Consecutive pairs shared between overlapping windows are served
        from the pair cache (match+RANSAC run once per pair)."""
        import jax

        from mvslam_tpu.backend.bundle_adjustment import WindowBundleAdjuster
        from mvslam_tpu.backend.keyframes import Keyframe

        rng = np.random.default_rng(0)
        K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]])
        n = 96
        pts3d = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(8, 16, n)], axis=1
        )
        desc = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)

        def kf(w):
            T = np.eye(4)
            T[0, 3] = 0.6 * w
            T_cw = np.linalg.inv(T)
            cam = pts3d @ T_cw[:3, :3].T + T_cw[:3, 3]
            uv = (cam[:, :2] / cam[:, 2:]) * [400, 400] + [160, 120]
            return Keyframe(
                frame_id=w, timestamp=0.1 * w, pose=T,
                keypoints=uv.astype(np.float32), descriptors=desc,
                valid=np.ones(n, bool),
            )

        adjuster = WindowBundleAdjuster(K)
        key = jax.random.PRNGKey(0)
        adjuster.refine_window([kf(0), kf(1), kf(2)], key=key)
        assert set(adjuster._pair_cache) == {(0, 1), (1, 2)}
        cached_01 = adjuster._pair_cache[(0, 1)]
        adjuster.refine_window([kf(1), kf(2), kf(3)], key=key)
        assert set(adjuster._pair_cache) == {(0, 1), (1, 2), (2, 3)}
        assert adjuster._pair_cache[(0, 1)] is cached_01  # untouched, not recomputed

    def test_slam_system_with_local_ba(self, tmp_path):
        """enable_local_ba=True runs end-to-end without breaking tracking."""
        import sys
        sys.path.insert(0, str(tmp_path))  # noop, keeps locals tidy

        from mvslam_tpu.backend.keyframes import KeyframeConfig
        from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
        from mvslam_tpu.frontend.pose_estimator import RobustPoseEstimatorConfig
        from mvslam_tpu.slam.api import SLAMSystem, SLAMSystemConfig

        rng = np.random.default_rng(0)
        num, h, w, shift = 6, 96, 160, 4
        base = rng.uniform(0, 30, size=(h, w + shift * num)).astype(np.float32)
        for _ in range(90):
            y, x, s = rng.integers(22, h - 28), rng.integers(22, base.shape[1] - 28), rng.integers(3, 7)
            base[y : y + s, x : x + s] = rng.uniform(140, 255)
        half = h // 2
        frames = []
        for i in range(num):
            top = base[:half, (i * shift) // 2 : (i * shift) // 2 + w]
            bottom = base[half:, i * shift : i * shift + w]
            frames.append(np.concatenate([top, bottom], axis=0))
        system = SLAMSystem(
            SLAMSystemConfig(
                run_id="ba", output_root=tmp_path, fx=100.0, fy=100.0, cx=80.0, cy=48.0,
                feature=FeaturePipelineConfig(num_features=128, max_matches=64),
                pose=RobustPoseEstimatorConfig(num_hypotheses=64),
                keyframe=KeyframeConfig(min_translation=0.05, window_size=3),
                enable_local_ba=True,
            )
        )
        diags = system.run_sequence(frames)
        assert sum(d.pose_success for d in diags) >= 4
        result = system.finalize_run()
        assert result.num_keyframes >= 3
        # local_ba telemetry stage fired
        names = {e.name for e in system.telemetry.events()}
        assert "local_ba" in names
