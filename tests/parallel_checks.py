"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
from mvslam_tpu.frontend.pose_estimator import RobustPoseEstimatorConfig
from mvslam_tpu.geometry.projection import normalize_pixels
from mvslam_tpu.ops.ransac import RansacConfig, ransac_essential
from mvslam_tpu.parallel.mesh import (
    batched_track_pairs,
    make_mesh,
    sharded_ransac_essential,
)


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8


def textured(seed, h=96, w=128):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 30, size=(h, w)).astype(np.float32)
    for _ in range(50):
        y, x, s = rng.integers(22, h - 28), rng.integers(22, w - 28), rng.integers(3, 7)
        img[y : y + s, x : x + s] = rng.uniform(140, 255)
    return img


class TestBatchedTracking:
    def test_data_parallel_tracking(self):
        mesh = make_mesh(8)
        B = 8
        prev = np.stack([textured(s) for s in range(B)])
        nxt = np.stack([np.roll(f, 4, axis=1) for f in prev])
        K = jnp.asarray([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]], jnp.float32)
        fc = FeaturePipelineConfig(num_features=128, max_matches=64)
        pc = RobustPoseEstimatorConfig(num_hypotheses=64)
        feats, track = batched_track_pairs(mesh, jnp.asarray(prev), jnp.asarray(nxt), K, fc, pc)
        assert feats.xy.shape == (B, 128, 2)
        assert track.pose.rotation.shape == (B, 3, 3)
        assert int(jnp.sum(track.num_matches > 5)) >= 6  # most pairs track


class TestShardedRansac:
    def _problem(self, n=256, seed=0):
        from mvslam_tpu.geometry.lie import so3_exp

        rng = np.random.default_rng(seed)
        pts3d = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1, 1, n), rng.uniform(4, 10, n)], 1)
        R = np.asarray(so3_exp(jnp.asarray([0.03, -0.02, 0.01], dtype=jnp.float32)))
        t = np.array([0.5, 0.1, 0.05])
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        cam2 = pts3d @ R.T + t
        uv1 = (pts3d[:, :2] / pts3d[:, 2:]) * [500, 500] + [320, 240]
        uv2 = (cam2[:, :2] / cam2[:, 2:]) * [500, 500] + [320, 240]
        out = rng.choice(n, n // 4, replace=False)
        uv2[out] += 50.0
        Kj = jnp.asarray(K, jnp.float32)
        return (
            normalize_pixels(jnp.asarray(uv1, jnp.float32), Kj),
            normalize_pixels(jnp.asarray(uv2, jnp.float32), Kj),
        )

    def test_sharded_bit_equal_across_mesh_sizes(self):
        """Mesh-invariant determinism: identical hypotheses are drawn from
        the global key on ANY mesh size, so the winner model and inlier set
        are bit-equal to the single-device run (VERDICT r1 item 3)."""
        n1, n2 = self._problem()
        mask = jnp.ones(n1.shape[0], bool)
        # mesh_invariant=True on the UNSHARDED reference: the sharded
        # wrapper forces it, and bit-equality requires the same jaxpr.
        cfg = RansacConfig(num_hypotheses=256, threshold=2.0 / 500.0, mesh_invariant=True)
        res_single = ransac_essential(jax.random.key(0), n1, n2, mask, cfg)
        assert bool(res_single.success)
        assert int(res_single.num_inliers) > 150
        for n_dev in (1, 2, 8):
            mesh = make_mesh(n_dev)
            res = sharded_ransac_essential(mesh, jax.random.key(0), n1, n2, mask, cfg)
            np.testing.assert_array_equal(
                np.asarray(res.model), np.asarray(res_single.model),
                err_msg=f"model differs on {n_dev}-device mesh",
            )
            np.testing.assert_array_equal(
                np.asarray(res.inliers), np.asarray(res_single.inliers)
            )
            assert int(res.num_inliers) == int(res_single.num_inliers)

    def test_hypotheses_must_divide(self):
        mesh = make_mesh(8)
        n1, n2 = self._problem()
        with pytest.raises(ValueError, match="divide"):
            sharded_ransac_essential(
                mesh, jax.random.key(0), n1, n2, jnp.ones(n1.shape[0], bool),
                RansacConfig(num_hypotheses=100),
            )


class TestMeshedSuperwindow:
    def test_matches_single_device(self):
        """Frames-DP superwindow vs 1-chip run (VERDICT r1 item 4):
        detection/matching outputs are bit-identical (same jaxpr, same
        global RNG keys); pose values match to float tolerance — the
        per-device batch shape changes (B → B/n), so XLA may reassociate
        the refit accumulation (documented in track_superwindow_meshed)."""
        from test_accuracy import render_scene

        from mvslam_tpu.parallel.mesh import track_superwindow_meshed
        from mvslam_tpu.slam.tracking import bootstrap_frame, track_superwindow

        frames_np, _, (fx, fy, cx, cy), _ = render_scene(num_frames=17, h=160, w=224, seed=2)
        K = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)
        fc = FeaturePipelineConfig(num_features=256, max_matches=128)
        # mesh_invariant=True on the UNSHARDED reference run: the meshed
        # wrapper forces it, and the cross-mesh agreement contract is
        # defined over the pinned-reduction jaxpr (the single-chip product
        # default trades that agreement for ~2.4x faster RANSAC).
        pc = RobustPoseEstimatorConfig(
            num_hypotheses=128, adaptive_threshold=False, essential_threshold_px=2.0,
            mesh_invariant=True,
        )
        prev = bootstrap_frame(jnp.asarray(frames_np[0]), fc)
        frames = jnp.asarray(np.stack(frames_np[1:]))
        key = jax.random.key(7)

        last_ref, track_ref = track_superwindow(
            key, prev, frames, K, fc, pc, window=8, start_index=jnp.asarray(1, jnp.int32)
        )
        ref = np.asarray(track_ref.scalars_packed)  # (S, W, 25)

        for n_dev in (2, 8):
            mesh = make_mesh(n_dev)
            last, track = track_superwindow_meshed(
                mesh, key, prev, frames, K, fc, pc, window=8,
                start_index=jnp.asarray(1, jnp.int32),
            )
            got = np.asarray(track.scalars_packed)
            # Matching layer: bit-equal (num_matches idx 23, num_features idx 24).
            np.testing.assert_array_equal(got[..., 23:25], ref[..., 23:25])
            np.testing.assert_array_equal(
                np.asarray(last.descriptors), np.asarray(last_ref.descriptors)
            )
            np.testing.assert_array_equal(np.asarray(track.match_mask),
                                          np.asarray(track_ref.match_mask))
            # Pose layer: same model decision; the refit normal equations
            # accumulate through order-pinned tree sums (geometry.linalg
            # .tree_sum), so mesh size no longer reassociates the f32
            # refit — poses agree tightly for EVERY entry (VERDICT r2
            # item 8; was 0.25 for 95% before the tree-sum refits).
            np.testing.assert_array_equal(got[..., 12], ref[..., 12])  # use_essential
            diff = np.abs(got[..., :12] - ref[..., :12])
            assert diff.max() < 1e-3, diff.max()

    def test_run_to_run_deterministic(self):
        from test_accuracy import render_scene

        from mvslam_tpu.parallel.mesh import track_superwindow_meshed
        from mvslam_tpu.slam.tracking import bootstrap_frame

        frames_np, _, (fx, fy, cx, cy), _ = render_scene(num_frames=9, h=120, w=160, seed=4)
        K = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)
        fc = FeaturePipelineConfig(num_features=128, max_matches=64)
        pc = RobustPoseEstimatorConfig(num_hypotheses=64)
        prev = bootstrap_frame(jnp.asarray(frames_np[0]), fc)
        frames = jnp.asarray(np.stack(frames_np[1:]))
        mesh = make_mesh(8)
        runs = [
            np.asarray(
                track_superwindow_meshed(
                    mesh, jax.random.key(3), prev, frames, K, fc, pc, window=8
                )[1].scalars_packed
            )
            for _ in range(2)
        ]
        np.testing.assert_array_equal(runs[0], runs[1])

    def test_window_must_divide(self):
        from mvslam_tpu.parallel.mesh import track_superwindow_meshed
        from mvslam_tpu.slam.tracking import bootstrap_frame

        mesh = make_mesh(8)
        base = textured(1, h=64, w=96)
        fc = FeaturePipelineConfig(num_features=64, max_matches=32)
        pc = RobustPoseEstimatorConfig(num_hypotheses=64)
        prev = bootstrap_frame(jnp.asarray(base), fc)
        frames = jnp.asarray(np.stack([base] * 12))
        K = jnp.eye(3, dtype=jnp.float32)
        with pytest.raises(ValueError, match="divide"):
            track_superwindow_meshed(mesh, jax.random.key(0), prev, frames, K, fc, pc, window=12)


class TestShardedBundleAdjustment:
    def test_sharded_ba_matches_single_device(self):
        from test_bundle_adjustment import synthetic_ba_problem

        from mvslam_tpu.backend.bundle_adjustment import (
            BundleAdjustmentConfig,
            run_bundle_adjustment,
        )
        from mvslam_tpu.parallel.mesh import run_bundle_adjustment_sharded

        poses_true, poses_init, _, pts_init, obs, K = synthetic_ba_problem(W=4, P=48)
        cfg = BundleAdjustmentConfig(max_iterations=8)
        ref = run_bundle_adjustment(poses_init, pts_init, obs, K, cfg)
        assert not ref.diagnostics.conditioning_tripped
        for n_dev in (1, 8):
            mesh = make_mesh(n_dev)
            res = run_bundle_adjustment_sharded(mesh, poses_init, pts_init, obs, K, cfg)
            # Observation-sharded accumulation reorders float sums →
            # tolerance, not bit equality (documented in the wrapper).
            np.testing.assert_allclose(res.poses, ref.poses, atol=1e-4)
            np.testing.assert_allclose(res.points, ref.points, atol=1e-3)
            assert abs(res.diagnostics.final_cost - ref.diagnostics.final_cost) < 1e-2 * max(
                1.0, ref.diagnostics.final_cost
            )

    def test_sharded_ba_run_to_run_deterministic(self):
        from test_bundle_adjustment import synthetic_ba_problem

        from mvslam_tpu.backend.bundle_adjustment import BundleAdjustmentConfig
        from mvslam_tpu.parallel.mesh import run_bundle_adjustment_sharded

        _, poses_init, _, pts_init, obs, K = synthetic_ba_problem(W=3, P=32, seed=5)
        mesh = make_mesh(8)
        cfg = BundleAdjustmentConfig(max_iterations=6)
        a = run_bundle_adjustment_sharded(mesh, poses_init, pts_init, obs, K, cfg)
        b = run_bundle_adjustment_sharded(mesh, poses_init, pts_init, obs, K, cfg)
        np.testing.assert_array_equal(a.poses, b.poses)
        np.testing.assert_array_equal(a.points, b.points)

    def test_budget_rounded_to_mesh_multiple(self):
        """A non-mesh-multiple observation budget engages the sharded path
        (rounded up + masked padding) instead of raising — and matches the
        replicated solve."""
        from test_bundle_adjustment import synthetic_ba_problem

        from mvslam_tpu.backend.bundle_adjustment import (
            BundleAdjustmentConfig,
            run_bundle_adjustment,
        )
        from mvslam_tpu.parallel.mesh import run_bundle_adjustment_sharded

        _, poses_init, _, pts_init, obs, K = synthetic_ba_problem(W=3, P=32)
        mesh = make_mesh(8)
        cfg = BundleAdjustmentConfig(max_iterations=6)
        obs = obs[:90]  # 90 observations, budget request 100 → rounds to 104
        ref = run_bundle_adjustment(poses_init, pts_init, obs, K, cfg, max_observations=104)
        res = run_bundle_adjustment_sharded(
            mesh, poses_init, pts_init, obs, K, cfg, max_observations=100
        )
        np.testing.assert_allclose(res.poses, ref.poses, atol=1e-4)
        np.testing.assert_allclose(res.points, ref.points, atol=1e-3)


class TestShardedBoWIndex:
    def test_sharded_topk_matches_single_device(self):
        """Map-axis-sharded device BoW index: same jaxpr, only the buffer
        sharding differs — top-k matches the unsharded index."""
        from mvslam_tpu.loopclosure.device_index import DeviceBoWIndex

        rng = np.random.default_rng(0)
        hists = rng.uniform(0, 1, size=(24, 32)).astype(np.float32)
        hists /= np.linalg.norm(hists, axis=1, keepdims=True)
        q = hists[5] * 0.9 + 0.1 * hists[11]
        q /= np.linalg.norm(q)

        ref = DeviceBoWIndex.from_histograms(range(24), hists, capacity=32)
        ref_top = ref.topk(q, k=5)
        for n_dev in (2, 8):
            mesh = make_mesh(n_dev)
            sharded = DeviceBoWIndex.from_histograms(
                range(24), hists, capacity=32, mesh=mesh
            )
            got = sharded.topk(q, k=5)
            assert [f for f, _ in got] == [f for f, _ in ref_top]
            np.testing.assert_allclose(
                [s for _, s in got], [s for _, s in ref_top], atol=1e-6
            )

    def test_incremental_add_on_mesh(self):
        from mvslam_tpu.loopclosure.device_index import DeviceBoWIndex

        rng = np.random.default_rng(1)
        mesh = make_mesh(8)
        index = DeviceBoWIndex(16, capacity=16, mesh=mesh)
        hists = rng.uniform(0, 1, size=(10, 16)).astype(np.float32)
        hists /= np.linalg.norm(hists, axis=1, keepdims=True)
        for fid, h in enumerate(hists):
            index.add(fid, h)
        top = index.topk(hists[3], k=1)
        assert top[0][0] == 3
        assert top[0][1] == pytest.approx(1.0, abs=1e-5)
        # Output sharding is preserved by the insert program itself.
        assert index._buf.sharding == index._sharding

    def test_insert_is_sharding_preserving_no_collectives(self):
        """An insert on a mesh must update one row of one shard — the
        compiled program contains no all-gather/all-reduce (i.e. no
        full-buffer reshard per keyframe insert)."""
        import jax.numpy as jnp
        from mvslam_tpu.loopclosure.device_index import DeviceBoWIndex

        mesh = make_mesh(8)
        index = DeviceBoWIndex(32, capacity=64, mesh=mesh)
        row = jnp.ones((32,), jnp.float32)
        hlo = index._insert.lower(
            index._buf, row, jnp.asarray(0, jnp.int32)
        ).compile().as_text()
        for collective in ("all-gather", "all-reduce", "collective-permute", "all-to-all"):
            assert collective not in hlo, f"insert reshards the buffer: {collective}"

    def test_growth_on_mesh_preserves_sharding_and_scores(self):
        from mvslam_tpu.loopclosure.device_index import DeviceBoWIndex

        rng = np.random.default_rng(7)
        mesh = make_mesh(8)
        index = DeviceBoWIndex(16, capacity=8, mesh=mesh)
        hists = rng.uniform(0, 1, size=(20, 16)).astype(np.float32)
        hists /= np.linalg.norm(hists, axis=1, keepdims=True)
        for fid, h in enumerate(hists):
            index.add(fid, h)  # grows past 8 mid-way
        assert index.capacity >= 20 and index.capacity % mesh.size == 0
        assert index._buf.sharding == index._sharding
        q = hists[13]
        np.testing.assert_allclose(index.scores(q), hists @ q, atol=1e-5)
        assert index.topk(q, k=1)[0][0] == 13


class TestShardedSolver:
    def _problem(self, n_nodes=32):
        """Noisy SE(3) odometry chain → GraphProblem."""
        from mvslam_tpu.backend.pose_graph import PoseGraph3D

        rng = np.random.default_rng(3)
        graph = PoseGraph3D()
        for _ in range(n_nodes - 1):
            delta = np.array(
                [1.0 + rng.normal(0, 0.05), rng.normal(0, 0.02), 0.0,
                 rng.normal(0, 0.01), rng.normal(0, 0.01), rng.normal(0, 0.02)]
            )
            graph.add_pose(delta)
        return graph._build_graph().build_problem()

    def test_sharded_solve_matches_single_device(self):
        from mvslam_tpu.backend.solvers import SolverConfig, solve_problem
        from mvslam_tpu.parallel.mesh import solve_problem_sharded

        problem = self._problem(33)  # 32 odometry edges — divisible by 8
        cfg = SolverConfig(max_iterations=10)
        ref = solve_problem(problem, cfg)
        assert problem.num_factors % 8 == 0
        for n_dev in (1, 8):
            mesh = make_mesh(n_dev)
            res = solve_problem_sharded(mesh, problem, cfg)
            # Edge-sharded accumulation reorders float sums → tolerance,
            # not bit equality (documented in solve_problem_sharded).
            np.testing.assert_allclose(res.x, ref.x, atol=1e-4)
            assert abs(res.final_cost - ref.final_cost) < 1e-3 * max(1.0, ref.final_cost)

    def test_sharded_solve_run_to_run_deterministic(self):
        from mvslam_tpu.backend.solvers import SolverConfig
        from mvslam_tpu.parallel.mesh import solve_problem_sharded

        problem = self._problem(17)  # 16 edges — divisible by 8
        mesh = make_mesh(8)
        cfg = SolverConfig(max_iterations=6)
        a = solve_problem_sharded(mesh, problem, cfg)
        b = solve_problem_sharded(mesh, problem, cfg)
        np.testing.assert_array_equal(a.x, b.x)

    def test_uneven_edge_count_takes_sharded_path(self, caplog):
        """A 7-edge graph on an 8-device mesh is padded with zero-weight
        self-edges and still takes the sharded path (VERDICT r2: most real
        graphs have non-mesh-multiple edge counts) — results within
        tolerance of the replicated solve."""
        import logging

        from mvslam_tpu.backend.solvers import SolverConfig, solve_problem
        from mvslam_tpu.parallel.mesh import solve_problem_sharded

        problem = self._problem(8)  # 7 odometry edges
        assert problem.num_factors == 7
        cfg = SolverConfig(max_iterations=10)
        ref = solve_problem(problem, cfg)
        mesh = make_mesh(8)
        with caplog.at_level(logging.INFO, logger="mvslam_tpu.parallel.mesh"):
            res = solve_problem_sharded(mesh, problem, cfg)
        assert any("padded pose-graph factors" in r.message for r in caplog.records)
        np.testing.assert_allclose(res.x, ref.x, atol=1e-4)
        assert abs(res.final_cost - ref.final_cost) < 1e-3 * max(1.0, ref.final_cost)

    def test_loop_graph_chain_plus_one_loop(self):
        """Chain + 1 loop edge (N edges, the VERDICT's canonical case) on
        an 8-device mesh: padded sharded solve matches replicated."""
        from mvslam_tpu.backend.pose_graph import PoseGraph3D
        from mvslam_tpu.backend.solvers import SolverConfig, solve_problem
        from mvslam_tpu.parallel.mesh import solve_problem_sharded

        rng = np.random.default_rng(11)
        graph = PoseGraph3D()
        for _ in range(12):
            delta = np.array(
                [1.0 + rng.normal(0, 0.05), rng.normal(0, 0.02), 0.0,
                 rng.normal(0, 0.01), rng.normal(0, 0.01), rng.normal(0, 0.02)]
            )
            graph.add_pose(delta)
        graph.add_loop(0, 12, np.array([12.0, 0, 0, 0, 0, 0]))
        problem = graph._build_graph().build_problem()
        assert problem.num_factors % 8 != 0
        cfg = SolverConfig(max_iterations=10)
        ref = solve_problem(problem, cfg)
        res = solve_problem_sharded(make_mesh(8), problem, cfg)
        np.testing.assert_allclose(res.x, ref.x, atol=1e-4)
