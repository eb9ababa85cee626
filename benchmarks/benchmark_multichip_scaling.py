"""Multi-chip scaling of the tracking front-end over a device mesh.

Runs the data-parallel pair tracker (``parallel.batched_track_pairs``),
the hypothesis-sharded RANSAC (``parallel.sharded_ransac_essential``),
the meshed superwindow throughput path
(``parallel.track_superwindow_meshed``) and the edge-sharded pose-graph
Gauss-Newton (``parallel.solve_problem_sharded``) on 1/2/4/8-device meshes
and reports throughput per mesh size. On a machine without real chips, set
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` and
``JAX_PLATFORMS=cpu`` (the test conftest does the same) — the point of the
CPU run is validating that the sharded programs compile and execute; on a
single-core host the virtual devices SERIALIZE, so wall-clock does not
improve with mesh size here (per-device work does: e.g. the sharded RANSAC
scores K/n hypotheses per device). Real scaling needs real chips over ICI.

Parity: the reference scales feature extraction with thread/process pools
(``feature_control_plane.py:283-319``); the TPU design scales over ICI via
``jax.sharding`` instead (SURVEY §2.5 mapping table).
"""

from __future__ import annotations

import time

import numpy as np

from benchmarks._harness import emit


def _frames(batch: int, h: int = 192, w: int = 320, shift: int = 5):
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 40, size=(h, w + shift)).astype(np.float32)
    for _ in range(300):
        y = rng.integers(20, h - 24)
        x = rng.integers(20, w - 24)
        s = rng.integers(3, 8)
        base[y : y + s, x : x + s] = rng.uniform(120, 255)
    prev = np.broadcast_to(base[:, :w], (batch, h, w)).copy()
    nxt = np.broadcast_to(base[:, shift : shift + w], (batch, h, w)).copy()
    return prev, nxt


def main(batch: int = 8) -> None:
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        # The axon TPU plugin ignores the env var; the config flag is
        # authoritative (read at backend init — must run before first use).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
    from mvslam_tpu.frontend.pose_estimator import RobustPoseEstimatorConfig
    from mvslam_tpu.ops.ransac import RansacConfig
    from mvslam_tpu.parallel.mesh import (
        batched_track_pairs,
        make_mesh,
        sharded_ransac_essential,
    )

    fc = FeaturePipelineConfig(num_features=512, max_matches=256)
    pc = RobustPoseEstimatorConfig(num_hypotheses=256, min_inliers=12)
    K = jnp.asarray([[200.0, 0, 160.0], [0, 200.0, 96.0], [0, 0, 1]], jnp.float32)
    prev, nxt = _frames(batch)

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= n_avail and batch % n == 0]
    for n in sizes:
        mesh = make_mesh(n)
        # Compile + warm once, then time a steady-state run.
        feats, track = batched_track_pairs(mesh, jnp.asarray(prev), jnp.asarray(nxt), K, fc, pc)
        jax.block_until_ready(track.scalars_packed)
        start = time.perf_counter()
        feats, track = batched_track_pairs(mesh, jnp.asarray(prev), jnp.asarray(nxt), K, fc, pc)
        jax.block_until_ready(track.scalars_packed)
        elapsed = time.perf_counter() - start
        emit(
            f"batched_track_pairs_mesh{n}",
            batch / max(elapsed, 1e-12),
            "pairs/s",
            mesh_devices=n,
            batch=batch,
        )

    # Hypothesis-sharded RANSAC on correspondences from a known two-view pair.
    rng = np.random.default_rng(1)
    npts = 256
    pts3d = rng.uniform([-2, -2, 4], [2, 2, 10], size=(npts, 3))
    t = np.asarray([0.5, 0.0, 0.0])
    p1 = pts3d[:, :2] / pts3d[:, 2:3]
    shifted = pts3d - t
    p2 = shifted[:, :2] / shifted[:, 2:3]
    p2[: npts // 4] += rng.normal(0, 0.3, size=(npts // 4, 2))  # outliers
    mask = np.ones(npts, bool)

    for n in sizes:
        mesh = make_mesh(n)
        cfg = RansacConfig(num_hypotheses=256, threshold=2e-3, min_inliers=12)
        key = jax.random.key(2)
        res = sharded_ransac_essential(mesh, key, jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32), jnp.asarray(mask), cfg)
        jax.block_until_ready(res.model)
        start = time.perf_counter()
        res = sharded_ransac_essential(mesh, key, jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32), jnp.asarray(mask), cfg)
        jax.block_until_ready(res.model)
        elapsed = time.perf_counter() - start
        emit(
            f"sharded_ransac_mesh{n}",
            cfg.num_hypotheses / max(elapsed, 1e-12),
            "hypotheses/s",
            mesh_devices=n,
            num_inliers=int(res.num_inliers),
        )

    # Meshed superwindow: the run_sequence throughput path, frames-DP.
    from mvslam_tpu.parallel.mesh import track_superwindow_meshed
    from mvslam_tpu.slam.tracking import bootstrap_frame

    prev1, nxt1 = _frames(1)
    prev_feats = bootstrap_frame(jnp.asarray(prev1[0]), fc)
    for n in sizes:
        mesh = make_mesh(n)
        window = 16
        frames_seq = jnp.asarray(
            np.stack([np.roll(prev1[0], 2 * (i + 1), axis=1) for i in range(window)])
        )
        args = (jax.random.key(5), prev_feats, frames_seq, K, fc, pc)
        last, tr = track_superwindow_meshed(mesh, *args, window=window)
        jax.block_until_ready(tr.scalars_packed)
        start = time.perf_counter()
        last, tr = track_superwindow_meshed(mesh, *args, window=window)
        jax.block_until_ready(tr.scalars_packed)
        elapsed = time.perf_counter() - start
        emit(
            f"meshed_superwindow_mesh{n}",
            window / max(elapsed, 1e-12),
            "frames/s",
            mesh_devices=n,
            window=window,
        )

    # Edge-sharded pose-graph Gauss-Newton.
    from mvslam_tpu.backend.pose_graph import PoseGraph3D
    from mvslam_tpu.backend.solvers import SolverConfig
    from mvslam_tpu.parallel.mesh import solve_problem_sharded

    graph = PoseGraph3D()
    rng = np.random.default_rng(7)
    for i in range(253):
        graph.add_pose(
            np.array([1.0, rng.normal(0, 0.05), 0.0, 0.0, 0.0, rng.normal(0, 0.02)])
        )
    # Noisy loop edges make the residual non-trivial (odometry chains are
    # self-consistent at x0 by construction).
    for i, j in ((0, 60), (50, 140), (120, 250)):
        graph.add_loop(i, j, np.array([float(j - i), 0.5, 0.0, 0.0, 0.0, 0.0]))
    problem = graph._build_graph().build_problem()  # 256 factors
    for n in sizes:
        mesh = make_mesh(n)
        cfg_s = SolverConfig(max_iterations=10)
        solve_problem_sharded(mesh, problem, cfg_s)  # warm
        start = time.perf_counter()
        res = solve_problem_sharded(mesh, problem, cfg_s)
        elapsed = time.perf_counter() - start
        emit(
            f"sharded_pose_graph_gn_mesh{n}",
            problem.num_factors * cfg_s.max_iterations / max(elapsed, 1e-12),
            "factor_linearizations/s",
            mesh_devices=n,
            final_cost=round(float(res.final_cost), 6),
        )

    # Observation-sharded window bundle adjustment (Schur-GN).
    from mvslam_tpu.backend.bundle_adjustment import (
        BundleAdjustmentConfig,
        Observation,
    )
    from mvslam_tpu.parallel.mesh import run_bundle_adjustment_sharded

    rng = np.random.default_rng(11)
    W_ba, P_ba = 6, 160
    pts3d = np.stack(
        [rng.uniform(-3, 3, P_ba), rng.uniform(-2, 2, P_ba), rng.uniform(6, 14, P_ba)], 1
    )
    K_ba = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]])
    poses_ba = np.stack([np.eye(4) for _ in range(W_ba)])
    observations = []
    for wi in range(W_ba):
        poses_ba[wi][:3, 3] = [0.5 * wi, 0.0, 0.0]
        cam = pts3d - poses_ba[wi][:3, 3]
        uv = (cam[:, :2] / cam[:, 2:]) * 400.0 + [160, 120]
        uv += rng.normal(0, 0.5, size=uv.shape)
        for pi in range(P_ba):
            observations.append(Observation(wi, pi, uv[pi]))
    cfg_ba = BundleAdjustmentConfig(max_iterations=8)
    for n in sizes:
        mesh = make_mesh(n)
        run_bundle_adjustment_sharded(mesh, poses_ba, pts3d, observations, K_ba, cfg_ba)
        start = time.perf_counter()
        ba = run_bundle_adjustment_sharded(mesh, poses_ba, pts3d, observations, K_ba, cfg_ba)
        elapsed = time.perf_counter() - start
        emit(
            f"sharded_window_ba_mesh{n}",
            len(observations) * cfg_ba.max_iterations / max(elapsed, 1e-12),
            "obs_linearizations/s",
            mesh_devices=n,
            final_cost=round(float(ba.diagnostics.final_cost), 4),
        )


if __name__ == "__main__":
    main()
