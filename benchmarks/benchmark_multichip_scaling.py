"""Multi-chip scaling of the tracking front-end over a device mesh.

Runs the data-parallel pair tracker (``parallel.batched_track_pairs``) and
the hypothesis-sharded RANSAC (``parallel.sharded_ransac_essential``) on
1/2/4/8-device meshes and reports throughput per mesh size. On a machine
without real chips, set ``XLA_FLAGS=--xla_force_host_platform_device_count=8``
and ``JAX_PLATFORMS=cpu`` (the test conftest does the same) — the point of
the CPU run is validating that the sharded programs compile and scale, not
absolute speed.

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
    import jax
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


if __name__ == "__main__":
    main()
