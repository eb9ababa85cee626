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

    def test_sharded_matches_quality(self):
        mesh = make_mesh(8)
        n1, n2 = self._problem()
        mask = jnp.ones(n1.shape[0], bool)
        cfg = RansacConfig(num_hypotheses=256, threshold=2.0 / 500.0)
        res = sharded_ransac_essential(mesh, jax.random.key(0), n1, n2, mask, cfg)
        assert bool(res.success)
        assert int(res.num_inliers) > 150
        # Single-device result with same key should find similar inliers.
        res_single = ransac_essential(jax.random.key(0), n1, n2, mask, cfg)
        assert abs(int(res.num_inliers) - int(res_single.num_inliers)) < 20

    def test_hypotheses_must_divide(self):
        mesh = make_mesh(8)
        n1, n2 = self._problem()
        with pytest.raises(ValueError, match="divide"):
            sharded_ransac_essential(
                mesh, jax.random.key(0), n1, n2, jnp.ones(n1.shape[0], bool),
                RansacConfig(num_hypotheses=100),
            )
