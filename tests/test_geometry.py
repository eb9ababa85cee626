"""Geometry core tests: Lie maps, triangulation, alignment, epipolar solvers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke  # <5-min dev-loop tier (VERDICT r3 item 7)

from mvslam_tpu.geometry.lie import (
    rotation_angle_deg,
    se2_matrix,
    se2_params,
    se3_exp,
    se3_inverse,
    se3_log,
    se3_matrix,
    se3_relative,
    sim3_inverse,
    sim3_matrix,
    sim3_params,
    so3_exp,
    so3_log,
)
from mvslam_tpu.geometry.projection import (
    make_K,
    normalize_pixels,
    project_points,
    triangulate_pair,
)
from mvslam_tpu.geometry.alignment import apply_similarity, umeyama_alignment
from mvslam_tpu.geometry.epipolar import (
    decompose_essential,
    dlt_homography,
    eight_point_essential,
    sampson_error,
    symmetric_transfer_error,
)


def random_rotation(rng, scale=1.0):
    rvec = rng.normal(size=3) * scale
    return np.asarray(so3_exp(jnp.asarray(rvec, dtype=jnp.float64) if False else jnp.asarray(rvec, dtype=jnp.float32)))


class TestLie:
    def test_so3_roundtrip(self):
        rng = np.random.default_rng(0)
        rvecs = rng.normal(size=(16, 3)).astype(np.float32)
        R = so3_exp(jnp.asarray(rvecs))
        back = so3_log(R)
        assert np.allclose(back, rvecs, atol=1e-4)

    def test_so3_small_angle(self):
        rvec = jnp.asarray([1e-9, 0.0, 0.0], dtype=jnp.float32)
        R = so3_exp(rvec)
        assert np.allclose(R, np.eye(3), atol=1e-6)
        assert np.allclose(so3_log(R), rvec, atol=1e-6)

    def test_so3_log_near_pi_mixed_sign_axes(self):
        """180-degree rotations about mixed-sign axes round-trip: the
        per-component signs must come from the symmetric part aaT (the
        antisymmetric part vanishes at pi — regression: noise-read signs
        once flipped the axis into a perpendicular one)."""
        rng = np.random.default_rng(2)
        axes = [np.array(a, float) for a in
                ([1, -1, 0], [1, 1, -1], [-1, 1, 1], [0.19, -0.2, 0.96])]
        axes += [rng.normal(size=3) for _ in range(30)]
        for a in axes:
            a = a / np.linalg.norm(a)
            for theta in (np.pi, np.pi - 1e-4, np.pi - 5e-3, np.pi - 0.014, np.pi - 0.015):
                R = np.asarray(so3_exp(jnp.asarray(theta * a, jnp.float32)))
                r = np.asarray(so3_log(jnp.asarray(R, jnp.float32)))
                R2 = np.asarray(so3_exp(jnp.asarray(r)))
                assert np.abs(R2 - R).max() < 5e-4, (a, theta, np.abs(R2 - R).max())

    def test_so3_log_differentiable_at_identity_and_pi(self):
        import jax

        def f(rv):
            return jnp.sum(so3_log(so3_exp(rv)) ** 2)

        for rv in ([0.0, 0.0, 0.0], [3.1, 0.2, -0.1], [1e-9, 0.0, 0.0]):
            g = np.asarray(jax.grad(f)(jnp.asarray(rv, jnp.float32)))
            assert np.isfinite(g).all(), (rv, g)
        g = np.asarray(jax.grad(f)(jnp.asarray([0.5, -0.5, 0.5], jnp.float32)))
        np.testing.assert_allclose(g, [1.0, -1.0, 1.0], atol=1e-3)

    def test_so3_orthonormal(self):
        rng = np.random.default_rng(1)
        R = np.asarray(so3_exp(jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)))
        eye = np.einsum("bij,bkj->bik", R, R)
        assert np.allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        assert np.allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_se3_roundtrip(self):
        rng = np.random.default_rng(2)
        xi = rng.normal(size=(8, 6)).astype(np.float32) * 0.5
        T = se3_exp(jnp.asarray(xi))
        assert np.allclose(se3_log(T), xi, atol=1e-4)

    def test_se3_inverse_and_relative(self):
        rng = np.random.default_rng(3)
        xi = jnp.asarray(rng.normal(size=6).astype(np.float32))
        T = se3_exp(xi)
        assert np.allclose(T @ se3_inverse(T), np.eye(4), atol=1e-5)
        rel = se3_relative(T, T)
        assert np.allclose(rel, np.eye(4), atol=1e-5)

    def test_se2_roundtrip(self):
        p = jnp.asarray([1.0, -2.0, 0.7], dtype=jnp.float32)
        assert np.allclose(se2_params(se2_matrix(p)), p, atol=1e-6)

    def test_sim3_roundtrip(self):
        params = jnp.asarray([0.5, -1.0, 2.0, 0.1, 0.2, -0.3, 0.4], dtype=jnp.float32)
        S = sim3_matrix(params)
        assert np.allclose(sim3_params(S), params, atol=1e-4)
        assert np.allclose(S @ sim3_inverse(S), np.eye(4), atol=1e-4)

    def test_rotation_angle(self):
        rvec = jnp.asarray([0.0, 0.0, np.pi / 6], dtype=jnp.float32)
        assert float(rotation_angle_deg(so3_exp(rvec))) == pytest.approx(30.0, abs=1e-3)


def synthetic_two_view(n=64, seed=0, noise=0.0):
    """Generate a camera pair observing random 3D points."""
    rng = np.random.default_rng(seed)
    pts3d = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)], axis=1
    )
    rvec = np.array([0.02, -0.03, 0.01])
    R = np.asarray(so3_exp(jnp.asarray(rvec, dtype=jnp.float64)))
    t = np.array([0.5, 0.05, 0.1])
    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    cam1 = pts3d
    cam2 = pts3d @ R.T + t
    uv1 = (cam1[:, :2] / cam1[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    uv2 = (cam2[:, :2] / cam2[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    if noise:
        uv1 += rng.normal(scale=noise, size=uv1.shape)
        uv2 += rng.normal(scale=noise, size=uv2.shape)
    return pts3d, R, t, K, uv1, uv2


class TestProjectionTriangulation:
    def test_project_points(self):
        pts3d, R, t, K, uv1, _ = synthetic_two_view()
        T = np.eye(4)
        proj = project_points(jnp.asarray(pts3d, dtype=jnp.float32), jnp.asarray(K, dtype=jnp.float32), jnp.asarray(T, dtype=jnp.float32))
        assert np.allclose(proj, uv1, atol=1e-2)

    def test_triangulate_recovers_points(self):
        pts3d, R, t, K, uv1, uv2 = synthetic_two_view()
        X = triangulate_pair(
            jnp.asarray(K, dtype=jnp.float32),
            jnp.asarray(R, dtype=jnp.float32),
            jnp.asarray(t, dtype=jnp.float32),
            jnp.asarray(uv1, dtype=jnp.float32),
            jnp.asarray(uv2, dtype=jnp.float32),
        )
        assert np.allclose(X, pts3d, atol=5e-2)


class TestAlignment:
    def test_umeyama_exact(self):
        rng = np.random.default_rng(5)
        src = rng.normal(size=(30, 3))
        R_true = np.asarray(so3_exp(jnp.asarray([0.3, -0.2, 0.5], dtype=jnp.float64)))
        t_true = np.array([1.0, -2.0, 0.5])
        s_true = 1.7
        tgt = s_true * src @ R_true.T + t_true
        R, t, s = umeyama_alignment(jnp.asarray(src), jnp.asarray(tgt))
        aligned = apply_similarity(jnp.asarray(src), R, t, s)
        assert np.allclose(aligned, tgt, atol=1e-4)
        assert float(s) == pytest.approx(s_true, abs=1e-4)

    def test_umeyama_no_scale(self):
        rng = np.random.default_rng(6)
        src = rng.normal(size=(20, 3))
        _, _, s = umeyama_alignment(jnp.asarray(src), jnp.asarray(src * 2.0), with_scale=False)
        assert float(s) == 1.0


class TestEpipolar:
    def test_eight_point_essential_sampson(self):
        pts3d, R, t, K, uv1, uv2 = synthetic_two_view(n=64)
        n1 = normalize_pixels(jnp.asarray(uv1, dtype=jnp.float32), jnp.asarray(K, dtype=jnp.float32))
        n2 = normalize_pixels(jnp.asarray(uv2, dtype=jnp.float32), jnp.asarray(K, dtype=jnp.float32))
        E = eight_point_essential(n1, n2)
        err = sampson_error(E, n1, n2)
        assert float(jnp.max(err)) < 1e-6

    def test_decompose_essential_recovers_pose(self):
        pts3d, R, t, K, uv1, uv2 = synthetic_two_view(n=64)
        n1 = normalize_pixels(jnp.asarray(uv1, dtype=jnp.float32), jnp.asarray(K, dtype=jnp.float32))
        n2 = normalize_pixels(jnp.asarray(uv2, dtype=jnp.float32), jnp.asarray(K, dtype=jnp.float32))
        E = eight_point_essential(n1, n2)
        R_est, t_est, cheirality = decompose_essential(E, n1, n2)
        assert np.allclose(R_est, R, atol=1e-3)
        t_unit = t / np.linalg.norm(t)
        assert np.allclose(t_est, t_unit, atol=1e-3)
        assert int(cheirality) == 64

    def test_homography_roundtrip(self):
        rng = np.random.default_rng(7)
        H_true = np.array([[1.1, 0.02, 5.0], [-0.03, 0.95, -3.0], [1e-4, -2e-4, 1.0]])
        pts1 = rng.uniform(-1, 1, size=(32, 2))
        h = np.concatenate([pts1, np.ones((32, 1))], axis=1) @ H_true.T
        pts2 = h[:, :2] / h[:, 2:]
        H = dlt_homography(jnp.asarray(pts1, dtype=jnp.float32), jnp.asarray(pts2, dtype=jnp.float32))
        err = symmetric_transfer_error(H, jnp.asarray(pts1, dtype=jnp.float32), jnp.asarray(pts2, dtype=jnp.float32))
        assert float(jnp.max(err)) < 1e-6

    def test_batched_homography_vmap(self):
        rng = np.random.default_rng(8)
        pts1 = jnp.asarray(rng.uniform(-1, 1, size=(4, 8, 2)), dtype=jnp.float32)
        pts2 = pts1 * 1.5 + 0.1
        H = jax.vmap(dlt_homography)(pts1, pts2)
        assert H.shape == (4, 3, 3)
        err = jax.vmap(symmetric_transfer_error)(H, pts1, pts2)
        assert float(jnp.max(err)) < 1e-4


class TestLieNumpyPort:
    """geometry.lie_np re-evaluates the SAME code objects as geometry.lie
    with jnp rebound to numpy (host pose-graph assembly must never dispatch
    eager device ops — ~40 ms/op over a tunneled chip). Contract: numpy and
    jax agree to f64 roundoff, including the near-pi so3_log branch."""

    def test_so3_exp_log_matches_jax(self):
        from mvslam_tpu.geometry import lie, lie_np

        with jax.enable_x64(True):
            rng = np.random.default_rng(0)
            for i in range(60):
                rvec = rng.normal(0, 2, 3)
                if i % 4 == 0:  # near-pi: the conditioning-critical branch
                    axis = rng.normal(0, 1, 3)
                    axis /= np.linalg.norm(axis)
                    rvec = axis * (np.pi - 10.0 ** -rng.uniform(1, 7))
                R_np = lie_np.so3_exp(np.asarray(rvec))
                R_jx = np.asarray(lie.so3_exp(jnp.asarray(rvec, jnp.float64)))
                np.testing.assert_allclose(R_np, R_jx, atol=1e-12)
                l_np = lie_np.so3_log(R_np)
                l_jx = np.asarray(lie.so3_log(jnp.asarray(R_np, jnp.float64)))
                np.testing.assert_allclose(l_np, l_jx, atol=1e-12)

    def test_group_ops_match_jax(self):
        from mvslam_tpu.geometry import lie, lie_np

        with jax.enable_x64(True):
            rng = np.random.default_rng(1)
            x = rng.normal(0, 1, (5, 6))
            T = lie_np.se3_params_to_matrix(x)
            np.testing.assert_allclose(lie_np.se3_matrix_to_params(T), x, atol=1e-9)
            np.testing.assert_allclose(
                lie_np.se3_inverse(T[0]),
                np.asarray(lie.se3_inverse(jnp.asarray(T[0], jnp.float64))),
                atol=1e-12,
            )
            p2 = rng.normal(0, 1, (4, 3))
            np.testing.assert_allclose(
                lie_np.se2_matrix(p2),
                np.asarray(lie.se2_matrix(jnp.asarray(p2, jnp.float64))),
                atol=1e-12,
            )
            p7 = rng.normal(0, 0.5, (4, 7))
            S = lie_np.sim3_matrix(p7)
            np.testing.assert_allclose(
                S, np.asarray(lie.sim3_matrix(jnp.asarray(p7, jnp.float64))), atol=1e-12
            )
            np.testing.assert_allclose(
                lie_np.sim3_params(S),
                np.asarray(lie.sim3_params(jnp.asarray(S, jnp.float64))),
                atol=1e-12,
            )

    def test_pose_graph_host_paths_are_device_free(self):
        """Graph assembly must not create jax arrays (the eager-dispatch
        regression this port exists to prevent)."""
        from mvslam_tpu.backend.pose_graph import PoseGraph3D

        poses = [np.eye(4)]
        for k in range(6):
            T = np.eye(4)
            T[:3, 3] = [0.1 * (k + 1), 0.0, 0.02 * k]
            poses.append(poses[-1] @ T)
        g = PoseGraph3D.from_pose_matrices(poses)
        g.add_loop_matrix(0, len(poses) - 1, np.eye(4), weight=5.0)
        assert all(isinstance(p, np.ndarray) for p in g._params)
        out = g.poses()
        assert isinstance(out, np.ndarray) and out.shape == (len(poses), 4, 4)
        np.testing.assert_allclose(out[1][:3, 3], poses[1][:3, 3], atol=1e-9)
