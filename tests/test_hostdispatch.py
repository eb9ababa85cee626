"""Small-solve host placement (core/hostdispatch.py).

The CI environment is CPU-only (conftest pins jax_platforms=cpu), so the
dispatch must be a placement no-op here (`auto` returns None) while the
scope machinery itself stays exercisable via MVSLAM_SMALL_SOLVE=host.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.core.hostdispatch import (
    small_solve_device,
    small_solve_scope,
    with_cpu_platform,
)

pytestmark = pytest.mark.smoke


class TestWithCpuPlatform:
    def test_appends_cpu(self):
        assert with_cpu_platform("axon") == "axon,cpu"
        assert with_cpu_platform("tpu") == "tpu,cpu"

    def test_keeps_default_first(self):
        assert with_cpu_platform("axon,tpu").split(",")[0] == "axon"

    def test_idempotent(self):
        assert with_cpu_platform("axon,cpu") == "axon,cpu"
        assert with_cpu_platform("cpu") == "cpu"

    def test_empty_means_autodetect(self):
        # Unset/empty: jax auto-initialises every platform (cpu included),
        # so the value must pass through unchanged.
        assert with_cpu_platform("") == ""

    def test_whitespace_tolerant(self):
        assert with_cpu_platform(" axon , tpu ") == "axon,tpu,cpu"


class TestSmallSolveDevice:
    def test_auto_is_none_on_cpu_default(self, monkeypatch):
        # CI default backend IS the cpu — placement must be a no-op so
        # committed accuracy baselines keep meaning what they measured.
        monkeypatch.delenv("MVSLAM_SMALL_SOLVE", raising=False)
        if jax.default_backend() == "cpu":
            assert small_solve_device() is None

    def test_device_mode_forces_none(self, monkeypatch):
        monkeypatch.setenv("MVSLAM_SMALL_SOLVE", "device")
        assert small_solve_device() is None

    def test_host_mode_returns_cpu_device(self, monkeypatch):
        monkeypatch.setenv("MVSLAM_SMALL_SOLVE", "host")
        dev = small_solve_device()
        assert dev is not None and dev.platform == "cpu"

    def test_scope_nullcontext_in_device_mode(self, monkeypatch):
        monkeypatch.setenv("MVSLAM_SMALL_SOLVE", "device")
        with small_solve_scope():
            out = jax.jit(lambda a: a * 2)(jnp.ones(4))
        assert float(out.sum()) == 8.0

    def test_scope_places_on_cpu_in_host_mode(self, monkeypatch):
        monkeypatch.setenv("MVSLAM_SMALL_SOLVE", "host")
        with small_solve_scope():
            out = jax.jit(lambda a: a + 1)(jnp.zeros(3))
        assert all(d.platform == "cpu" for d in out.devices())


class TestScopedSolversMatch:
    """The scoped path must run the identical programs: on a CPU-only CI
    the results are bitwise equal between host mode and device mode."""

    def test_pose_graph_gn_identical(self, monkeypatch):
        from mvslam_tpu.backend.pose_graph import PoseGraph3D
        from mvslam_tpu.backend.solvers import SolverConfig

        def solve(mode):
            monkeypatch.setenv("MVSLAM_SMALL_SOLVE", mode)
            rng = np.random.default_rng(7)
            poses = [np.eye(4)]
            for _ in range(5):
                T = np.eye(4)
                T[:3, 3] = rng.normal(size=3) * 0.1 + [0.5, 0, 0]
                poses.append(poses[-1] @ T)
            graph = PoseGraph3D.from_pose_matrices(poses)
            with small_solve_scope():
                graph.optimize(SolverConfig(max_iterations=8, damping=1e-4))
            return graph.poses()

        a = solve("host")
        b = solve("device")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bow_process_keyframe_identical(self, monkeypatch):
        from mvslam_tpu.loopclosure.bow import BoWConfig, BoWDatabase

        rng = np.random.default_rng(3)
        frames = [
            (i, rng.integers(0, 2**32, size=(64, 8), dtype=np.uint32), np.ones(64, bool))
            for i in range(8)
        ]
        # A revisit: frame 7 shares frame 0's descriptors.
        frames[7] = (7, frames[0][1].copy(), frames[0][2].copy())

        def run(mode):
            monkeypatch.setenv("MVSLAM_SMALL_SOLVE", mode)
            with small_solve_scope():
                bow = BoWDatabase(
                    BoWConfig(
                        vocab_size=16,
                        similarity_threshold=0.5,
                        min_frame_gap=3,
                        min_train_descriptors_factor=5,
                        device_index_capacity=16,
                    ),
                    key=jax.random.key(11),
                )
                return [bow.process_keyframe(*f) for f in frames]

        assert run("host") == run("device")
