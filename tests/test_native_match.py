"""Native C++ Hamming matcher parity (native/src/mvslam_native.cc).

The host small-solve path replaces the N x M matching stage of the pair
gate / loop geometry with ``mvn_hamming_match``. Its contract is BITWISE
parity with the XLA matcher (integer distances, first-min tie-breaks,
sentinel semantics for masked rows/columns) — asserted here over
randomized shapes, masks, engineered ties, and the downstream packed
buffers of both call sites.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.native import hamming_match, native_available
from mvslam_tpu.ops.hamming import (
    MatchConfig,
    match_descriptors,
    match_descriptors_host,
)

pytestmark = [
    pytest.mark.smoke,
    pytest.mark.skipif(not native_available(), reason="no C++ toolchain"),
]


class TestHammingMatchParity:
    @pytest.mark.parametrize("na,nb", [(17, 33), (256, 256), (512, 2048), (2048, 512)])
    def test_bitwise_parity_random(self, na, nb):
        rng = np.random.default_rng(na * 1000 + nb)
        d1 = rng.integers(0, 2**32, size=(na, 8), dtype=np.uint32)
        d2 = rng.integers(0, 2**32, size=(nb, 8), dtype=np.uint32)
        # Engineered ties: duplicated rows on both sides and shared rows
        # across sides, so argmin tie-breaks are actually exercised.
        k = min(na, nb)
        d2[: k // 3] = d1[: k // 3]
        d1[1] = d1[0]
        d2[2] = d2[1]
        v1 = rng.random(na) > 0.15
        v2 = rng.random(nb) > 0.15
        ref = match_descriptors(
            jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2), jnp.asarray(v2),
            MatchConfig(cross_check=True),
        )
        got = match_descriptors_host(d1, v1, d2, v2, MatchConfig(cross_check=True))
        np.testing.assert_array_equal(np.asarray(got.indices), np.asarray(ref.indices))
        np.testing.assert_array_equal(np.asarray(got.distances), np.asarray(ref.distances))
        np.testing.assert_array_equal(
            np.asarray(got.second_distances), np.asarray(ref.second_distances)
        )
        np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))

    def test_all_invalid_rows_and_columns(self):
        rng = np.random.default_rng(0)
        d1 = rng.integers(0, 2**32, size=(8, 8), dtype=np.uint32)
        d2 = rng.integers(0, 2**32, size=(8, 8), dtype=np.uint32)
        for v1, v2 in [
            (np.zeros(8, bool), np.ones(8, bool)),
            (np.ones(8, bool), np.zeros(8, bool)),
            (np.zeros(8, bool), np.zeros(8, bool)),
        ]:
            ref = match_descriptors(
                jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2), jnp.asarray(v2),
                MatchConfig(cross_check=True),
            )
            got = match_descriptors_host(d1, v1, d2, v2, MatchConfig(cross_check=True))
            np.testing.assert_array_equal(np.asarray(got.indices), np.asarray(ref.indices))
            np.testing.assert_array_equal(np.asarray(got.distances), np.asarray(ref.distances))
            np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))

    def test_raw_outputs_include_col_best(self):
        rng = np.random.default_rng(3)
        d1 = rng.integers(0, 2**32, size=(64, 8), dtype=np.uint32)
        d2 = rng.integers(0, 2**32, size=(48, 8), dtype=np.uint32)
        v1, v2 = np.ones(64, bool), np.ones(48, bool)
        _, _, _, col_best = hamming_match(d1, v1, d2, v2)
        # Column argmin must match the XLA column argmin of the masked
        # distance matrix.
        from mvslam_tpu.ops.hamming import hamming_distance_matrix

        d = np.asarray(hamming_distance_matrix(jnp.asarray(d1), jnp.asarray(d2)))
        np.testing.assert_array_equal(col_best, d.argmin(axis=0))


class TestHostCallSiteParity:
    """The host-matcher call sites must produce the same packed buffers
    as the fused device programs (same backend here, so exact)."""

    def _pair_inputs(self):
        rng = np.random.default_rng(1)
        d1 = rng.integers(0, 2**32, size=(512, 8), dtype=np.uint32)
        d2 = d1 ^ (
            rng.integers(0, 2**32, size=(512, 8), dtype=np.uint32)
            & rng.integers(0, 2, size=(512, 8), dtype=np.uint32)
        )
        v = np.ones(512, bool)
        kp1 = rng.uniform(50, 450, size=(512, 2)).astype(np.float32)
        kp2 = kp1 + rng.normal(0, 1, size=(512, 2)).astype(np.float32) + np.float32([5, 0])
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
        return d1, d2, v, kp1, kp2, K

    def test_gated_pair_host_matches_fused(self):
        from mvslam_tpu.backend.bundle_adjustment import (
            _gated_pair_host,
            _gated_pair_packed,
        )

        d1, d2, v, kp1, kp2, K = self._pair_inputs()
        args = (
            jax.random.PRNGKey(7), jnp.asarray(3, jnp.int32), jnp.asarray(4, jnp.int32),
            jnp.asarray(d1), jnp.asarray(v), jnp.asarray(kp1),
            jnp.asarray(d2), jnp.asarray(v), jnp.asarray(kp2),
            jnp.asarray(K), 2.0 / 500.0,
        )
        np.testing.assert_array_equal(
            np.asarray(_gated_pair_packed(*args)), np.asarray(_gated_pair_host(*args))
        )

    def test_loop_geometry_host_matches_fused(self, monkeypatch):
        import mvslam_tpu.backend.bundle_adjustment as ba
        from mvslam_tpu.slam import offline

        d1, d2, v, kp1, kp2, K = self._pair_inputs()

        class Registry:
            def key_for(self, component):
                return jax.random.key(5)

        class Obj:
            pass

        system = Obj()
        system.K = K
        system.registry = Registry()
        kfa, kfb = Obj(), Obj()
        kfa.keypoints, kfa.descriptors, kfa.valid = kp1, d1, v
        kfb.keypoints, kfb.descriptors, kfb.valid = kp2, d2, v

        host = offline._loop_geometry(system, kfa, [kfb, kfb], [1, 2])
        monkeypatch.setattr(ba, "_use_host_matcher", lambda: False)
        fused = offline._loop_geometry(system, kfa, [kfb, kfb], [1, 2])
        np.testing.assert_array_equal(host, fused)
