"""Native C++ Hamming matcher vs XLA:CPU matcher (host small-solve path).

Measures the N x M cross-check matching stage both ways on the host and
verifies bitwise parity on the same inputs — the committed evidence for
the ~10x claim behind ``ops/hamming.py::match_descriptors_host``
(see ``native/src/mvslam_native.cc``, ``mvn_hamming_match``).

Runs on the host CPU regardless of the default backend (that is the
placement the native path exists for). Usage:
    python -m benchmarks.benchmark_native_match
"""

from __future__ import annotations

import time

import numpy as np

from benchmarks._harness import emit


def main(shapes=((512, 512), (2048, 512), (2048, 2048)), reps: int = 20) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mvslam_tpu.native import native_available
    from mvslam_tpu.ops.hamming import (
        MatchConfig,
        match_descriptors,
        match_descriptors_host,
    )

    if not native_available():
        emit("native_match_available", 0.0, "bool")
        return
    emit("native_match_available", 1.0, "bool")
    rng = np.random.default_rng(0)
    cfg = MatchConfig(cross_check=True)
    for na, nb in shapes:
        d1 = rng.integers(0, 2**32, size=(na, 8), dtype=np.uint32)
        d2 = rng.integers(0, 2**32, size=(nb, 8), dtype=np.uint32)
        d2[: min(na, nb) // 3] = d1[: min(na, nb) // 3]  # shared rows → ties
        v1 = rng.random(na) > 0.1
        v2 = rng.random(nb) > 0.1
        j1, jv1, j2, jv2 = map(jnp.asarray, (d1, v1, d2, v2))

        ref = match_descriptors(j1, jv1, j2, jv2, cfg)
        jax.block_until_ready(ref.indices)
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(match_descriptors(j1, jv1, j2, jv2, cfg).indices)
        xla_ms = (time.perf_counter() - t0) / reps * 1e3

        got = match_descriptors_host(d1, v1, d2, v2, cfg)
        t0 = time.perf_counter()
        for _ in range(reps):
            match_descriptors_host(d1, v1, d2, v2, cfg)
        native_ms = (time.perf_counter() - t0) / reps * 1e3

        parity = bool(
            np.array_equal(np.asarray(got.indices), np.asarray(ref.indices))
            and np.array_equal(np.asarray(got.distances), np.asarray(ref.distances))
            and np.array_equal(np.asarray(got.valid), np.asarray(ref.valid))
        )
        emit(
            f"hamming_match_{na}x{nb}_native_ms",
            round(native_ms, 3),
            "ms",
            xla_cpu_ms=round(xla_ms, 3),
            speedup=round(xla_ms / max(native_ms, 1e-9), 2),
            bitwise_parity=parity,
        )


if __name__ == "__main__":
    main()
