"""FAST detect: fused Pallas kernel vs the XLA composition.

Round-2 VERDICT item 9: the Pallas kernel must beat XLA or be dropped —
this benchmark proves the winner on the current backend. Methodology
matches BASELINE.md: an in-program ``lax.scan`` whose input depends on the
carry (so XLA cannot hoist loop-invariant work), timed steady-state after
one compile, per-frame cost = elapsed / passes.

On TPU both legs run (the fused kernel is the default product path there,
``ops/fast.py``); elsewhere only the XLA leg runs (the kernel's
``pltpu.roll`` is TPU-only outside interpret mode).
"""

import numpy as np

from benchmarks._harness import emit, measured


def _frame(h: int = 370, w: int = 1226, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 40, size=(h, w)).astype(np.float32)
    for _ in range(900):
        y, x = rng.integers(25, h - 30), rng.integers(25, w - 25)
        s = rng.integers(3, 8)
        img[y : y + s, x : x + s] = rng.uniform(120, 255)
    return img


def _scan_loop(step_fn, image, passes: int):
    """jit(scan) with a carry-perturbed input: out[i] feeds in[i+1]."""
    import jax
    import jax.numpy as jnp

    def body(carry, _):
        score = step_fn(image + carry)
        # Fold a scalar of the output back into the next input.
        return jnp.mean(score) * 1e-6, ()

    def run():
        (final, _) = jax.lax.scan(body, jnp.float32(0.0), None, length=passes)
        return final

    return jax.jit(run)


def main(passes: int = 200):
    from benchmarks._harness import ensure_live_backend

    ensure_live_backend()
    import jax
    import jax.numpy as jnp

    from mvslam_tpu.ops.fast import _mask_border, _nms, fast_score_map

    image = jnp.asarray(_frame())
    threshold, margin = 20.0, 19

    def xla_detect(img):
        return _mask_border(_nms(fast_score_map(img, threshold), 1), margin)

    legs = [("fast_detect_xla_ms_per_frame", xla_detect)]
    if jax.default_backend() == "tpu":
        from mvslam_tpu.ops.pallas_fast import fast_detect_pallas

        def pallas_detect(img):
            out, _raw = fast_detect_pallas(img, threshold, margin=margin)
            return out

        legs.append(("fast_detect_pallas_ms_per_frame", pallas_detect))

    results = {}
    for name, fn in legs:
        loop = _scan_loop(fn, image, passes)
        jax.block_until_ready(loop())  # compile + warm
        report = {}
        with measured(report):
            jax.block_until_ready(loop())
        per_frame_ms = report["elapsed_s"] * 1000.0 / passes
        results[name] = per_frame_ms
        emit(name, per_frame_ms, "ms/frame", passes=passes, **report)
    if len(results) == 2:
        emit(
            "fast_detect_pallas_speedup",
            results["fast_detect_xla_ms_per_frame"]
            / max(results["fast_detect_pallas_ms_per_frame"], 1e-12),
            "x",
        )


if __name__ == "__main__":
    main()
