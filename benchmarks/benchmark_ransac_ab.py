"""A/B the dual-model RANSAC pose stage's latency levers (VERDICT r3 item 3).

The fused pose program is latency-bound (docs/PERF.md: ~0.08 GFLOP over
multiple ms), so wall time tracks the *sequential op chain*, not FLOPs.
This script measures, at the roofline workload (N=2048 matches, K=512/256
hypotheses) and the tracking workload (N=512):

- ``pose_full``      — the full fused ``estimate_pose_device`` program
- ``dual_ransac``    — ``ransac_dual_model`` alone (sampling→solve→score→refits)
- ``dual_ransac_r0`` — the same with ``refit_rounds=0`` (hypothesis stage only;
                       the difference isolates the IRLS refit chain)
- ``decompose``      — both model decompositions alone
- ``*_pinned``       — the same with ``mesh_invariant=True`` (order-pinned
                       tree reductions), quantifying what cross-mesh
                       bit-stability costs on one chip. Measured r4: pinned
                       3.71 ms vs dot 1.51 ms at the 2048-match workload —
                       which is why the pinned forms are now confined to
                       the meshed wrappers (VERDICT r3 item 3 suspect i).

Methodology: carry-dependent in-program lax.scan (XLA cannot hoist the
body), steady state, same as benchmark_roofline.py. Each metric emits as
its own JSON line the moment it is measured.
"""

from __future__ import annotations

import numpy as np

from benchmarks._harness import emit, ensure_live_backend, measured

N_HYP = 512


def _correspondences(n: int, seed: int = 3):
    rng = np.random.default_rng(seed)
    depth = rng.uniform(4, 12, n)
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), depth], 1)
    t = np.array([0.3, 0.02, 0.1])
    p1 = pts[:, :2] / pts[:, 2:3]
    cam2 = pts - t
    p2 = cam2[:, :2] / cam2[:, 2:3]
    fx, W, H = 350.0, 1226, 370
    pix1 = (p1 * fx + np.array([W / 2, H / 2])).astype(np.float32)
    pix2 = (p2 * fx + np.array([W / 2, H / 2])).astype(np.float32)
    K = np.asarray([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], np.float32)
    return pix1, pix2, K


def _time_loop(step_fn, feed, passes: int) -> float:
    import jax
    import jax.numpy as jnp

    def body(carry, _):
        out = step_fn(feed(carry))
        leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
        probe = sum(
            jnp.sum(l).astype(jnp.float32) for l in leaves if l.dtype != jnp.uint32
        )
        return probe * 1e-9, ()

    def run():
        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=passes)
        return final

    fn = jax.jit(run)
    jax.block_until_ready(fn())
    report = {}
    with measured(report):
        jax.block_until_ready(fn())
    return report["elapsed_s"] * 1000.0 / passes


def main(passes: int = 100):
    ensure_live_backend()
    import jax
    import jax.numpy as jnp

    from mvslam_tpu.frontend.pose_estimator import (
        RobustPoseEstimatorConfig,
        estimate_pose_device,
    )
    from mvslam_tpu.geometry.epipolar import decompose_essential, decompose_homography
    from mvslam_tpu.geometry.projection import normalize_pixels
    from mvslam_tpu.ops.ransac import RansacConfig, ransac_dual_model

    for n in (2048, 512):
        pix1_np, pix2_np, K_np = _correspondences(n)
        pix1, pix2 = jnp.asarray(pix1_np), jnp.asarray(pix2_np)
        K = jnp.asarray(K_np)
        mask = jnp.ones(n, bool)
        pc = RobustPoseEstimatorConfig(num_hypotheses=N_HYP)
        feed = lambda c: pix1 + jnp.minimum(c, 0.0)
        suffix = "" if n == 2048 else "_n512"

        def pose_stage(p):
            return estimate_pose_device(jax.random.key(0), p, pix2, mask, K, pc)

        ms = _time_loop(pose_stage, feed, passes)
        emit(f"ransac_ab_pose_full{suffix}_ms", ms, "ms")

        n1 = normalize_pixels(pix1, K)
        n2 = normalize_pixels(pix2, K)
        fx = float(K_np[0, 0])
        nfeed = lambda c: n1 + jnp.minimum(c, 0.0)

        for rounds, label in ((2, "dual_ransac"), (0, "dual_ransac_r0")):
            cfg_e = RansacConfig(num_hypotheses=N_HYP, threshold=1.5 / fx, refit_rounds=rounds)
            cfg_h = RansacConfig(num_hypotheses=N_HYP // 2, threshold=3.0 / fx, refit_rounds=rounds)
            jitted = jax.jit(ransac_dual_model, static_argnames=("config_e", "config_h"))

            def ransac_stage(p, _cfg_e=cfg_e, _cfg_h=cfg_h, _j=jitted):
                return _j(jax.random.key(0), jax.random.key(1), p, n2, mask, _cfg_e, _cfg_h)

            ms = _time_loop(ransac_stage, nfeed, passes)
            emit(f"ransac_ab_{label}{suffix}_ms", ms, "ms")

        cfg_e = RansacConfig(num_hypotheses=N_HYP, threshold=1.5 / fx, refit_rounds=2)
        cfg_h = RansacConfig(num_hypotheses=N_HYP // 2, threshold=3.0 / fx, refit_rounds=2)
        dual = jax.jit(ransac_dual_model, static_argnames=("config_e", "config_h"))(
            jax.random.key(0), jax.random.key(1), n1, n2, mask, cfg_e, cfg_h
        )
        E = dual.essential.model
        Hm = dual.homography.model
        w_e = dual.essential.inliers.astype(jnp.float32)

        def decomp_stage(e):
            R_e, t_e, c_e = decompose_essential(e, n1, n2, weights=w_e)
            R_h, t_h, c_h = decompose_homography(Hm, n1, n2)
            return R_e, t_e, R_h, t_h, c_e, c_h

        ms = _time_loop(decomp_stage, lambda c: E + jnp.minimum(c, 0.0), passes)
        emit(f"ransac_ab_decompose{suffix}_ms", ms, "ms")

    # --- pinned (mesh-invariant) A/B: what cross-mesh bit-stability costs --
    for n in (2048, 512):
        pix1_np, pix2_np, K_np = _correspondences(n)
        K = jnp.asarray(K_np)
        n1 = normalize_pixels(jnp.asarray(pix1_np), K)
        n2 = normalize_pixels(jnp.asarray(pix2_np), K)
        mask = jnp.ones(n, bool)
        fx = float(K_np[0, 0])
        suffix = "" if n == 2048 else "_n512"
        cfg_e = RansacConfig(
            num_hypotheses=N_HYP, threshold=1.5 / fx, refit_rounds=2, mesh_invariant=True
        )
        cfg_h = RansacConfig(
            num_hypotheses=N_HYP // 2, threshold=3.0 / fx, refit_rounds=2, mesh_invariant=True
        )
        jitted = jax.jit(ransac_dual_model, static_argnames=("config_e", "config_h"))

        def pinned_stage(p, _n1=n1, _n2=n2, _mask=mask, _e=cfg_e, _h=cfg_h, _j=jitted):
            return _j(jax.random.key(0), jax.random.key(1), p, _n2, _mask, _e, _h)

        ms = _time_loop(pinned_stage, lambda c, _n1=n1: _n1 + jnp.minimum(c, 0.0), passes)
        emit(f"ransac_ab_dual_ransac_pinned{suffix}_ms", ms, "ms")


if __name__ == "__main__":
    main()
