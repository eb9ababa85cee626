"""Per-stage roofline: achieved HBM bandwidth / MXU throughput vs peak.

VERDICT r2 item 2: BASELINE.md's per-op milliseconds never said what
fraction of the chip each stage reaches, so "fast" vs "merely faster than
cv2" was unanswerable. This script times every stage of the fused
tracking step in isolation (carry-dependent in-program loop, steady
state — the same methodology as bench.py/benchmark_fast_detect) and pairs
each measurement with the stage's analytic bytes-moved and FLOPs to
report achieved GB/s, GFLOP/s, and % of peak. Results are written into
``docs/PERF.md``'s table by hand after a TPU run.

Peaks (TPU v5e, one chip): 197 TFLOP/s bf16 MXU, ~819 GB/s HBM. On other
backends the script still runs (relative numbers only).

Stage inventory and the analytic models are documented in docs/PERF.md.
"""

from __future__ import annotations

import numpy as np

from benchmarks._harness import emit, ensure_live_backend, measured

V5E_HBM_GBPS = 819.0
V5E_MXU_BF16_TFLOPS = 197.0

H, W = 370, 1226
N_KP = 2048
N_HYP_E, N_HYP_H = 512, 256


def _frame(seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 40, size=(H, W)).astype(np.float32)
    for _ in range(900):
        y, x = rng.integers(25, H - 30), rng.integers(25, W - 25)
        s = rng.integers(3, 8)
        img[y : y + s, x : x + s] = rng.uniform(120, 255)
    return img


def _time_loop(step_fn, feed, passes: int) -> float:
    """ms per pass, carry-perturbed scan (XLA cannot hoist the body)."""
    import jax
    import jax.numpy as jnp

    def body(carry, _):
        out = step_fn(feed(carry))
        leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
        probe = sum(jnp.sum(l).astype(jnp.float32) for l in leaves if l.dtype != jnp.uint32)
        probe = probe + sum(
            jnp.sum(l.astype(jnp.float32)) for l in leaves if l.dtype == jnp.uint32
        )
        return probe * 1e-9, ()

    def run():
        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=passes)
        return final

    fn = jax.jit(run)
    jax.block_until_ready(fn())  # compile + warm
    report = {}
    with measured(report):
        jax.block_until_ready(fn())
    return report["elapsed_s"] * 1000.0 / passes


def _emit_stage(name: str, ms: float, gbytes: float, gflops: float, note: str = ""):
    import jax

    on_tpu = jax.default_backend() == "tpu"
    achieved_gbps = gbytes / (ms / 1e3) if ms > 0 else 0.0
    achieved_gflops = gflops / (ms / 1e3) if ms > 0 else 0.0
    extras = {
        "analytic_gbytes": round(gbytes, 6),
        "analytic_gflops": round(gflops, 6),
        "achieved_gbps": round(achieved_gbps, 2),
        "achieved_gflops_per_s": round(achieved_gflops, 2),
    }
    if on_tpu:
        extras["pct_hbm_peak"] = round(100.0 * achieved_gbps / V5E_HBM_GBPS, 2)
        extras["pct_mxu_bf16_peak"] = round(
            100.0 * achieved_gflops / (V5E_MXU_BF16_TFLOPS * 1e3), 2
        )
    if note:
        extras["note"] = note
    emit(f"roofline_{name}_ms", ms, "ms", **extras)


def main(passes: int = 100):
    ensure_live_backend()
    import jax
    import jax.numpy as jnp

    from mvslam_tpu.frontend.pose_estimator import (
        RobustPoseEstimatorConfig,
        estimate_pose_device,
    )
    from mvslam_tpu.ops.brief import BriefConfig, describe_keypoints, extract_patches
    from mvslam_tpu.ops.fast import FastConfig, _grid_topk, _mask_border, _nms, fast_score_map
    from mvslam_tpu.ops.hamming import MatchConfig, hamming_distance_matrix, match_descriptors
    from mvslam_tpu.ops.image import gaussian_blur

    image = jnp.asarray(_frame())
    px = H * W
    f32 = 4e-9  # GB per element

    # --- FAST score (+NMS+border) -------------------------------------
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from mvslam_tpu.ops.pallas_fast import fast_detect_pallas

        def fast_stage(img):
            out, _ = fast_detect_pallas(img, 20.0, margin=19)
            return out

    else:

        def fast_stage(img):
            return _mask_border(_nms(fast_score_map(img, 20.0), 1), 19)

    ms = _time_loop(fast_stage, lambda c: image + c, passes)
    # Bytes: read f32 frame once (VMEM-resident reuse), write f32 score.
    # FLOPs: 16 circle taps × (diff+abs+cmp) + log-depth arc test ≈ 170/px.
    _emit_stage("fast_score_nms", ms, 2 * px * f32, 170 * px * 1e-9)

    # --- grid top-K ----------------------------------------------------
    score = fast_stage(image)

    def topk_stage(s):
        return _grid_topk(s, N_KP, cells=8)

    ms = _time_loop(topk_stage, lambda c: score + c, passes)
    _emit_stage("grid_topk", ms, px * f32, 0.0, note="selection, bandwidth-only model")

    # --- Gaussian blur ---------------------------------------------------
    ms = _time_loop(lambda img: gaussian_blur(img, 2.0, radius=2), lambda c: image + c, passes)
    # Separable 5-tap ×2 passes: read+write f32 twice, 20 MAC/px.
    _emit_stage("gaussian_blur", ms, 4 * px * f32, 40 * px * 1e-9)

    # --- patch extraction (DMA kernel) -----------------------------------
    from mvslam_tpu.ops.fast import detect_keypoints

    xy, scores, valid = detect_keypoints(image, num_keypoints=N_KP, config=FastConfig())
    blurred = gaussian_blur(image, 2.0, radius=2)

    def patch_stage(img):
        return extract_patches(img, xy, out_dtype=jnp.bfloat16)

    ms = _time_loop(patch_stage, lambda c: blurred + c, passes)
    # Bytes: random-access reads ≈ N×31×31 f32 (no reuse) + bf16 writes.
    patch_bytes = N_KP * 961 * (4 + 2) * 1e-9
    _emit_stage("patch_extract", ms, patch_bytes, 0.0, note="gather/DMA, bandwidth-only")

    # --- BRIEF describe (moment + comparison-bank matmul + pack) --------
    def brief_stage(img):
        return describe_keypoints(img, xy, valid, BriefConfig())

    ms = _time_loop(brief_stage, lambda c: blurred + c, passes)
    # Dominant term: (N,961)x(961, 32*256) bf16 matmul.
    brief_flops = 2.0 * N_KP * 961 * 32 * 256 * 1e-9
    brief_bytes = (N_KP * 961 * 2 + N_KP * 32 * 256 * 2) * 1e-9
    _emit_stage("brief_describe", ms, brief_bytes, brief_flops, note="incl. patch extract")

    # --- Hamming match ----------------------------------------------------
    desc, angles = describe_keypoints(blurred, xy, valid, BriefConfig())

    def match_stage(d):
        return match_descriptors(d, valid, desc, valid, MatchConfig(cross_check=True))

    # Carry-dependent uint32 feed: (c > 1e30) is 0 at runtime but XLA
    # cannot prove it at compile time, so the body cannot be hoisted.
    ms = _time_loop(
        lambda d: match_stage(d), lambda c: desc ^ (c > 1e30).astype(jnp.uint32), passes
    )
    match_flops = 2.0 * N_KP * N_KP * 256 * 1e-9
    match_bytes = (2 * N_KP * 256 * 2 + N_KP * N_KP * 4) * 1e-9
    _emit_stage("hamming_match", ms, match_bytes, match_flops)

    # --- dual-model RANSAC pose ------------------------------------------
    rng = np.random.default_rng(3)
    n = 2048
    depth = rng.uniform(4, 12, n)
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), depth], 1)
    Rm = np.eye(3)
    t = np.array([0.3, 0.02, 0.1])
    p1 = pts[:, :2] / pts[:, 2:3]
    cam2 = (pts - t) @ Rm
    p2 = cam2[:, :2] / cam2[:, 2:3]
    fx = 350.0
    K = jnp.asarray([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], jnp.float32)
    pix1 = jnp.asarray(p1 * fx + np.array([W / 2, H / 2]), jnp.float32)
    pix2 = jnp.asarray(p2 * fx + np.array([W / 2, H / 2]), jnp.float32)
    mask = jnp.ones(n, bool)
    pc = RobustPoseEstimatorConfig(num_hypotheses=N_HYP_E)

    def ransac_stage(p):
        return estimate_pose_device(jax.random.key(0), p, pix2, mask, K, pc)

    # min(c, 0) is 0 at runtime (probe sums are ≥ 0) but not provably so
    # at compile time — keeps the feed carry-dependent without perturbing
    # the correspondences.
    ms = _time_loop(ransac_stage, lambda c: pix1 + jnp.minimum(c, 0.0), passes)
    # E: K×(gram 8·81·2 + GJ9 ~2900 + 10 matvec·162) + K×N×~30 scoring;
    # H at K/2 ≈ half again; refits ~N·81·6. Total ≈ 0.08 GFLOP.
    ransac_flops = 0.08
    ransac_bytes = (N_HYP_E + N_HYP_H) * n * 4 * 2 * 1e-9  # err matrices ×2 models
    _emit_stage(
        "ransac_dual_model", ms, ransac_bytes, ransac_flops,
        note="far from both rooflines ⇒ latency/occupancy-bound",
    )

    # --- dual-model RANSAC at the tracking-program workload ---------------
    # The product path caps matches at 512 (FeaturePipelineConfig.max_matches)
    # — the 2048-match row above is the roofline stress workload; this row is
    # what a real tracked frame pays (VERDICT r3 item 2).
    n_track = 512
    sel = np.sort(rng.choice(n, n_track, replace=False))
    pix1_t = pix1[sel]
    pix2_t = pix2[sel]
    mask_t = jnp.ones(n_track, bool)

    def ransac_stage_t(p):
        return estimate_pose_device(jax.random.key(0), p, pix2_t, mask_t, K, pc)

    ms = _time_loop(ransac_stage_t, lambda c: pix1_t + jnp.minimum(c, 0.0), passes)
    _emit_stage(
        "ransac_dual_model_n512", ms,
        (N_HYP_E + N_HYP_H) * n_track * 4 * 2 * 1e-9, 0.03,
        note="tracking-program workload (512 matches)",
    )

    # --- whole fused tracking step ----------------------------------------
    # detect+describe+match+RANSAC as the product runs it (slam/tracking
    # track_frame): the sum-of-stages sanity check and the source of the
    # "device compute per frame" headline in BASELINE.md/PERF.md.
    from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
    from mvslam_tpu.slam.tracking import bootstrap_frame, track_frame

    fcfg = FeaturePipelineConfig()
    prev = bootstrap_frame(image, fcfg)

    def step_stage(img):
        feats, track = track_frame(jax.random.key(7), prev, img, K, fcfg, pc)
        return track.scalars_packed, feats.xy

    ms = _time_loop(step_stage, lambda c: image + c, passes)
    _emit_stage(
        "fused_step", ms, 0.0, 0.0,
        note="whole tracking program (detect+describe+match+pose), fps=%.0f" % (1e3 / ms),
    )

    # --- windowed throughput step ------------------------------------
    # track_window is the run_sequence/bench.py throughput path: all B
    # frames detect+describe vmapped and all B consecutive pairs
    # match+RANSAC vmapped, so the latency-bound chains (RANSAC solve,
    # IRLS refits — the single-frame step's dominant cost) amortise
    # across the window. This row records what a frame actually costs in
    # throughput mode; the fused_step row above is the latency mode.
    from mvslam_tpu.slam.tracking import track_window

    window_b = 16
    frames_win = jnp.stack([jnp.asarray(_frame(seed=i + 1)) for i in range(window_b)])

    def window_stage(stack):
        _, track = track_window(
            jax.random.key(9), prev, stack, K, fcfg, pc,
            start_index=jnp.asarray(1, jnp.int32),
        )
        return track.scalars_packed

    w_passes = max(passes // 8, 4)
    ms_w = _time_loop(window_stage, lambda c: frames_win + c, w_passes)
    _emit_stage(
        "windowed_step_per_frame", ms_w / window_b, 0.0, 0.0,
        note="track_window B=%d, per-frame ms (whole-window ms=%.2f), fps=%.0f"
        % (window_b, ms_w, 1e3 / (ms_w / window_b)),
    )


if __name__ == "__main__":
    main()
