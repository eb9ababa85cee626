"""First-contact tests on REAL image data (committed fixtures).

The committed frames (tests/data/real/) are sliding 320x240 crops of the
public-domain Grace Hopper portrait: real photographic texture with exact
known image motion (crop window moves +6 px in x, +2 px in y per frame, so
features move by (-6, -2)). Covers what synthetic splats cannot: natural
intensity statistics for FAST thresholds, BRIEF robustness on real
texture, and the native PNG decode path on real files.

Reference parity: the reference validates on downloaded videos
(``tests/test_real_video.py``); this is the egress-free equivalent.
"""

from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from mvslam_tpu.ops.brief import BriefConfig  # noqa: E402
from mvslam_tpu.ops.detect import detect_and_describe  # noqa: E402
from mvslam_tpu.ops.fast import FastConfig, detect_keypoints  # noqa: E402
from mvslam_tpu.ops.hamming import (  # noqa: E402
    MatchConfig,
    gather_matched_points,
    match_descriptors,
    select_matches,
)

DATA = Path(__file__).parent / "data" / "real"
FRAME_PATHS = sorted(DATA.glob("hopper_*.png"))


def load_gray(path: Path) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"))


class TestNativeDecodeReal:
    def test_native_png_decode_parity(self):
        """The C++ libpng decoder matches PIL bit-for-bit on real photos."""
        from mvslam_tpu import native

        if not native.native_available():
            pytest.skip("native library unavailable")
        for p in [*FRAME_PATHS, DATA / "mri_slice.png"]:
            out = native.decode_gray(p)
            assert out is not None, p
            np.testing.assert_array_equal(out, load_gray(p))


class TestFastOnRealTexture:
    def test_default_threshold_finds_corners(self):
        """The default FAST threshold yields a healthy corner count on a
        real photograph (synthetic splats can't validate the threshold)."""
        img = jnp.asarray(load_gray(FRAME_PATHS[0]), jnp.float32)
        xy, scores, valid = detect_keypoints(img, num_keypoints=512, config=FastConfig())
        n = int(valid.sum())
        assert n > 150, f"only {n} corners on real texture at default threshold"

    def test_low_texture_real_image_degrades_gracefully(self):
        mri = jnp.asarray(load_gray(DATA / "mri_slice.png"), jnp.float32)
        xy, scores, valid = detect_keypoints(mri, num_keypoints=256, config=FastConfig())
        # Must not crash; count is data-dependent but bounded by the budget.
        assert int(valid.sum()) <= 256


class TestBriefOnRealTexture:
    def test_matching_recovers_known_shift(self):
        """Descriptor matches across consecutive real frames recover the
        exact (-6, -2) px crop shift (median displacement within 0.75 px —
        subpixel refinement on real texture is noisier than on renders)."""
        feats = []
        for p in FRAME_PATHS[:2]:
            img = jnp.asarray(load_gray(p), jnp.float32)
            xy, scores, desc, angles, valid = detect_and_describe(
                img, 512, FastConfig(), BriefConfig()
            )
            feats.append((xy, desc, valid))
        (xy1, d1, v1), (xy2, d2, v2) = feats
        res = match_descriptors(d1, v1, d2, v2, MatchConfig(cross_check=True))
        sel = select_matches(res, max_matches=256)
        assert int(sel.valid.sum()) > 60, "too few cross-checked matches on real texture"
        p1, p2 = gather_matched_points(xy1, xy2, sel)
        disp = np.asarray(p2 - p1)[np.asarray(sel.valid)]
        med = np.median(disp, axis=0)
        assert abs(med[0] - (-6.0)) < 0.75, med
        assert abs(med[1] - (-2.0)) < 0.75, med
        # The inlier fraction must dominate: at least 70% of matches within
        # 1.5 px of the true shift.
        err = np.hypot(disp[:, 0] + 6.0, disp[:, 1] + 2.0)
        assert (err < 1.5).mean() > 0.7


class TestWarpedRealGeometry:
    """Homography-warped views of the same photograph with exact known
    K/H/R ground truth (``tests/data/real/generate_warped.py``): real
    texture under real rotation/perspective/exposure change — geometry the
    sliding crops cannot produce. Parity behavior:
    ``visual_slam_offline_entry_point.py:557-648`` (dual-model selection,
    loop verification)."""

    @staticmethod
    def _meta():
        import json

        return json.loads((DATA / "homographies.json").read_text())

    @staticmethod
    def _matched(img_a, img_b, max_matches=256):
        feats = []
        for img in (img_a, img_b):
            xy, scores, desc, angles, valid = detect_and_describe(
                jnp.asarray(img, jnp.float32), 512, FastConfig(), BriefConfig()
            )
            feats.append((xy, desc, valid))
        (xy1, d1, v1), (xy2, d2, v2) = feats
        res = match_descriptors(d1, v1, d2, v2, MatchConfig(cross_check=True))
        sel = select_matches(res, max_matches=max_matches)
        p1, p2 = gather_matched_points(xy1, xy2, sel)
        return p1, p2, sel

    @staticmethod
    def _rot_err_deg(R_est, R_gt):
        cos = (np.trace(np.asarray(R_est) @ np.asarray(R_gt).T) - 1.0) / 2.0
        return float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))

    def test_rotation_pair_h_branch_recovers_r(self):
        """A camera-rotation pair is exactly a homography with zero
        parallax. Contract on real rotation: (a) the H branch (RANSAC +
        Faugeras decomposition) recovers the ground-truth R within 1°,
        (b) the dual-model support share saturates near 0.5 (the planar
        signature — both models explain every match), (c) whichever model
        selection falls back to under the zero-parallax gates, its
        rotation is still correct. (Pure rotation legitimately trips the
        low-parallax stability gate afterwards — translation is
        unobservable — exactly as the reference's gates do:
        ``robust_pose_estimator.py:226-251``.)"""
        from mvslam_tpu.frontend.pose_estimator import (
            RobustPoseEstimatorConfig,
            estimate_pose_device,
        )
        from mvslam_tpu.geometry.epipolar import decompose_homography
        from mvslam_tpu.geometry.projection import normalize_pixels
        from mvslam_tpu.ops.ransac import RansacConfig, ransac_homography

        meta = self._meta()
        K = np.asarray(meta["K"], np.float32)
        R_gt = np.asarray(meta["rot"]["R"])
        img_a = load_gray(DATA / "hopper_rot_00.png")
        img_b = load_gray(DATA / "hopper_rot_01.png")
        p1, p2, sel = self._matched(img_a, img_b)
        assert int(sel.valid.sum()) > 60

        # (a) The H branch on its own.
        n1 = normalize_pixels(p1, jnp.asarray(K))
        n2 = normalize_pixels(p2, jnp.asarray(K))
        res_h = ransac_homography(
            jax.random.key(5), n1, n2, sel.valid,
            RansacConfig(num_hypotheses=256, min_inliers=30),
            threshold=3.0 / float(K[0, 0]),
        )
        assert bool(res_h.success) and int(res_h.num_inliers) > 60
        R_h, t_h, _ = decompose_homography(res_h.model, n1, n2)
        assert self._rot_err_deg(R_h, R_gt) < 1.0

        # (b) + (c) the fused dual-model program.
        dev = estimate_pose_device(
            jax.random.key(5), p1, p2, sel.valid, jnp.asarray(K),
            RobustPoseEstimatorConfig(num_hypotheses=256),
        )
        assert 0.4 < float(dev.homography_share) < 0.6, float(dev.homography_share)
        assert float(dev.median_parallax_deg) < 0.5  # rotation-only: no parallax
        assert self._rot_err_deg(dev.rotation, R_gt) < 1.0

    def test_dual_model_picks_h_on_planar_translation_with_exposure(self):
        """Plane + translation + exposure change: H must win and keep a
        healthy inlier set despite the brightness shift (BRIEF compares
        intensities within the patch, so gain/gamma must not break it)."""
        from mvslam_tpu.frontend.pose_estimator import (
            RobustPoseEstimatorConfig,
            estimate_pose_device,
        )

        meta = self._meta()
        K = np.asarray(meta["K"], np.float32)
        img_a = load_gray(DATA / "hopper_plane_00.png")
        img_b = load_gray(DATA / "hopper_plane_01.png")
        p1, p2, sel = self._matched(img_a, img_b)
        assert int(sel.valid.sum()) > 60, "matching collapsed under exposure change"
        dev = estimate_pose_device(
            jax.random.key(6), p1, p2, sel.valid, jnp.asarray(K),
            RobustPoseEstimatorConfig(num_hypotheses=256),
        )
        assert not bool(dev.use_essential), {
            "h_score": float(dev.homography_score),
            "e_score": float(dev.essential_score),
        }
        assert int(dev.num_inliers) >= 40
        assert float(dev.inlier_ratio) > 0.5

    def test_lk_tracks_rotational_flow(self):
        """Pyramidal LK under real rotation: tracked corners must land
        where the ground-truth homography sends them (median < 1 px)."""
        from mvslam_tpu.ops.lk import LKConfig, lk_track

        meta = self._meta()
        H = np.asarray(meta["rot"]["H"])
        img_a = jnp.asarray(load_gray(DATA / "hopper_rot_00.png"), jnp.float32)
        img_b = jnp.asarray(load_gray(DATA / "hopper_rot_01.png"), jnp.float32)
        xy, scores, valid = detect_keypoints(img_a, num_keypoints=256, config=FastConfig())
        nxt, residuals, ok = lk_track(img_a, img_b, xy, valid, LKConfig(num_levels=3))
        ok_np = np.asarray(ok & valid)
        assert ok_np.sum() > 80, f"LK lost too many tracks under rotation ({ok_np.sum()})"
        pts = np.asarray(xy)[ok_np]
        pred = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ H.T
        pred = pred[:, :2] / pred[:, 2:3]
        err = np.linalg.norm(np.asarray(nxt)[ok_np] - pred, axis=1)
        assert np.median(err) < 1.0, np.median(err)

    def test_loop_verifier_accepts_true_revisit(self):
        """A geometric loop verification (match → essential RANSAC, the
        offline entry point's ``_match_pair_essential`` recipe) must accept
        a true revisit of the same place under a new viewpoint + exposure."""
        from mvslam_tpu.geometry.projection import normalize_pixels
        from mvslam_tpu.ops.ransac import RansacConfig, ransac_essential

        meta = self._meta()
        K = np.asarray(meta["K"], np.float32)
        img_a = load_gray(DATA / "hopper_plane_00.png")
        img_b = load_gray(DATA / "hopper_plane_01.png")
        p1, p2, sel = self._matched(img_a, img_b)
        n1 = normalize_pixels(p1, jnp.asarray(K))
        n2 = normalize_pixels(p2, jnp.asarray(K))
        ransac = ransac_essential(
            jax.random.key(11), n1, n2, sel.valid,
            RansacConfig(num_hypotheses=256, min_inliers=30),
            threshold=2.0 / float(K[0, 0]),
        )
        assert bool(ransac.success), {
            "inliers": int(ransac.num_inliers),
            "matches": int(sel.valid.sum()),
        }
        assert int(ransac.num_inliers) >= 30


class TestFullPipelineOnRealFrames:
    def test_slam_system_tracks_real_sequence(self, tmp_path):
        """End-to-end SLAMSystem run over the 8 real frames: the planar
        sliding-crop sequence must run to completion, produce the full
        artifact set, and track (not fail) on most frames."""
        from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
        from mvslam_tpu.frontend.pose_estimator import RobustPoseEstimatorConfig
        from mvslam_tpu.slam.api import SLAMSystem, SLAMSystemConfig

        frames = [load_gray(p).astype(np.float32) for p in FRAME_PATHS]
        system = SLAMSystem(
            SLAMSystemConfig(
                run_id="real_frames",
                output_root=str(tmp_path),
                seed=7,
                fx=300.0,
                fy=300.0,
                cx=160.0,
                cy=120.0,
                feature=FeaturePipelineConfig(num_features=512, max_matches=256),
                pose=RobustPoseEstimatorConfig(num_hypotheses=128),
            )
        )
        system.run_sequence(frames)
        # Frame 0 has no previous frame, so at most len-1 can have a pose.
        tracked = sum(1 for d in system.diagnostics if d.pose_success)
        assert tracked >= len(frames) - 3, (
            f"only {tracked}/{len(frames)} real frames tracked"
        )
        result = system.finalize_run()
        run_dir = Path(result.run_dir)
        assert any((run_dir / "trajectories").glob("*.npz"))
