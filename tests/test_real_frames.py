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
