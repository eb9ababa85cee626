"""Smoke-tier end-to-end: the smallest full-system run that still proves
the pipeline (detect → describe → match → dual-model RANSAC pose → pose
chain → artifacts) works.

Part of ``-m smoke`` — the <5-minute dev loop (VERDICT r3 item 7). The
full-size E2E coverage lives in test_slam_api / test_slam_runner /
test_accuracy (``slow``); this file intentionally uses tiny frames and
feature counts so its compiles and runs stay in seconds.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from mvslam_tpu.backend.keyframes import KeyframeConfig
from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
from mvslam_tpu.frontend.pose_estimator import RobustPoseEstimatorConfig
from mvslam_tpu.slam.api import SLAMSystem, SLAMSystemConfig


def tiny_frames(num_frames=4, h=72, w=104, shift=4, seed=0):
    """Layered-parallax translating texture (same recipe as the runner
    fixture: uniform shift is rotation-degenerate, two depth layers make
    translation observable)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 30, size=(h, w + shift * num_frames)).astype(np.float32)
    for _ in range(60):
        y = rng.integers(20, h - 26)
        x = rng.integers(20, base.shape[1] - 26)
        s = rng.integers(3, 7)
        base[y : y + s, x : x + s] = rng.uniform(140, 255)
    half = h // 2
    frames = []
    for i in range(num_frames):
        top = base[:half, (i * shift) // 2 : (i * shift) // 2 + w]
        bottom = base[half:, i * shift : i * shift + w]
        frames.append(np.concatenate([top, bottom], axis=0))
    return frames


class TestSmokeEndToEnd:
    def test_tracks_and_persists(self, tmp_path):
        frames = tiny_frames()
        h, w = frames[0].shape
        config = SLAMSystemConfig(
            run_id="smoke_e2e",
            output_root=tmp_path,
            seed=7,
            fx=90.0,
            fy=90.0,
            cx=w / 2,
            cy=h / 2,
            feature=FeaturePipelineConfig(num_features=96, max_matches=48),
            pose=RobustPoseEstimatorConfig(
                num_hypotheses=64, min_inliers=8, min_matches=8
            ),
            enable_local_ba=False,  # keep the smoke program set minimal
        )
        system = SLAMSystem(config)
        diags = system.run_sequence(frames, window=2)
        assert len(diags) == len(frames)
        assert any(d.pose_success for d in diags[1:])
        poses = system.trajectory.as_arrays()["poses"]
        assert poses.shape == (len(frames), 4, 4)
        assert np.linalg.norm(poses[-1][:3, 3]) > 0.0  # the chain moved
        run = system.finalize_run()
        assert run.trajectory_path.exists()
        payload = np.load(run.trajectory_path, allow_pickle=True)
        assert payload["poses"].shape == (len(frames), 4, 4)
