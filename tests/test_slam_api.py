"""SLAMSystem end-to-end tests on synthetic data (reference test parity:
tests/test_slam_api.py, tests/test_slam_runner.py)."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full SLAM runs over rendered scenes

from mvslam_tpu.backend.keyframes import KeyframeConfig, KeyframeManager
from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
from mvslam_tpu.frontend.pose_estimator import RobustPoseEstimatorConfig
from mvslam_tpu.slam.api import SLAMSystem, SLAMSystemConfig


def make_sequence(num_frames=6, h=128, w=192, shift=5, seed=0):
    """Texture translated `shift` px/frame — a synthetic dolly move."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 30, size=(h, w + shift * num_frames)).astype(np.float32)
    for _ in range(120):
        y = rng.integers(25, h - 30)
        x = rng.integers(25, base.shape[1] - 30)
        s = rng.integers(3, 8)
        base[y : y + s, x : x + s] = rng.uniform(140, 255)
    return [base[:, i * shift : i * shift + w].copy() for i in range(num_frames)]


def small_config(tmp_path, **kw):
    defaults = dict(
        run_id="test",
        output_root=tmp_path,
        seed=7,
        fx=120.0,
        fy=120.0,
        cx=96.0,
        cy=64.0,
        feature=FeaturePipelineConfig(num_features=256, max_matches=128),
        pose=RobustPoseEstimatorConfig(num_hypotheses=128),
        keyframe=KeyframeConfig(min_translation=0.05),
    )
    defaults.update(kw)
    return SLAMSystemConfig(**defaults)


class TestSLAMSystem:
    def test_run_sequence_produces_trajectory(self, tmp_path):
        system = SLAMSystem(small_config(tmp_path))
        frames = make_sequence()
        diags = system.run_sequence(frames)
        assert len(diags) == 6
        assert diags[0].model_type == "bootstrap"
        successes = [d for d in diags[1:] if d.pose_success]
        assert len(successes) >= 4
        result = system.finalize_run()
        assert result.num_frames == 6
        assert result.trajectory_path.exists()
        assert result.metrics_path.exists()
        assert result.diagnostics_path.exists()
        assert result.telemetry_path.exists()
        loaded = system.store.load_trajectory("estimated")
        assert loaded["poses"].shape == (6, 4, 4)
        assert loaded["determinism"]["seed"] == 7
        # Camera should move (unit-scale steps chained).
        assert np.linalg.norm(loaded["poses"][-1][:3, 3]) > 0.5

    def test_blank_frames_graceful_degradation(self, tmp_path):
        """Parity with reference tests/test_slam_api.py:22-52."""
        system = SLAMSystem(small_config(tmp_path))
        frames = [np.zeros((128, 192), dtype=np.float32)] * 3
        diags = system.run_sequence(frames)
        assert not diags[1].pose_success
        assert diags[1].failure_reason == "insufficient_matches"
        result = system.finalize_run()
        assert result.num_failures == 2
        assert result.trajectory_path.exists()

    def test_inject_tracking_loss(self, tmp_path):
        system = SLAMSystem(small_config(tmp_path, enable_relocalization=False))
        system.inject_tracking_loss(2)
        diags = system.run_sequence(make_sequence())
        assert diags[2].injected_loss
        assert not diags[2].pose_success
        assert diags[2].failure_reason == "injected_tracking_loss"
        assert diags[3].pose_success  # recovers on next frame

    def test_keyframes_accumulate(self, tmp_path):
        system = SLAMSystem(small_config(tmp_path))
        system.run_sequence(make_sequence())
        assert len(system.keyframes) >= 2
        kf = system.keyframes.keyframes[0]
        assert kf.keypoints.shape[1] == 2
        assert kf.descriptors.shape[1] == 8

    def test_deterministic_across_runs(self, tmp_path):
        frames = make_sequence(seed=4)
        sysa = SLAMSystem(small_config(tmp_path / "a"))
        sysa.run_sequence(frames)
        ra = sysa.finalize_run()
        sysb = SLAMSystem(small_config(tmp_path / "b"))
        sysb.run_sequence(frames)
        rb = sysb.finalize_run()
        pa = sysa.store.load_trajectory("estimated")["poses"]
        pb = sysb.store.load_trajectory("estimated")["poses"]
        assert np.array_equal(pa, pb)

    def test_telemetry_stages_recorded(self, tmp_path):
        system = SLAMSystem(small_config(tmp_path))
        system.run_sequence(make_sequence(num_frames=3))
        names = {e.name for e in system.telemetry.events()}
        assert "frame_process" in names
        assert names & {"track_step", "track_window"}

    def test_diagnostics_json_schema(self, tmp_path):
        system = SLAMSystem(small_config(tmp_path))
        system.run_sequence(make_sequence(num_frames=3))
        result = system.finalize_run()
        records = json.loads(result.diagnostics_path.read_text())
        assert len(records) == 3
        for key in ("frame_id", "num_matches", "pose_success", "is_keyframe", "correlation_id"):
            assert key in records[0]


class TestKeyframeManager:
    def test_policy_thresholds(self):
        mgr = KeyframeManager(KeyframeConfig(min_translation=0.1, min_rotation_deg=5.0, max_match_ratio=0.25))
        pose = np.eye(4)
        kp = np.zeros((4, 2), np.float32)
        desc = np.zeros((4, 8), np.uint32)
        valid = np.ones(4, bool)
        assert mgr.maybe_add(0, 0.0, pose, 1.0, kp, desc, valid) is not None  # first is always KF
        # Small motion, good matches → no keyframe
        near = pose.copy()
        near[0, 3] = 0.01
        assert mgr.maybe_add(1, 0.1, near, 0.9, kp, desc, valid) is None
        # Large translation → keyframe
        far = pose.copy()
        far[0, 3] = 0.5
        assert mgr.maybe_add(2, 0.2, far, 0.9, kp, desc, valid) is not None
        # Bad match ratio → keyframe
        assert mgr.maybe_add(3, 0.3, far, 0.1, kp, desc, valid) is not None

    def test_window(self):
        mgr = KeyframeManager(KeyframeConfig(window_size=3))
        kp = np.zeros((1, 2), np.float32)
        desc = np.zeros((1, 8), np.uint32)
        valid = np.ones(1, bool)
        for i in range(5):
            pose = np.eye(4)
            pose[0, 3] = i
            mgr.maybe_add(i, float(i), pose, 0.9, kp, desc, valid)
        assert len(mgr.window()) == 3
        assert mgr.window()[-1].frame_id == mgr.last.frame_id


class TestWindowedTracking:
    def test_windowed_matches_sequential(self, tmp_path):
        """Window size must not change the trajectory (RNG folds global ids)."""
        frames = make_sequence(num_frames=7, seed=11)
        sys_seq = SLAMSystem(small_config(tmp_path / "seq"))
        sys_seq.run_sequence(frames, window=1)
        sys_win = SLAMSystem(small_config(tmp_path / "win"))
        sys_win.run_sequence(frames, window=3)  # 6 tracked frames: 3+3
        pa = np.stack(sys_seq.trajectory.poses)
        pb = np.stack(sys_win.trajectory.poses)
        assert np.allclose(pa, pb, atol=1e-5)

    def test_pack_pull_scalars_roundtrip(self):
        """Every _SCALAR_FIELDS entry AND the trailing counts must unpack
        to the value that was packed (regression: stale hard-coded count
        indices once aliased num_features to the match count, disabling
        the keyframe match-ratio trigger)."""
        import jax.numpy as jnp

        from mvslam_tpu.frontend.pose_estimator import DevicePoseResult
        from mvslam_tpu.slam.tracking import TrackResult, _pack_values, pull_scalars

        pose = DevicePoseResult(
            rotation=jnp.arange(9, dtype=jnp.float32).reshape(3, 3),
            translation=jnp.asarray([9.0, 10.0, 11.0]),
            use_essential=jnp.asarray(True),
            num_inliers=jnp.asarray(101, jnp.int32),
            inlier_ratio=jnp.asarray(0.25, jnp.float32),
            median_parallax_deg=jnp.asarray(1.5, jnp.float32),
            cheirality_ratio=jnp.asarray(0.75, jnp.float32),
            score=jnp.asarray(321.0, jnp.float32),
            essential_score=jnp.asarray(300.0, jnp.float32),
            homography_score=jnp.asarray(21.0, jnp.float32),
            inliers=jnp.ones(8, bool),
            num_valid_matches=jnp.asarray(77, jnp.int32),
            median_displacement_px=jnp.asarray(3.5, jnp.float32),
            homography_share=jnp.asarray(0.0654, jnp.float32),
        )
        packed = _pack_values(pose, jnp.asarray(55, jnp.int32), jnp.asarray(444, jnp.int32))
        track = TrackResult(
            pose=pose, matched_p1=None, matched_p2=None, match_mask=None,
            match_distances=None, num_matches=None, num_features=None,
            scalars_packed=packed, features_packed=None,
        )
        out = pull_scalars(track)
        np.testing.assert_array_equal(out["rotation"], np.arange(9.0).reshape(3, 3))
        np.testing.assert_array_equal(out["translation"], [9.0, 10.0, 11.0])
        assert bool(out["use_essential"])
        assert out["num_inliers"] == 101
        assert out["num_valid_matches"] == 77
        assert out["num_matches"] == 55
        assert out["num_features"] == 444
        assert out["inlier_ratio"] == pytest.approx(0.25)
        assert out["homography_share"] == pytest.approx(0.0654)
        assert out["median_displacement_px"] == pytest.approx(3.5)

    def test_superwindow_matches_sequential_windows(self):
        """lax.scan over windows must reproduce S sequential track_window
        calls exactly (same per-pair keys folding global frame ids)."""
        import jax
        import jax.numpy as jnp

        from mvslam_tpu.slam.tracking import (
            bootstrap_frame,
            pull_scalars,
            track_superwindow,
            track_window,
        )

        frames = make_sequence(num_frames=7, seed=13)
        fc = FeaturePipelineConfig(num_features=256, max_matches=128)
        pc = RobustPoseEstimatorConfig(num_hypotheses=64)
        K = jnp.asarray([[120.0, 0, 96.0], [0, 120.0, 64.0], [0, 0, 1]], jnp.float32)
        key = jax.random.key(7)
        window = 3

        prev = bootstrap_frame(jnp.asarray(frames[0]), fc)
        chunk = jnp.stack([jnp.asarray(f) for f in frames[1:]])  # (6, H, W)

        # Sequential: two track_window calls with chained features.
        feats1, track1 = track_window(key, prev, chunk[:3], K, fc, pc, start_index=jnp.int32(1))
        mid = jax.tree.map(lambda a: a[-1], feats1)
        _, track2 = track_window(key, mid, chunk[3:], K, fc, pc, start_index=jnp.int32(4))
        seq_r = np.concatenate(
            [pull_scalars(track1)["rotation"], pull_scalars(track2)["rotation"]]
        )
        seq_t = np.concatenate(
            [pull_scalars(track1)["translation"], pull_scalars(track2)["translation"]]
        )

        # Superwindow: one program over both windows.
        last, tracks = track_superwindow(
            key, prev, chunk, K, fc, pc, window=window, start_index=jnp.int32(1)
        )
        sw = pull_scalars(tracks)
        sw_r = sw["rotation"].reshape(-1, 3, 3)
        sw_t = sw["translation"].reshape(-1, 3)
        assert np.allclose(seq_r, sw_r, atol=1e-5)
        assert np.allclose(seq_t, sw_t, atol=1e-5)

    def test_window_tail_padding(self, tmp_path):
        frames = make_sequence(num_frames=6, seed=12)
        system = SLAMSystem(small_config(tmp_path))
        diags = system.run_sequence(frames, window=4)  # 5 tracked = 4 + 1 tail
        assert len(diags) == 6
        assert len(system.trajectory) == 6

    def test_superwindow_dispatch_matches_sequential(self, tmp_path):
        """The product path with windows_per_dispatch>1 (one scanned device
        program per S windows) must yield the identical trajectory."""
        frames = make_sequence(num_frames=7, seed=14)
        sys_seq = SLAMSystem(small_config(tmp_path / "seq"))
        sys_seq.run_sequence(frames, window=1)
        sys_sw = SLAMSystem(small_config(tmp_path / "sw"))
        diags = sys_sw.run_sequence(frames, window=3, windows_per_dispatch=2)
        assert len(diags) == 7
        pa = np.stack(sys_seq.trajectory.poses)
        pb = np.stack(sys_sw.trajectory.poses)
        assert np.allclose(pa, pb, atol=1e-5)

    def test_superwindow_dispatch_tail_padding(self, tmp_path):
        """9 frames, window=3, S=2: one full 6-frame dispatch + one padded
        tail dispatch (2 real frames padded to 6)."""
        frames = make_sequence(num_frames=9, seed=15)
        sys_seq = SLAMSystem(small_config(tmp_path / "seq"))
        sys_seq.run_sequence(frames, window=1)
        sys_sw = SLAMSystem(small_config(tmp_path / "sw"))
        diags = sys_sw.run_sequence(frames, window=3, windows_per_dispatch=2)
        assert len(diags) == 9
        assert len(sys_sw.trajectory) == 9
        pa = np.stack(sys_seq.trajectory.poses)
        pb = np.stack(sys_sw.trajectory.poses)
        assert np.allclose(pa, pb, atol=1e-5)


class TestRelocalizationE2E:
    def test_injected_loss_triggers_relocalization(self, tmp_path):
        """Parity: reference relocalization_demo flow — run, inject loss,
        verify relocalization against the on-demand map snapshot."""
        cfg = small_config(
            tmp_path,
            enable_relocalization=True,
            keyframe=KeyframeConfig(min_translation=0.01),  # many keyframes
            relocalization_min_inliers=15,
        )
        system = SLAMSystem(cfg)
        frames = make_sequence(num_frames=8, seed=21)
        system.inject_tracking_loss(6)
        diags = system.run_sequence(frames, window=1)
        assert diags[6].injected_loss
        assert not diags[6].pose_success
        # With several keyframes of the same scene, relocalization should hit.
        assert diags[6].relocalized
        result = system.finalize_run()
        assert result.num_relocalizations >= 1
        assert result.map_snapshot_paths is not None
        assert result.map_snapshot_paths["arrays"].exists()


class TestFlowFirstTracking:
    def test_flow_first_tracks_sequence(self, tmp_path):
        """pose_source='flow_first': LK pose path tracks a translating
        scene; diagnostics record the flow model; trajectory stays close
        to the feature path's."""
        frames = make_sequence(num_frames=6, seed=31)
        sys_feat = SLAMSystem(small_config(tmp_path / "feat"))
        sys_feat.run_sequence(frames, window=1)
        sys_flow = SLAMSystem(small_config(tmp_path / "flow", pose_source="flow_first"))
        diags = sys_flow.run_sequence(frames, window=1)
        assert len(diags) == 6
        tracked = [d for d in diags[1:] if d.pose_success]
        assert len(tracked) >= 4
        # At least some frames must have used the flow pose path.
        assert any(d.model_type.startswith("flow_") for d in tracked), [
            d.model_type for d in diags
        ]
        pa = np.stack(sys_feat.trajectory.poses)
        pb = np.stack(sys_flow.trajectory.poses)
        # Same scene, same scale convention: translation directions agree.
        da = pa[-1][:3, 3]
        db = pb[-1][:3, 3]
        cos = float(da @ db / (np.linalg.norm(da) * np.linalg.norm(db) + 1e-9))
        assert cos > 0.9, (da, db)

    def test_flow_fallback_on_blank_interlude(self, tmp_path):
        """When LK cannot track (featureless frame), the feature-matching
        fallback (and then the failure path) engages instead of crashing."""
        frames = make_sequence(num_frames=4, seed=32)
        frames[2] = np.zeros_like(frames[2])  # featureless frame
        system = SLAMSystem(small_config(tmp_path, pose_source="flow_first"))
        diags = system.run_sequence(frames, window=1)
        assert len(diags) == 4
        assert not diags[2].pose_success  # blank frame cannot produce a pose


class TestSuperwindowRelocalization:
    def test_injected_loss_inside_superwindow_dispatch(self, tmp_path):
        """Relocalization must work when the failing frame arrives via a
        superwindow dispatch (the feature provider reshapes (S, window)
        leaves to per-frame)."""
        cfg = small_config(
            tmp_path,
            enable_relocalization=True,
            keyframe=KeyframeConfig(min_translation=0.01),
            relocalization_min_inliers=15,
        )
        system = SLAMSystem(cfg)
        frames = make_sequence(num_frames=9, seed=41)
        system.inject_tracking_loss(5)
        diags = system.run_sequence(frames, window=2, windows_per_dispatch=2)
        assert len(diags) == 9
        assert diags[5].injected_loss and not diags[5].pose_success
        assert diags[5].relocalized
        # Frames after the loss keep tracking.
        assert any(d.pose_success for d in diags[6:])
