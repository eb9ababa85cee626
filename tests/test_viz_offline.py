"""Visualization + offline entry point + relocalization demo tests."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

os.environ.setdefault("MPLBACKEND", "Agg")

from mvslam_tpu.viz.path_animator import TrajectoryRecorder, clamp_yaw_rate
from mvslam_tpu.viz.viewer import rotation_to_euler_deg
from mvslam_tpu.viz.dashboard_server import DashboardStream, FrameStatus


def write_fake_kitti(root: Path, num_frames=8, h=96, w=128, shift=4, seed=0):
    from PIL import Image

    seq_dir = root / "sequences" / "00"
    img_dir = seq_dir / "image_0"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 30, size=(h, w + shift * num_frames)).astype(np.float32)
    for _ in range(80):
        y = rng.integers(22, h - 28)
        x = rng.integers(22, base.shape[1] - 28)
        s = rng.integers(3, 7)
        base[y : y + s, x : x + s] = rng.uniform(140, 255)
    # Two depth layers (top shifts at half speed): uniform shift is
    # rotation-degenerate (translation unobservable, cheirality gate trips);
    # layered parallax makes the synthetic motion geometrically observable.
    half = h // 2
    for i in range(num_frames):
        top = base[:half, (i * shift) // 2 : (i * shift) // 2 + w]
        bottom = base[half:, i * shift : i * shift + w]
        frame = np.concatenate([top, bottom], axis=0).astype(np.uint8)
        Image.fromarray(frame, mode="L").save(img_dir / f"{i:06d}.png")
    (seq_dir / "times.txt").write_text("\n".join(f"{0.1 * i:.6f}" for i in range(num_frames)))
    (seq_dir / "calib.txt").write_text(f"P0: 100 0 {w/2} 0 0 100 {h/2} 0 0 0 1 0\n")
    return root


class TestPathAnimator:
    def test_yaw_clamp(self):
        assert clamp_yaw_rate(0.0, np.radians(30.0), max_step_deg=5.0) == pytest.approx(
            np.radians(5.0)
        )
        assert clamp_yaw_rate(0.0, np.radians(-2.0), max_step_deg=5.0) == pytest.approx(
            np.radians(-2.0)
        )

    def test_recorder_accumulates(self):
        rec = TrajectoryRecorder()
        pose = np.eye(4)
        pose[0, 3] = 3.0
        pose[2, 3] = 4.0
        rec.update(pose)
        assert rec.positions == [(3.0, 4.0)]
        rec.add_loop_edge(0, 5)
        assert rec.loop_edges == [(0, 5)]

    def test_render_png(self, tmp_path):
        pytest.importorskip("matplotlib")
        from mvslam_tpu.viz.path_animator import VehiclePathLiveAnimator

        anim = VehiclePathLiveAnimator()
        for i in range(5):
            pose = np.eye(4)
            pose[0, 3] = float(i)
            anim.update(pose)
        out = tmp_path / "traj.png"
        anim.render_png(out)
        assert out.exists() and out.stat().st_size > 1000


class TestViewer:
    def test_euler_roundtrip(self):
        from mvslam_tpu.geometry.lie import so3_exp
        import jax.numpy as jnp

        R = np.asarray(so3_exp(jnp.asarray([0.0, 0.0, 0.3], dtype=jnp.float32)))
        roll, pitch, yaw = rotation_to_euler_deg(R)
        assert yaw == pytest.approx(np.degrees(0.3), abs=0.1)
        assert abs(roll) < 0.1 and abs(pitch) < 0.1

    def test_status_classification(self):
        from mvslam_tpu.viz.viewer import classify_status

        # Thresholds parity: reference slam_viewer.py:240-252.
        assert classify_status(10, 0.9)[0] == "Low match density"
        assert classify_status(100, 0.1)[0] == "Tracking lost"
        assert classify_status(100, 0.3)[0] == "Unstable pose"
        assert classify_status(100, 0.8)[0] == "Tracking stable"

    def test_headless_update_with_matches_and_status(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MPLBACKEND", "Agg")
        from mvslam_tpu.slam.api import FrameDiagnostics
        from mvslam_tpu.viz.viewer import SlamViewer

        rng = np.random.default_rng(0)
        viewer = SlamViewer(interactive=False, total_frames=3)
        frame = rng.uniform(0, 255, size=(96, 128)).astype(np.float32)
        kp = rng.uniform(0, 90, size=(50, 2)).astype(np.float32)
        for i in range(3):
            pose = np.eye(4)
            pose[0, 3] = float(i)
            diag = FrameDiagnostics(
                frame_id=i, timestamp=0.1 * i, num_features=50,
                num_matches=48, num_inliers=40, inlier_ratio=0.83,
            )
            viewer.update(
                frame,
                kp,
                pose,
                matches=(kp, kp + 2.0, np.arange(50) % 5 != 0),
                diagnostics=diag,
            )
        assert viewer.last_status == "Tracking stable"
        assert len(viewer.status_log) == 3
        assert "48 matches" in viewer.status_log[-1]
        out = tmp_path / "viewer.png"
        viewer.render_frame_png(out)
        assert out.exists() and out.stat().st_size > 1000


class TestDashboard:
    def test_frame_status_json(self):
        status = FrameStatus(frame_id=1, timestamp=0.1, num_matches=10)
        payload = json.loads(status.to_json())
        assert payload["frame_id"] == 1
        assert len(payload["pose_matrix"]) == 4

    def test_dashboard_stream(self, tmp_path):
        from mvslam_tpu.backend.keyframes import KeyframeConfig
        from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
        from mvslam_tpu.frontend.pose_estimator import RobustPoseEstimatorConfig
        from mvslam_tpu.slam.api import SLAMSystem, SLAMSystemConfig

        rng = np.random.default_rng(0)
        num, h, w, shift = 4, 96, 128, 4
        base = rng.uniform(0, 30, size=(h, w + shift * num)).astype(np.float32)
        for _ in range(80):
            y, x, s = rng.integers(22, h - 28), rng.integers(22, base.shape[1] - 28), rng.integers(3, 7)
            base[y : y + s, x : x + s] = rng.uniform(140, 255)
        frames = [base[:, i * shift : i * shift + w].copy() for i in range(num)]
        system = SLAMSystem(
            SLAMSystemConfig(
                run_id="dash", output_root=tmp_path, fx=100.0, fy=100.0, cx=64.0, cy=48.0,
                feature=FeaturePipelineConfig(num_features=128, max_matches=64),
                pose=RobustPoseEstimatorConfig(num_hypotheses=64),
            )
        )
        statuses = list(DashboardStream(system, frames))
        assert len(statuses) == 4
        assert statuses[-1].progress == pytest.approx(1.0)
        assert len(statuses[-1].trajectory) == 4

    def test_ws_http_server_roundtrip(self, tmp_path):
        pytest.importorskip("websockets")
        import asyncio
        import socket
        import urllib.request

        from mvslam_tpu.viz.dashboard_server import DashboardServer

        def free_port():
            with socket.socket() as s:
                s.bind(("127.0.0.1", 0))
                return s.getsockname()[1]

        ws_port, http_port = free_port(), free_port()
        server = DashboardServer(ws_port=ws_port, http_port=http_port)
        server.start()
        try:
            import time

            time.sleep(0.3)
            html = urllib.request.urlopen(
                f"http://127.0.0.1:{http_port}/index.html", timeout=3
            ).read()
            assert b"mvslam-tpu" in html

            async def ws_once():
                import websockets

                async with websockets.connect(f"ws://127.0.0.1:{ws_port}") as ws:
                    server.broadcast(FrameStatus(frame_id=7, timestamp=0.7))
                    msg = await asyncio.wait_for(ws.recv(), timeout=3)
                    return json.loads(msg)

            payload = asyncio.run(ws_once())
            assert payload["frame_id"] == 7
        finally:
            server.stop()


class TestOfflineEntryPoint:
    def test_dynamic_masking(self):
        from mvslam_tpu.slam.offline import mask_dynamic_regions

        prev = np.zeros((10, 10), np.float32)
        cur = prev.copy()
        cur[5, 5] = 200.0
        masked = mask_dynamic_regions(cur, prev, threshold=100.0)
        assert masked[5, 5] == 0.0
        assert masked[0, 0] == cur[0, 0]
        assert mask_dynamic_regions(cur, None, 100.0) is cur

    def test_run_visual_slam_kitti(self, tmp_path):
        from mvslam_tpu.slam.offline import SLAMRunConfig, run_visual_slam

        root = write_fake_kitti(tmp_path / "kitti")
        summary = run_visual_slam(
            SLAMRunConfig(
                input_path=root,
                input_kind="kitti",
                output_root=tmp_path / "runs",
                enable_loop_closure=True,
                loop_min_frame_gap=2,
            )
        )
        assert summary["frames"] == 8
        assert Path(summary["run_dir"]).exists()
        assert (Path(summary["run_dir"]) / "offline_summary.json").exists()

    def test_run_visual_slam_images_with_gt(self, tmp_path):
        from mvslam_tpu.slam.offline import SLAMRunConfig, run_visual_slam

        root = write_fake_kitti(tmp_path / "kitti")
        img_dir = root / "sequences" / "00" / "image_0"
        gt = tmp_path / "gt.txt"
        lines = []
        for i in range(8):
            T = np.eye(4)
            T[0, 3] = float(i)
            lines.append(" ".join(f"{v:.6f}" for v in T[:3, :].reshape(-1)))
        gt.write_text("\n".join(lines))
        summary = run_visual_slam(
            SLAMRunConfig(
                input_path=img_dir,
                input_kind="images",
                output_root=tmp_path / "runs",
                enable_loop_closure=False,
                ground_truth_path=gt,
            )
        )
        assert "metrics" in summary
        assert "ATE_RMSE" in summary["metrics"]


def write_fake_kitti_raw(base: Path, num_frames=8, h=96, w=128, shift=4, seed=0):
    """KITTI-raw drive layout with synthetic OXTS fixes.

    Mirrors the reference layout consumed at
    ``visual_slam_offline_entry_point.py:253-341``.
    """
    from PIL import Image

    date = "2011_09_26"
    drive_dir = base / date / f"{date}_drive_0001_sync"
    img_dir = drive_dir / "image_00" / "data"
    oxts_dir = drive_dir / "oxts" / "data"
    img_dir.mkdir(parents=True)
    oxts_dir.mkdir(parents=True)
    rng = np.random.default_rng(seed)
    base_img = rng.uniform(0, 30, size=(h, w + shift * num_frames)).astype(np.float32)
    for _ in range(80):
        y = rng.integers(22, h - 28)
        x = rng.integers(22, base_img.shape[1] - 28)
        s = rng.integers(3, 7)
        base_img[y : y + s, x : x + s] = rng.uniform(140, 255)
    half = h // 2
    lat0, lon0, alt0 = 49.0, 8.43, 112.0
    earth_radius = 6378137.0
    for i in range(num_frames):
        top = base_img[:half, (i * shift) // 2 : (i * shift) // 2 + w]
        bottom = base_img[half:, i * shift : i * shift + w]
        frame = np.concatenate([top, bottom], axis=0).astype(np.uint8)
        Image.fromarray(frame, mode="L").save(img_dir / f"{i:010d}.png")
        # Vehicle moves ~0.8 m east per frame: invert the ENU projection.
        east = 0.8 * i
        lon = lon0 + np.degrees(east / (earth_radius * np.cos(np.radians(lat0))))
        (oxts_dir / f"{i:010d}.txt").write_text(
            f"{lat0:.9f} {lon:.12f} {alt0:.3f} 0 0 0 0 0 0 0\n"
        )
    (base / date / "calib_cam_to_cam.txt").write_text(
        f"P_rect_00: 100 0 {w/2} 0 0 100 {h/2} 0 0 0 1 0\n"
    )
    return base


class TestKittiRawOxts:
    def test_oxts_projection_is_metric(self, tmp_path):
        from mvslam_tpu.data.kitti import KittiRawSession

        base = write_fake_kitti_raw(tmp_path / "raw")
        session = KittiRawSession(base_dir=base, date="2011_09_26", drive="1")
        pos = session.oxts_positions()
        assert pos.shape == (8, 3)
        np.testing.assert_allclose(pos[:, 0], 0.8 * np.arange(8), atol=1e-6)
        np.testing.assert_allclose(pos[:, 1:], 0.0, atol=1e-6)
        K = session.camera_intrinsics()
        assert K[0, 0] == 100.0 and K[2, 2] == 1.0

    def test_run_visual_slam_kitti_raw_uses_oxts_gt(self, tmp_path):
        from mvslam_tpu.slam.offline import SLAMRunConfig, run_visual_slam

        base = write_fake_kitti_raw(tmp_path / "raw")
        summary = run_visual_slam(
            SLAMRunConfig(
                input_path=base,
                input_kind="kitti_raw",
                kitti_date="2011_09_26",
                kitti_drive="0001",
                output_root=tmp_path / "runs",
                enable_loop_closure=False,
            )
        )
        assert summary["frames"] == 8
        assert summary.get("ground_truth") == "oxts"
        assert "ATE_RMSE" in summary["metrics"]
        assert np.isfinite(summary["metrics"]["ATE_RMSE"])


class TestRelocalizationDemo:
    def test_demo_reports_recovery(self, tmp_path):
        from mvslam_tpu.slam.relocalization_demo import (
            RelocalizationDemoConfig,
            run_relocalization_demo,
        )

        root = write_fake_kitti(tmp_path / "kitti", num_frames=8)
        report = run_relocalization_demo(
            RelocalizationDemoConfig(
                dataset_root=root,
                inject_at_frame=6,
                max_frames=8,
                output_root=tmp_path / "runs",
            )
        )
        assert report["injected_frames"] == [6]
        assert Path(report["report_path"]).exists()
        assert report["events_summary"]["attempts"] >= 0
        data = json.loads(Path(report["report_path"]).read_text())
        assert "recovered" in data
