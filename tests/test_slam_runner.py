"""KITTI runner integration tests on a generated fake dataset.

Parity: reference tests/test_slam_runner.py:20-135 — write a tiny KITTI
layout on the fly, exercise sync + streaming ingestion, assert artifacts.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from mvslam_tpu.data.kitti import KittiSequence, load_ground_truth_poses, parse_kitti_calib_file
from mvslam_tpu.data.validation import (
    main as validation_main,
    validate_kitti,
    validate_kitti_multi_camera,
    validate_tum,
)
from mvslam_tpu.slam.runner import load_pipeline_config, run_kitti_sequence


def write_fake_kitti(root: Path, num_frames=5, h=96, w=128, shift=4, seed=0):
    """Tiny KITTI odometry layout with textured, translating frames."""
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
    fx = 100.0
    P = f"{fx} 0 {w/2} 0 0 {fx} {h/2} 0 0 0 1 0"
    (seq_dir / "calib.txt").write_text(f"P0: {P}\nP1: {P.replace('0 0 0 1 0', '0 0 0 1 -38.6')}\n")
    return root


@pytest.fixture()
def fake_kitti(tmp_path):
    return write_fake_kitti(tmp_path / "kitti")


class TestKittiDataset:
    def test_sequence_loading(self, fake_kitti):
        seq = KittiSequence(fake_kitti, "00")
        assert len(seq) == 5
        K = seq.camera_intrinsics()
        assert K[0, 0] == 100.0
        assert K[0, 2] == 64.0
        entries = seq.frame_entries(3)
        assert len(entries) == 3
        assert entries[1].timestamp == pytest.approx(0.1)

    def test_iter_frames_streams_in_order(self, fake_kitti):
        seq = KittiSequence(fake_kitti, "00")
        packets = list(seq.iter_frames())
        assert [p.index for p in packets] == list(range(5))
        assert packets[0].frame.shape == (96, 128)

    def test_nearest_frame(self, fake_kitti):
        seq = KittiSequence(fake_kitti, "00")
        assert seq.nearest_frame(0.21) == 2
        assert seq.nearest_frame(-1.0) == 0
        assert seq.nearest_frame(99.0) == 4

    def test_calib_parsing(self, fake_kitti):
        calib = parse_kitti_calib_file(fake_kitti / "sequences" / "00" / "calib.txt")
        assert "P0" in calib and calib["P0"].size == 12

    def test_ground_truth_poses(self, tmp_path):
        lines = ["1 0 0 0 0 1 0 0 0 0 1 0", "1 0 0 1 0 1 0 0 0 0 1 0"]
        p = tmp_path / "00.txt"
        p.write_text("\n".join(lines))
        poses = load_ground_truth_poses(p)
        assert poses.shape == (2, 4, 4)
        assert poses[1][0, 3] == 1.0


class TestValidation:
    def test_valid_dataset_passes(self, fake_kitti):
        result = validate_kitti(fake_kitti, "00")
        assert result.ok, result.errors
        assert result.stats["num_images"] == 5

    def test_missing_dataset_fails(self, tmp_path):
        result = validate_kitti(tmp_path, "00")
        assert not result.ok

    def test_short_times_fails(self, fake_kitti):
        (fake_kitti / "sequences" / "00" / "times.txt").write_text("0.0\n")
        result = validate_kitti(fake_kitti, "00")
        assert not result.ok

    def test_multi_camera_passes(self, fake_kitti):
        import shutil

        seq_dir = fake_kitti / "sequences" / "00"
        shutil.copytree(seq_dir / "image_0", seq_dir / "image_1")
        result = validate_kitti_multi_camera(fake_kitti, "00", (0, 1))
        assert result.ok, result.errors
        assert result.stats["camera_0_num_images"] == 5
        assert result.stats["camera_1_num_images"] == 5
        assert result.stats["sync_report"]["matched"] == 5
        assert result.stats["sync_report"]["dropped_primary"] == 0
        assert result.stats["calibration"]["ok"]

    def test_multi_camera_missing_camera_fails(self, fake_kitti):
        result = validate_kitti_multi_camera(fake_kitti, "00", (0, 1))
        assert not result.ok
        assert any("image_1" in e for e in result.errors)

    def test_multi_camera_cli(self, fake_kitti, capsys):
        import shutil

        seq_dir = fake_kitti / "sequences" / "00"
        shutil.copytree(seq_dir / "image_0", seq_dir / "image_1")
        rc = validation_main(
            [str(fake_kitti), "--format", "kitti_multi", "--cameras", "0,1", "--json"]
        )
        assert rc == 0
        report = json.loads(capsys.readouterr().out)
        assert report["ok"] and report["stats"]["sync_report"]["matched"] == 5

    def test_tum_layout(self, tmp_path):
        (tmp_path / "rgb").mkdir()
        result = validate_tum(tmp_path)
        assert not result.ok  # no images
        from PIL import Image

        Image.fromarray(np.zeros((8, 8), np.uint8), mode="L").save(tmp_path / "rgb" / "0.png")
        result = validate_tum(tmp_path)
        assert result.ok
        assert "groundtruth" in result.warnings[0]


class TestRunner:
    @pytest.mark.parametrize("ingestion", ["sync", "stream"])
    def test_run_modes_produce_artifacts(self, fake_kitti, tmp_path, ingestion):
        result = run_kitti_sequence(
            fake_kitti,
            sequence="00",
            run_id=f"t_{ingestion}",
            output_root=tmp_path / "runs",
            ingestion=ingestion,
            config_path=None,
        )
        assert result.num_frames == 5
        assert result.trajectory_path.exists()
        assert result.metrics_path.exists()
        metrics = json.loads(result.metrics_path.read_text())
        assert metrics["metrics"]["num_frames"] == 5
        assert metrics["determinism"]["seed"] == 0

    def test_pipeline_config_strictness(self, tmp_path):
        cfg = tmp_path / "cfg.json"
        cfg.write_text(json.dumps({"feature": {"num_features": 128, "bogus_field": 1}}))
        with pytest.raises(ValueError, match="bogus_field"):
            load_pipeline_config(cfg)
        cfg.write_text(json.dumps({"unknown_section": {}}))
        with pytest.raises(ValueError, match="unknown_section"):
            load_pipeline_config(cfg)
        cfg.write_text(json.dumps({"feature": {"num_features": 128}}))
        sections = load_pipeline_config(cfg)
        assert sections["feature"].num_features == 128

    def test_runner_with_config_and_injection(self, fake_kitti, tmp_path):
        cfg = tmp_path / "cfg.json"
        cfg.write_text(
            json.dumps(
                {
                    "feature": {"num_features": 256, "max_matches": 128},
                    "pose": {"num_hypotheses": 64},
                    "keyframe": {"min_translation": 0.05},
                }
            )
        )
        result = run_kitti_sequence(
            fake_kitti,
            run_id="cfg_run",
            output_root=tmp_path / "runs",
            config_path=cfg,
            ingestion="sync",
            inject_loss_at=2,
        )
        diags = json.loads(result.diagnostics_path.read_text())
        assert diags[2]["injected_loss"]
        metrics = json.loads(result.metrics_path.read_text())
        assert metrics["determinism"]["config_hash"] != ""


class TestMultiCamera:
    def _rig_dataset(self, tmp_path):
        root = write_fake_kitti(tmp_path / "kitti")
        seq_dir = root / "sequences" / "00"
        # Second camera: copy images with slightly offset timestamps.
        import shutil

        img1 = seq_dir / "image_1"
        shutil.copytree(seq_dir / "image_0", img1)
        return root

    def test_synchronize_by_timestamp(self, tmp_path):
        from mvslam_tpu.data.kitti import MultiCameraKittiSequence

        root = self._rig_dataset(tmp_path)
        multi = MultiCameraKittiSequence(root, "00", cameras=(0, 1))
        matched, report = multi.synchronize(tolerance_s=0.01)
        assert report.matched == 5
        assert all(m[0] == m[1] for m in matched)
        rig = multi.rig()
        assert rig.baseline("P0", "P1") > 0
        assert rig.validate().ok

    def test_synchronize_by_index(self, tmp_path):
        from mvslam_tpu.data.kitti import MultiCameraKittiSequence

        root = self._rig_dataset(tmp_path)
        multi = MultiCameraKittiSequence(root, "00", cameras=(0, 1))
        matched, report = multi.synchronize(method="index")
        assert report.method == "index"
        assert report.matched == 5


class TestTumDataset:
    def _fake_tum(self, tmp_path):
        from PIL import Image

        root = tmp_path / "tum"
        (root / "rgb").mkdir(parents=True)
        rng = np.random.default_rng(0)
        lines = ["# ts filename"]
        for i in range(4):
            ts = 1305031102.175304 + 0.033 * i
            name = f"rgb/{ts:.6f}.png"
            Image.fromarray(
                rng.integers(0, 255, size=(48, 64), dtype=np.uint8), mode="L"
            ).save(root / name)
            lines.append(f"{ts:.6f} {name}")
        (root / "rgb.txt").write_text("\n".join(lines))
        (root / "groundtruth.txt").write_text(
            "# ts tx ty tz qx qy qz qw\n"
            + "\n".join(
                f"{1305031102.175304 + 0.033 * i:.6f} {0.1 * i:.4f} 0 0 0 0 0 1"
                for i in range(4)
            )
        )
        return root

    def test_tum_sequence(self, tmp_path):
        from mvslam_tpu.data.tum import TumSequence

        seq = TumSequence(self._fake_tum(tmp_path))
        assert len(seq) == 4
        packets = list(seq.iter_frames())
        assert [p.index for p in packets] == [0, 1, 2, 3]
        assert packets[1].timestamp == pytest.approx(1305031102.208304, abs=1e-4)
        K = seq.camera_intrinsics()
        assert K[0, 0] == pytest.approx(517.3)
        ts, pos = seq.ground_truth()
        assert pos.shape == (4, 3)
        assert pos[2, 0] == pytest.approx(0.2)

    def test_tum_without_index(self, tmp_path):
        import shutil

        root = self._fake_tum(tmp_path)
        (root / "rgb.txt").unlink()
        from mvslam_tpu.data.tum import TumSequence

        seq = TumSequence(root)
        assert len(seq) == 4
        assert seq.entries[0].timestamp > 1e9  # parsed from filename stem
