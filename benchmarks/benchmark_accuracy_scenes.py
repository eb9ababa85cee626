"""Aggregate accuracy over ALL committed rendered scenes (VERDICT r4 #2/#7).

Runs the full SLAM stack over every rendered accuracy scene the test suite
asserts on — straight translation, yawing arc, noisy arc (window BA), and
the out-and-back revisit loop (loop closure ON vs OFF through the offline
entry point) — and emits per-scene ATE/RPE plus the aggregate mean as
governance-compatible JSON metric lines. The committed baseline store
(``baselines/accuracy_scenes.json``) + gate config
(``configs/evaluation/accuracy_gate.json``) turn these into a CI tripwire:
an ``ab04a4b``-style pose-precision regression moves
``accuracy_oab_loop_ate_ratio`` above 1.0 and per-scene ATE multiples above
tolerance, failing the gate the same way a perf regression fails
``perf_gate.json``.

Reference parity: the reference gates ATE/RPE against committed baselines
(``regression_baselines.py:54-112``, ``configs/evaluation/kitti_odometry.json``)
— this is that design pointed at the repo's committed scenes (aggregation
idiom: ``evaluation_harness.py:386-398``).

Runs on CPU or TPU (accuracy, not speed). Usage:
    python -m benchmarks.benchmark_accuracy_scenes
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np

from benchmarks._harness import emit


def yaw_matrix(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def _tracking_ate(frames, gt_pos, intr, tmp: Path, run_id: str, num_features=512,
                  num_hypotheses=256, keyframe_min_translation=None):
    """ATE/RPE of the core tracking stack (SLAMSystem defaults, BA on)."""
    from mvslam_tpu.backend.keyframes import KeyframeConfig
    from mvslam_tpu.eval.trajectory import compute_additional_metrics
    from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
    from mvslam_tpu.frontend.pose_estimator import RobustPoseEstimatorConfig
    from mvslam_tpu.slam.api import SLAMSystem, SLAMSystemConfig

    fx, fy, cx, cy = intr
    kwargs = {}
    if keyframe_min_translation is not None:
        kwargs["keyframe"] = KeyframeConfig(min_translation=keyframe_min_translation)
    system = SLAMSystem(
        SLAMSystemConfig(
            run_id=run_id, output_root=tmp, seed=3,
            fx=fx, fy=fy, cx=cx, cy=cy,
            feature=FeaturePipelineConfig(
                num_features=num_features, max_matches=num_features // 2
            ),
            pose=RobustPoseEstimatorConfig(
                num_hypotheses=num_hypotheses, adaptive_threshold=False,
                essential_threshold_px=2.0,
            ),
            **kwargs,
        )
    )
    system.run_sequence(frames)
    est = np.stack(system.trajectory.poses)[:, :3, 3]
    return compute_additional_metrics(est, gt_pos)


def _offline_loop_scene(tmp: Path):
    """Out-and-back revisit through the offline entry point, loops ON/OFF."""
    from mvslam_tpu.data.synthetic import render_scene, write_kitti_sequence
    from mvslam_tpu.slam.offline import SLAMRunConfig, run_visual_slam

    half = 14

    def out_and_back(i):
        x = 0.25 * i if i <= half else 0.25 * (2 * half - i)
        return np.eye(3), np.array([x, 0.0, 0.0])

    frames, gt_pos, intr, _ = render_scene(
        num_frames=2 * half + 1, traj_fn=out_and_back, noise=6.0, seed=2
    )
    root, gt_path = write_kitti_sequence(tmp / "kitti_oab", frames, gt_pos, intr)
    common = dict(
        input_path=root, input_kind="kitti", sequence="00",
        output_root=tmp / "runs_oab", seed=3, ground_truth_path=gt_path,
        loop_min_frame_gap=12, loop_similarity_threshold=0.7, loop_min_inliers=25,
    )
    off = run_visual_slam(
        SLAMRunConfig(run_id="loop_off", enable_loop_closure=False, **common)
    )
    on = run_visual_slam(
        SLAMRunConfig(run_id="loop_on", enable_loop_closure=True, **common)
    )
    return on, off


def main() -> None:
    from mvslam_tpu.data.synthetic import render_scene

    ates = []

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)

        # 1. Straight translation, clean texture (tests/test_accuracy.py:33).
        frames, gt, intr, _ = render_scene()
        m = _tracking_ate(frames, gt, intr, tmp, "straight",
                          keyframe_min_translation=0.05)
        emit("accuracy_straight_ate_rmse", m["ATE_RMSE"], "m")
        emit("accuracy_straight_rpe_rmse", m["RPE_RMSE"], "m")
        ates.append(m["ATE_RMSE"])

        # 2. Yawing arc — rotation + translation (tests/test_accuracy.py:89).
        frames, gt, intr, _ = render_scene(
            traj_fn=lambda i: (yaw_matrix(0.03 * i), np.array([0.25 * i, 0.0, 0.05 * i]))
        )
        m = _tracking_ate(frames, gt, intr, tmp, "yaw_arc")
        emit("accuracy_yaw_arc_ate_rmse", m["ATE_RMSE"], "m")
        emit("accuracy_yaw_arc_rpe_rmse", m["RPE_RMSE"], "m")
        ates.append(m["ATE_RMSE"])

        # 3. Noisy arc — window BA does real work (tests/test_accuracy.py:244).
        frames, gt, intr, _ = render_scene(
            num_frames=14,
            traj_fn=lambda i: (yaw_matrix(0.02 * i), np.array([0.25 * i, 0.0, 0.05 * i])),
            noise=5.0, seed=11,
        )
        m = _tracking_ate(frames, gt, intr, tmp, "noisy_arc",
                          keyframe_min_translation=0.05)
        emit("accuracy_noisy_arc_ate_rmse", m["ATE_RMSE"], "m")
        emit("accuracy_noisy_arc_rpe_rmse", m["RPE_RMSE"], "m")
        ates.append(m["ATE_RMSE"])

        # 4. Out-and-back revisit: full system, loop closure ON vs OFF
        #    (tests/test_accuracy.py:193; the ab04a4b tripwire).
        on, off = _offline_loop_scene(tmp)
        ate_on = float(on["metrics"]["ATE_RMSE"])
        ate_off = float(off["metrics"]["ATE_RMSE"])
        emit("accuracy_oab_loop_on_ate_rmse", ate_on, "m",
             loops_accepted=len(on["loops_accepted"]))
        emit("accuracy_oab_loop_off_ate_rmse", ate_off, "m")
        # < 1.0 iff accepted loops HELP — the reference's loop-verification
        # contract (visual_slam_offline_entry_point.py:557-648).
        emit("accuracy_oab_loop_ate_ratio", ate_on / max(ate_off, 1e-12), "ratio")
        ates.append(ate_on)

        emit("accuracy_mean_ate_rmse", float(np.mean(ates)), "m", scenes=len(ates))


if __name__ == "__main__":
    main()
