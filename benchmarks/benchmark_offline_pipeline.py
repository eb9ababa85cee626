"""Full-pipeline offline throughput: tracking + keyframes + local BA +
loop closure measured TOGETHER (VERDICT r2 item 4).

The reference's demo loop times the whole system
(``visual_slam_offline_entry_point.py:433-679``); bench.py times tracking
only. This benchmark renders an out-and-back revisit sequence
(``mvslam_tpu.data.synthetic``), writes it as a KITTI layout, and runs the
offline entry point twice — product defaults (local BA + loop closure ON)
and bare tracking — emitting ``{fps, ate, keyframes, loops}`` for each so
the BA/loop overhead is a recorded number, not a footnote.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np

from benchmarks._harness import emit, ensure_live_backend, measured


def _sequence(tmp: Path, num_frames: int):
    from mvslam_tpu.data.synthetic import render_scene, write_kitti_sequence

    half = num_frames // 2

    def out_and_back(i):
        x = 0.25 * i if i <= half else 0.25 * (2 * half - i)
        return np.eye(3), np.array([x, 0.0, 0.0])

    frames, gt_pos, intr, _ = render_scene(
        num_frames=num_frames, traj_fn=out_and_back, noise=6.0, seed=2
    )
    return write_kitti_sequence(tmp / "kitti", frames, gt_pos, intr)


def _run(root: Path, gt_path: Path, out_root: Path, run_id: str, **overrides):
    from mvslam_tpu.slam.offline import SLAMRunConfig, run_visual_slam

    config = SLAMRunConfig(
        input_path=root,
        input_kind="kitti",
        sequence="00",
        output_root=out_root,
        seed=3,
        ground_truth_path=gt_path,
        loop_min_frame_gap=12,
        loop_similarity_threshold=0.7,
        loop_min_inliers=25,
        run_id=run_id,
        **overrides,
    )
    report = {}
    with measured(report):
        summary = run_visual_slam(config)
    fps = summary["frames"] / max(report["elapsed_s"], 1e-9)
    emit(
        f"offline_pipeline_{run_id}_fps",
        fps,
        "frames/s",
        **report,
        ate_rmse=summary.get("metrics", {}).get("ATE_RMSE"),
        keyframes=summary["keyframes"],
        loops=len(summary["loops_accepted"]),
        frames=summary["frames"],
    )
    return fps, summary


def main(num_frames: int = 29, passes: int = 3):
    ensure_live_backend()
    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        root, gt_path = _sequence(tmp, num_frames)
        # Warm the compile caches with a full-length throwaway run (BA
        # window + pose-graph + loop-verify programs only compile once a
        # keyframe window fills / a loop is accepted, so a short warmup
        # would leave the timed "full" leg paying their compiles).
        _run(root, gt_path, tmp / "warm", "warmup")
        # Best-of-passes, same convention as bench.py: the tunnel has
        # multi-minute degraded phases (3-10x on every launch/fetch) that
        # would otherwise decide the recorded number; every pass is
        # emitted so the spread stays visible in the JSONL.
        fps_full, s_full = max(
            (_run(root, gt_path, tmp / "runs", f"full_p{i}") for i in range(passes)),
            key=lambda t: t[0],
        )
        fps_bare, s_bare = max(
            (
                _run(
                    root, gt_path, tmp / "runs", f"tracking_only_p{i}",
                    enable_loop_closure=False, enable_local_ba=False,
                )
                for i in range(passes)
            ),
            key=lambda t: t[0],
        )
        emit(
            "offline_pipeline_ba_loop_overhead",
            (fps_bare / max(fps_full, 1e-9)) - 1.0,
            "x_slowdown",
            full_fps=round(fps_full, 3),
            tracking_only_fps=round(fps_bare, 3),
            full_ate=s_full.get("metrics", {}).get("ATE_RMSE"),
            tracking_only_ate=s_bare.get("metrics", {}).get("ATE_RMSE"),
        )


if __name__ == "__main__":
    main()
