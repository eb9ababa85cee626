"""A/B the out-and-back loop-closure accuracy scene (tests/test_accuracy.py:193).

Runs the exact failing-test scenario and prints loop-ON vs loop-OFF ATE as
one JSON line, so individual RANSAC latency levers (``ab04a4b``) can be
priced in pose accuracy. Usage:

    JAX_PLATFORMS=cpu python benchmarks/ab_loop_accuracy.py [--seeds 3,4,5]
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np


def run_scene(tmp: Path, seed: int, scene_seed: int = 2):
    from PIL import Image

    from mvslam_tpu.data.synthetic import render_scene
    from mvslam_tpu.slam.offline import SLAMRunConfig, run_visual_slam

    half = 14

    def out_and_back(i):
        x = 0.25 * i if i <= half else 0.25 * (2 * half - i)
        return np.eye(3), np.array([x, 0.0, 0.0])

    frames, gt_pos, (fx, fy, cx, cy), _ = render_scene(
        num_frames=2 * half + 1, traj_fn=out_and_back, noise=6.0, seed=scene_seed
    )
    root = tmp / f"kitti_s{seed}_{scene_seed}"
    seq_dir = root / "sequences" / "00"
    img_dir = seq_dir / "image_0"
    img_dir.mkdir(parents=True)
    for i, f in enumerate(frames):
        Image.fromarray(f.astype(np.uint8), mode="L").save(img_dir / f"{i:06d}.png")
    (seq_dir / "times.txt").write_text(
        "\n".join(f"{0.1 * i:.6f}" for i in range(len(frames)))
    )
    (seq_dir / "calib.txt").write_text(f"P0: {fx} 0 {cx} 0 0 {fy} {cy} 0 0 0 1 0\n")
    gt_path = tmp / f"gt_{seed}_{scene_seed}.txt"
    gt_path.write_text(
        "\n".join(f"1 0 0 {p[0]} 0 1 0 {p[1]} 0 0 1 {p[2]}" for p in gt_pos)
    )
    common = dict(
        input_path=root, input_kind="kitti", sequence="00",
        output_root=tmp / f"runs_{seed}_{scene_seed}", seed=seed,
        ground_truth_path=gt_path,
        loop_min_frame_gap=12, loop_similarity_threshold=0.7, loop_min_inliers=25,
    )
    off = run_visual_slam(
        SLAMRunConfig(run_id="loop_off", enable_loop_closure=False, **common)
    )
    on = run_visual_slam(
        SLAMRunConfig(run_id="loop_on", enable_loop_closure=True, **common)
    )
    return {
        "seed": seed,
        "scene_seed": scene_seed,
        "ate_off": float(off["metrics"]["ATE_RMSE"]),
        "ate_on": float(on["metrics"]["ATE_RMSE"]),
        "loops_accepted": len(on["loops_accepted"]),
        "pass": bool(
            len(on["loops_accepted"]) >= 1
            and on["metrics"]["ATE_RMSE"] < off["metrics"]["ATE_RMSE"]
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="3")
    ap.add_argument("--label", default="head")
    args = ap.parse_args()
    results = []
    with tempfile.TemporaryDirectory() as td:
        for seed in (int(s) for s in args.seeds.split(",")):
            r = run_scene(Path(td), seed)
            results.append(r)
            print(json.dumps({"label": args.label, **r}), flush=True)
    n_pass = sum(r["pass"] for r in results)
    print(json.dumps({"label": args.label, "passes": n_pass, "total": len(results)}))
    return 0 if n_pass == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
