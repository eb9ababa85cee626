"""Side-by-side GUI viewer: video frame with keypoints + 2-D trajectory.

Parity: reference ``slam_viewer.py`` — matplotlib figure with the current
frame (keypoints overlaid) on the left and the x/z trajectory on the
right, plus an Euler-angle text overlay (ref L32-44, L66+). Works headless
with MPLBACKEND=Agg via ``render_frame_png``.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np


def rotation_to_euler_deg(R: np.ndarray) -> Tuple[float, float, float]:
    """ZYX Euler angles (roll, pitch, yaw) in degrees.

    Parity: ``slam_viewer.py:32-44``.
    """
    R = np.asarray(R)
    sy = math.sqrt(R[0, 0] ** 2 + R[1, 0] ** 2)
    if sy > 1e-6:
        roll = math.atan2(R[2, 1], R[2, 2])
        pitch = math.atan2(-R[2, 0], sy)
        yaw = math.atan2(R[1, 0], R[0, 0])
    else:
        roll = math.atan2(-R[1, 2], R[1, 1])
        pitch = math.atan2(-R[2, 0], sy)
        yaw = 0.0
    return math.degrees(roll), math.degrees(pitch), math.degrees(yaw)


class SlamViewer:
    """Incremental viewer over (frame, keypoints, pose) updates."""

    def __init__(self, interactive: bool = True) -> None:
        self.interactive = interactive
        self._fig = None
        self._axes = None
        self.trajectory: List[Tuple[float, float]] = []

    def _ensure_figure(self):
        import matplotlib

        if not self.interactive:
            matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        if self._fig is None:
            self._fig, self._axes = plt.subplots(1, 2, figsize=(12, 5))
            if self.interactive:
                plt.ion()
                plt.show(block=False)
        return self._fig, self._axes

    def update(
        self,
        frame: np.ndarray,
        keypoints: Optional[np.ndarray],
        pose: np.ndarray,
        valid: Optional[np.ndarray] = None,
    ) -> None:
        fig, (ax_img, ax_traj) = self._ensure_figure()
        pose = np.asarray(pose)
        self.trajectory.append((float(pose[0, 3]), float(pose[2, 3])))

        ax_img.clear()
        ax_img.imshow(np.asarray(frame), cmap="gray")
        if keypoints is not None:
            kp = np.asarray(keypoints)
            if valid is not None:
                kp = kp[np.asarray(valid)]
            if len(kp):
                ax_img.scatter(kp[:, 0], kp[:, 1], s=4, c="lime", alpha=0.7)
        roll, pitch, yaw = rotation_to_euler_deg(pose[:3, :3])
        ax_img.set_title(f"roll {roll:+.1f}°  pitch {pitch:+.1f}°  yaw {yaw:+.1f}°")
        ax_img.axis("off")

        ax_traj.clear()
        if len(self.trajectory) > 1:
            xs, zs = zip(*self.trajectory)
            ax_traj.plot(xs, zs, "b-")
        ax_traj.set_xlabel("x [m]")
        ax_traj.set_ylabel("z [m]")
        ax_traj.set_aspect("equal", adjustable="datalim")
        ax_traj.set_title("trajectory")
        if self.interactive:
            fig.canvas.draw_idle()
            fig.canvas.flush_events()

    def render_frame_png(self, path) -> None:
        if self._fig is not None:
            self._fig.savefig(path, dpi=100, bbox_inches="tight")
