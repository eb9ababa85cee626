"""Regenerate the homography-warped real-texture fixtures.

Inputs: matplotlib's bundled ``grace_hopper.jpg`` (public-domain 1984 US
Navy photograph). Outputs (all deterministic):

- ``hopper_rot_00/01.png`` — a pure camera-ROTATION pair: frame 01 is
  frame 00 seen through H = K·R·K⁻¹ (R = 4° yaw · 2° roll). Rotation of a
  camera viewing ANY scene is exactly a homography, translation is zero,
  so the dual-model estimator must prefer H (the essential branch is
  parallax-degenerate) and LK must track the rotational flow.
- ``hopper_plane_00/01.png`` — a PLANE + camera-translation pair:
  H = K·(R − t·nᵀ/d)·K⁻¹ with known (R, t, n, d); frame 01 also gets a
  mild exposure change (gain 1.15, gamma 0.92). A planar scene under
  translation is the classic homography-wins geometry.
- ``homographies.json`` — the exact K, H, R, t, n, d used (row-major),
  so tests can assert against ground truth.

Warps sample the FULL source photo (not the crop) with bilinear
interpolation, so warped frames keep real texture to the borders.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

OUT = Path(__file__).parent
W, H = 320, 240
OFF_X, OFF_Y = 96, 180  # crop window origin inside the source photo
K = np.array([[300.0, 0.0, W / 2], [0.0, 300.0, H / 2], [0.0, 0.0, 1.0]])


def _source() -> np.ndarray:
    import matplotlib

    path = Path(matplotlib.get_data_path()) / "sample_data" / "grace_hopper.jpg"
    from PIL import Image

    return np.asarray(Image.open(path).convert("L")).astype(np.float64)


def _rot(yaw_deg: float, roll_deg: float) -> np.ndarray:
    y = np.deg2rad(yaw_deg)
    r = np.deg2rad(roll_deg)
    Ry = np.array([[np.cos(y), 0, np.sin(y)], [0, 1, 0], [-np.sin(y), 0, np.cos(y)]])
    Rz = np.array([[np.cos(r), -np.sin(r), 0], [np.sin(r), np.cos(r), 0], [0, 0, 1]])
    return Rz @ Ry


def _warp_from_source(src: np.ndarray, H_win: np.ndarray) -> np.ndarray:
    """Render the crop window through H_win⁻¹, sampling the full source.

    H_win maps window coords of frame 0 → window coords of the new frame;
    frame-0 window coords map into the source by the crop offset.
    """
    Hinv = np.linalg.inv(H_win)
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    ones = np.ones_like(u)
    pts = np.stack([u, v, ones], axis=-1) @ Hinv.T
    x = pts[..., 0] / pts[..., 2] + OFF_X
    y = pts[..., 1] / pts[..., 2] + OFF_Y
    x0 = np.clip(np.floor(x).astype(int), 0, src.shape[1] - 2)
    y0 = np.clip(np.floor(y).astype(int), 0, src.shape[0] - 2)
    fx = np.clip(x - x0, 0.0, 1.0)
    fy = np.clip(y - y0, 0.0, 1.0)
    a = src[y0, x0] * (1 - fx) + src[y0, x0 + 1] * fx
    b = src[y0 + 1, x0] * (1 - fx) + src[y0 + 1, x0 + 1] * fx
    return a * (1 - fy) + b * fy


def _save(img: np.ndarray, name: str) -> None:
    from PIL import Image

    Image.fromarray(np.clip(img, 0, 255).astype(np.uint8), mode="L").save(OUT / name)


def main() -> None:
    src = _source()
    base = src[OFF_Y : OFF_Y + H, OFF_X : OFF_X + W]
    meta = {"K": K.tolist(), "crop_offset": [OFF_X, OFF_Y]}

    # Pure rotation pair.
    R = _rot(yaw_deg=4.0, roll_deg=2.0)
    H_rot = K @ R @ np.linalg.inv(K)
    H_rot /= H_rot[2, 2]
    _save(base, "hopper_rot_00.png")
    _save(_warp_from_source(src, H_rot), "hopper_rot_01.png")
    meta["rot"] = {"H": H_rot.tolist(), "R": R.tolist(), "yaw_deg": 4.0, "roll_deg": 2.0}

    # Plane + translation pair (n = plane normal in cam1, d = distance).
    Rp = _rot(yaw_deg=2.0, roll_deg=0.0)
    t = np.array([0.25, 0.08, 0.04])
    n = np.array([0.0, 0.0, 1.0])
    d = 5.0
    H_pl = K @ (Rp - np.outer(t, n) / d) @ np.linalg.inv(K)
    H_pl /= H_pl[2, 2]
    warped = _warp_from_source(src, H_pl)
    warped = 255.0 * np.clip(1.15 * (warped / 255.0) ** 0.92, 0.0, 1.0)  # exposure change
    _save(base, "hopper_plane_00.png")
    _save(warped, "hopper_plane_01.png")
    meta["plane"] = {
        "H": H_pl.tolist(),
        "R": Rp.tolist(),
        "t": t.tolist(),
        "n": n.tolist(),
        "d": d,
        "exposure": {"gain": 1.15, "gamma": 0.92},
    }

    (OUT / "homographies.json").write_text(json.dumps(meta, indent=2))
    print("wrote warped fixtures to", OUT)


if __name__ == "__main__":
    main()
