"""Schema-versioned persistent map snapshots + relocalization.

Parity: reference ``persistent_map.py`` — ``MapKeyframe(frame_id, pose,
keypoints, descriptors)`` (ref L24-29), ``PersistentMapSnapshot`` with BoW
vocabulary/histograms/frame_ids and a ``stable_hash`` digest (ref L32-54),
npz + JSON persistence (ref L122-194), ``compute_bow_histogram`` (ref
L82-96), and ``MapRelocalizer`` (ref L197-319): BoW cosine ranking →
top-K candidates → descriptor matching → essential-matrix RANSAC
geometric verification → best by (inliers, score, −frame_id).

The relocalizer's match + RANSAC verification per candidate is the same
fused device kernel used by live tracking.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.core.integrity import stable_hash
from mvslam_tpu.loopclosure.bow import compute_bow_histogram
from mvslam_tpu.geometry.epipolar import decompose_essential
from mvslam_tpu.geometry.projection import normalize_pixels
from mvslam_tpu.ops.hamming import (
    MatchConfig,
    gather_matched_points,
    match_descriptors,
    select_matches,
)
from mvslam_tpu.ops.ransac import RansacConfig, ransac_essential

SCHEMA_VERSION = 1


@dataclass
class MapKeyframe:
    """Parity: ``persistent_map.py:24-29``."""

    frame_id: int
    pose: np.ndarray  # (4, 4)
    keypoints: np.ndarray  # (N, 2) float32
    descriptors: np.ndarray  # (N, 8) uint32
    valid: np.ndarray  # (N,) bool


@dataclass
class PersistentMapSnapshot:
    """Parity: ``persistent_map.py:32-54``."""

    keyframes: List[MapKeyframe]
    vocabulary: np.ndarray  # (V, 256) float32
    histograms: np.ndarray  # (K, V)
    frame_ids: np.ndarray  # (K,)
    schema_version: int = SCHEMA_VERSION
    metadata: Dict = field(default_factory=dict)

    def digest(self) -> str:
        return stable_hash(
            {
                "schema_version": self.schema_version,
                "frame_ids": self.frame_ids,
                "vocabulary": self.vocabulary,
                "histograms": self.histograms,
                "poses": np.stack([kf.pose for kf in self.keyframes])
                if self.keyframes
                else np.zeros((0, 4, 4)),
            }
        )


def save_map_snapshot(
    snapshot: PersistentMapSnapshot, arrays_path: Path, metadata_path: Path
) -> None:
    """npz arrays + JSON metadata with digest. Parity: ``persistent_map.py:122-160``."""
    kfs = snapshot.keyframes
    np.savez(
        arrays_path,
        vocabulary=snapshot.vocabulary,
        histograms=snapshot.histograms,
        frame_ids=snapshot.frame_ids,
        poses=np.stack([kf.pose for kf in kfs]) if kfs else np.zeros((0, 4, 4)),
        keypoints=np.stack([kf.keypoints for kf in kfs]) if kfs else np.zeros((0, 0, 2), np.float32),
        descriptors=np.stack([kf.descriptors for kf in kfs]) if kfs else np.zeros((0, 0, 8), np.uint32),
        valid=np.stack([kf.valid for kf in kfs]) if kfs else np.zeros((0, 0), bool),
    )
    Path(metadata_path).write_text(
        json.dumps(
            {
                "schema_version": snapshot.schema_version,
                "num_keyframes": len(kfs),
                "vocab_size": int(snapshot.vocabulary.shape[0]),
                "digest": snapshot.digest(),
                **snapshot.metadata,
            },
            indent=2,
            sort_keys=True,
        )
    )


def load_map_snapshot(arrays_path: Path, metadata_path: Path) -> PersistentMapSnapshot:
    """Parity: ``persistent_map.py:163-194`` (schema check + digest verify)."""
    meta = json.loads(Path(metadata_path).read_text())
    version = int(meta.get("schema_version", -1))
    if version != SCHEMA_VERSION:
        raise ValueError(f"unsupported map schema version {version} (expected {SCHEMA_VERSION})")
    with np.load(arrays_path, allow_pickle=False) as data:
        kfs = [
            MapKeyframe(
                frame_id=int(data["frame_ids"][k]),
                pose=np.asarray(data["poses"][k]),
                keypoints=np.asarray(data["keypoints"][k]),
                descriptors=np.asarray(data["descriptors"][k]),
                valid=np.asarray(data["valid"][k]),
            )
            for k in range(data["poses"].shape[0])
        ]
        snapshot = PersistentMapSnapshot(
            keyframes=kfs,
            vocabulary=np.asarray(data["vocabulary"]),
            histograms=np.asarray(data["histograms"]),
            frame_ids=np.asarray(data["frame_ids"]),
            schema_version=version,
            metadata={k: v for k, v in meta.items() if k not in ("schema_version", "digest")},
        )
    expected = meta.get("digest")
    if expected and snapshot.digest() != expected:
        raise ValueError("map snapshot digest mismatch (corrupted or tampered)")
    return snapshot


class MapRelocalizer:
    """BoW → candidate keyframes → geometric verification.

    Parity: ``persistent_map.py:197-319``.
    """

    def __init__(
        self,
        snapshot: PersistentMapSnapshot,
        K: np.ndarray,
        min_inliers: int = 20,
        max_candidates: int = 5,
        ransac_threshold_px: float = 2.0,
        key=None,
        device_index: bool = False,
        mesh=None,
    ) -> None:
        self.snapshot = snapshot
        self.K = np.asarray(K, dtype=np.float64)
        self.min_inliers = min_inliers
        self.max_candidates = max_candidates
        self.ransac_threshold_px = ransac_threshold_px
        self._key = key if key is not None else jax.random.key(0)
        self._device_index = None
        if device_index and len(snapshot.keyframes):
            # Bulk-load the snapshot's histograms into HBM once; every
            # relocalize() then scores with an MXU matvec + in-program
            # top-k instead of a host matvec over the whole map.
            from mvslam_tpu.loopclosure.device_index import DeviceBoWIndex

            self._device_index = DeviceBoWIndex.from_histograms(
                snapshot.frame_ids, snapshot.histograms, mesh=mesh
            )

    def relocalize(
        self,
        keypoints: np.ndarray,
        descriptors: np.ndarray,
        valid: np.ndarray,
    ) -> Optional[Tuple[np.ndarray, np.ndarray, Dict]]:
        """Returns (keyframe_pose, relative_transform, info) or None.

        ``pose_query = keyframe_pose @ relative_transform`` re-anchors the
        pose chain (parity: ``slam_api.py:779``).
        """
        snap = self.snapshot
        if not snap.keyframes:
            return None
        hist = compute_bow_histogram(descriptors, valid, snap.vocabulary)
        if self._device_index is not None:
            if len(self._device_index) != len(snap.keyframes):
                # The snapshot was swapped/extended after construction —
                # rebuild the HBM copy rather than silently scoring stale
                # rows (and truncating to the stale length).
                from mvslam_tpu.loopclosure.device_index import DeviceBoWIndex

                self._device_index = DeviceBoWIndex.from_histograms(
                    snap.frame_ids, snap.histograms, mesh=getattr(self._device_index, "_mesh", None)
                )
            # MXU matvec over the HBM-resident map; one (F,) fetch. The
            # host branch computes the same scores on the host memory bus.
            scores = self._device_index.scores(hist)
        else:
            scores = snap.histograms @ hist
        order = sorted(
            range(len(scores)), key=lambda i: (-float(scores[i]), int(snap.frame_ids[i]))
        )[: self.max_candidates]

        Kj = jnp.asarray(self.K, jnp.float32)
        q_desc = jnp.asarray(descriptors, jnp.uint32)
        q_valid = jnp.asarray(valid)
        q_xy = jnp.asarray(keypoints, jnp.float32)
        fx = float(self.K[0, 0])

        # Relocalization is the most latency-critical host path of all (it
        # runs while tracking is LOST): when executing on the host CPU,
        # the per-candidate N x M matching uses the native popcount
        # matcher (bitwise-identical results; ~10x less matching wall per
        # candidate on the single-core measurement host).
        from mvslam_tpu.backend.bundle_adjustment import _use_host_matcher
        from mvslam_tpu.ops.hamming import match_descriptors_host

        use_host = _use_host_matcher()
        best = None
        for idx in order:
            kf = snap.keyframes[idx]
            if use_host:
                res = match_descriptors_host(
                    kf.descriptors, kf.valid, descriptors, valid,
                    MatchConfig(cross_check=True),
                )
            else:
                res = match_descriptors(
                    jnp.asarray(kf.descriptors, jnp.uint32),
                    jnp.asarray(kf.valid),
                    q_desc,
                    q_valid,
                    MatchConfig(cross_check=True),
                )
            sel = select_matches(res, max_matches=256)
            if int(sel.num_valid) < 8:
                continue
            p_kf, p_q = gather_matched_points(jnp.asarray(kf.keypoints, jnp.float32), q_xy, sel)
            n1 = normalize_pixels(p_kf, Kj)
            n2 = normalize_pixels(p_q, Kj)
            ransac = ransac_essential(
                jax.random.fold_in(self._key, int(kf.frame_id)),
                n1,
                n2,
                sel.valid,
                RansacConfig(num_hypotheses=256, min_inliers=self.min_inliers),
                threshold=self.ransac_threshold_px / fx,
            )
            num_inliers = int(ransac.num_inliers)
            if not bool(ransac.success) or num_inliers < self.min_inliers:
                continue
            entry = (num_inliers, float(scores[idx]), -int(kf.frame_id), idx, ransac, n1, n2)
            if best is None or entry[:3] > best[:3]:
                best = entry
        if best is None:
            return None
        num_inliers, score, _, idx, ransac, n1, n2 = best
        kf = snap.keyframes[idx]
        R, t, _ = decompose_essential(
            ransac.model, n1, n2, weights=ransac.inliers.astype(jnp.float32)
        )
        R = np.asarray(R, dtype=np.float64)
        t = np.asarray(t, dtype=np.float64)
        rel = np.eye(4)
        rel[:3, :3] = R.T
        rel[:3, 3] = -R.T @ t
        info = {
            "matched_keyframe": int(kf.frame_id),
            "num_inliers": num_inliers,
            "bow_score": score,
        }
        return kf.pose.copy(), rel, info
