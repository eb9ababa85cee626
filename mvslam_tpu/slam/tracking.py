"""The fused per-frame tracking step — ONE device program per frame.

This is the TPU answer to the reference's per-frame hot loop
(``slam_api.py:204-325``, SURVEY §3.1): where the reference makes four
sequential library calls per frame (ORB detect → BF match → RANSAC pose →
triangulation checks), this module fuses detection, description, matching,
dual-model RANSAC, and all gate statistics into a single jitted program.
The host submits a frame, gets back the new frame's (device-resident)
features plus a small scalar bundle — one host↔device round trip per
frame, which matters doubly when the chip sits behind a network tunnel.

Dynamic control flow (pose-chain update, keyframe policy, relocalization)
stays on the host, per the design stance of SURVEY §7.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig, FeatureSet
from mvslam_tpu.frontend.pose_estimator import (
    DevicePoseResult,
    RobustPoseEstimatorConfig,
    estimate_pose_device,
)
from mvslam_tpu.ops.brief import BriefConfig
from mvslam_tpu.ops.fast import FastConfig
from mvslam_tpu.ops.hamming import (
    MatchConfig,
    gather_matched_points,
    match_descriptors,
    select_matches,
)
from mvslam_tpu.ops.image import rgb_to_gray


_SCALAR_FIELDS = (
    "use_essential",
    "num_inliers",
    "inlier_ratio",
    "median_parallax_deg",
    "cheirality_ratio",
    "score",
    "essential_score",
    "homography_score",
    "median_displacement_px",
    "homography_share",
    "num_valid_matches",
)


def _pack_values(pose: DevicePoseResult, num_matches, num_features) -> jnp.ndarray:
    """Flatten every host-needed scalar into ONE f32 array (..., 25).

    Computed INSIDE the tracking program so the host fetch is a single
    already-materialised transfer. A pytree ``device_get`` issues one
    transfer per leaf — ~70 ms round trip each on a tunneled chip — and a
    separate packing call would enqueue behind the *next* window's
    compute; in-program packing avoids both.
    """
    parts = [pose.rotation.reshape(*pose.rotation.shape[:-2], 9), pose.translation]
    for name in _SCALAR_FIELDS:
        parts.append(getattr(pose, name).astype(jnp.float32)[..., None])
    parts.append(num_matches.astype(jnp.float32)[..., None])
    parts.append(num_features.astype(jnp.float32)[..., None])
    return jnp.concatenate([p.astype(jnp.float32) for p in parts], axis=-1)


def _pack_features(feats: FeatureSet) -> jnp.ndarray:
    """(…, N, 11) f32: [x, y, valid, desc-bits×8] — ONE fetchable buffer.

    Keyframe creation needs keypoints + descriptors + validity on host;
    fetching them as three pytree leaves costs three tunnel round trips
    per keyframe. Descriptors are bitcast (bit-preserving) into f32 lanes
    so everything travels as a single array.
    """
    desc_bits = jax.lax.bitcast_convert_type(feats.descriptors, jnp.float32)
    return jnp.concatenate(
        [feats.xy, feats.valid.astype(jnp.float32)[..., None], desc_bits], axis=-1
    )


def unpack_features(packed: np.ndarray):
    """Host-side inverse of :func:`_pack_features` → (xy, descriptors, valid)."""
    packed = np.ascontiguousarray(packed, dtype=np.float32)
    xy = packed[..., 0:2]
    valid = packed[..., 2] > 0.5
    desc = np.ascontiguousarray(packed[..., 3:11]).view(np.uint32)
    return xy, desc, valid





class TrackResult(NamedTuple):
    """Per-frame device outputs (small: one cheap transfer per frame)."""

    pose: DevicePoseResult
    matched_p1: jnp.ndarray  # (M, 2) pixel coords in prev frame
    matched_p2: jnp.ndarray  # (M, 2) pixel coords in new frame
    match_mask: jnp.ndarray  # (M,) bool
    match_distances: jnp.ndarray  # (M,)
    num_matches: jnp.ndarray  # () int32
    num_features: jnp.ndarray  # () int32 valid keypoints in new frame
    scalars_packed: jnp.ndarray  # (..., 14+len(_SCALAR_FIELDS)) f32 — see _pack_values
    features_packed: jnp.ndarray  # (..., N, 11) f32 — see _pack_features (lazy fetch)


def _configs(feature_config: FeaturePipelineConfig):
    fast = FastConfig(threshold=feature_config.fast_threshold, grid_cells=feature_config.grid_cells)
    brief = BriefConfig(blur_sigma=feature_config.blur_sigma)
    match = MatchConfig(
        ratio=feature_config.ratio,
        cross_check=feature_config.cross_check,
        use_ratio_test=feature_config.use_ratio_test,
    )
    return fast, brief, match


def _detect_describe(frame: jnp.ndarray, feature_config: FeaturePipelineConfig) -> FeatureSet:
    """Shared (optionally multi-scale) detection+description step."""
    from mvslam_tpu.ops.detect import detect_and_describe

    fast, brief, _ = _configs(feature_config)
    gray = rgb_to_gray(frame)
    score_image = (
        frame
        if frame.ndim == 2 and jnp.issubdtype(frame.dtype, jnp.integer)
        else None
    )
    xy, scores, desc, angles, valid = detect_and_describe(
        gray,
        feature_config.num_features,
        fast,
        brief,
        num_levels=feature_config.num_pyramid_levels,
        score_image=score_image,
    )
    return FeatureSet(xy, scores, desc, angles, valid)


@partial(jax.jit, static_argnames=("feature_config",))
def bootstrap_frame(frame: jnp.ndarray, feature_config: FeaturePipelineConfig) -> FeatureSet:
    """Detect+describe the first frame (no previous frame to track against)."""
    return _detect_describe(frame, feature_config)


frame_to_gray = jax.jit(rgb_to_gray)


@partial(jax.jit, static_argnames=("feature_config", "pose_config"))
def track_frame(
    key,
    prev_features: FeatureSet,
    frame: jnp.ndarray,
    K: jnp.ndarray,
    feature_config: FeaturePipelineConfig,
    pose_config: RobustPoseEstimatorConfig,
) -> Tuple[FeatureSet, TrackResult]:
    """Fused: detect+describe new frame, match vs prev, dual-model pose.

    Returns the new frame's FeatureSet (stays device-resident, feeds the
    next call) and a TrackResult of per-frame statistics.
    """
    _, _, match_cfg = _configs(feature_config)
    features = _detect_describe(frame, feature_config)
    xy, desc, valid = features.xy, features.descriptors, features.valid

    result = match_descriptors(prev_features.descriptors, prev_features.valid, desc, valid, match_cfg)
    selected = select_matches(result, max_matches=feature_config.max_matches)
    p1, p2 = gather_matched_points(prev_features.xy, xy, selected)

    pose = estimate_pose_device(key, p1, p2, selected.valid, K, pose_config)
    track = TrackResult(
        pose=pose,
        matched_p1=p1,
        matched_p2=p2,
        match_mask=selected.valid,
        match_distances=selected.distances,
        num_matches=selected.num_valid.astype(jnp.int32),
        num_features=jnp.sum(valid).astype(jnp.int32),
        scalars_packed=_pack_values(
            pose, selected.num_valid.astype(jnp.int32), jnp.sum(valid).astype(jnp.int32)
        ),
        features_packed=_pack_features(features),
    )
    return features, track


@partial(jax.jit, static_argnames=("feature_config", "pose_config"))
def track_window(
    key,
    prev_features: FeatureSet,
    frames: jnp.ndarray,  # (B, H, W) window of consecutive frames
    K: jnp.ndarray,
    feature_config: FeaturePipelineConfig,
    pose_config: RobustPoseEstimatorConfig,
    start_index: jnp.ndarray = 0,  # global frame id of frames[0] (traced)
) -> Tuple[FeatureSet, TrackResult]:
    """Fused tracking of a whole frame *window* in ONE device program.

    Detects all B frames vmapped, then tracks the B consecutive pairs
    (prev→f0, f0→f1, …, f_{B-2}→f_{B-1}) vmapped. One dispatch + one
    scalar pull per window amortises the host↔device round-trip (the
    dominant cost on a tunneled chip) by a factor of B. This is the
    throughput path behind ``SLAMSystem.run_sequence``; the single-frame
    :func:`track_frame` remains the latency path for live streaming.

    Returns (features of every frame in the window — index [-1] seeds the
    next window — and a batched TrackResult with leading dim B).
    """
    _, _, match_cfg = _configs(feature_config)

    feats = jax.vmap(lambda f: _detect_describe(f, feature_config))(frames)  # leading dim B

    # Pair i matches features of frame i-1 (or prev for i=0) to frame i.
    src = jax.tree.map(
        lambda p, f: jnp.concatenate([p[None], f[:-1]], axis=0), prev_features, feats
    )
    batch = frames.shape[0]
    # Per-pair keys fold the GLOBAL frame id, so a windowed run and a
    # frame-by-frame run of the same sequence are bit-identical.
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(start_index + jnp.arange(batch))

    def track_pair(k, f1: FeatureSet, f2: FeatureSet):
        result = match_descriptors(f1.descriptors, f1.valid, f2.descriptors, f2.valid, match_cfg)
        selected = select_matches(result, max_matches=feature_config.max_matches)
        p1, p2 = gather_matched_points(f1.xy, f2.xy, selected)
        pose = estimate_pose_device(k, p1, p2, selected.valid, K, pose_config)
        return TrackResult(
            pose=pose,
            matched_p1=p1,
            matched_p2=p2,
            match_mask=selected.valid,
            match_distances=selected.distances,
            num_matches=selected.num_valid.astype(jnp.int32),
            num_features=jnp.sum(f2.valid).astype(jnp.int32),
            scalars_packed=_pack_values(
                pose, selected.num_valid.astype(jnp.int32), jnp.sum(f2.valid).astype(jnp.int32)
            ),
            features_packed=_pack_features(f2),
        )

    track = jax.vmap(track_pair)(keys, src, feats)
    return feats, track


@partial(jax.jit, static_argnames=("feature_config", "pose_config", "window"))
def track_superwindow(
    key,
    prev_features: FeatureSet,
    frames: jnp.ndarray,  # (S*window, H, W) — S windows of consecutive frames
    K: jnp.ndarray,
    feature_config: FeaturePipelineConfig,
    pose_config: RobustPoseEstimatorConfig,
    window: int = 16,
    start_index: jnp.ndarray = 0,  # global frame id of frames[0] (traced)
) -> Tuple[FeatureSet, TrackResult]:
    """Throughput mode: ``lax.scan`` of :func:`track_window` — ONE launch
    for S·window frames.

    Per-program launch overhead (tens of ms over a tunneled chip) is the
    dominant fixed cost of the windowed path once H2D is pipelined;
    scanning S windows inside a single program amortises it S× further.
    The scan carry is the previous window's last FeatureSet, so results
    are bit-identical to S sequential :func:`track_window` calls (per-pair
    keys still fold the GLOBAL frame id).

    Returns the final frame's FeatureSet (seeds the next superwindow) and
    a TrackResult whose leaves have leading dims (S, window).
    """
    if frames.shape[0] % window != 0:
        raise ValueError("frames length must be a multiple of window")
    num_windows = frames.shape[0] // window
    chunks = frames.reshape(num_windows, window, *frames.shape[1:])
    starts = start_index + window * jnp.arange(num_windows, dtype=jnp.int32)
    return track_superwindow_chunked(
        key, prev_features, chunks, K, feature_config, pose_config, starts
    )


@partial(jax.jit, static_argnames=("feature_config", "pose_config"))
def track_superwindow_chunked(
    key,
    prev_features: FeatureSet,
    chunks: jnp.ndarray,  # (S, window, H, W) pre-chunked windows
    K: jnp.ndarray,
    feature_config: FeaturePipelineConfig,
    pose_config: RobustPoseEstimatorConfig,
    starts: jnp.ndarray,  # (S,) global frame id of each window's first frame
) -> Tuple[FeatureSet, TrackResult]:
    """The scan core of :func:`track_superwindow` over pre-chunked windows.

    Exposed separately so the meshed variant
    (``parallel.mesh.track_superwindow_meshed``) can feed chunks whose
    *window axis is sharded across a device mesh* — same jaxpr, so the
    meshed run is bit-identical to the single-chip run by construction.
    """

    def body(prev: FeatureSet, xs):
        chunk, start = xs
        feats, track = track_window(
            key, prev, chunk, K, feature_config, pose_config, start_index=start
        )
        return jax.tree.map(lambda a: a[-1], feats), track

    last, tracks = jax.lax.scan(body, prev_features, (chunks, starts))
    return last, tracks


@partial(jax.jit, static_argnames=("feature_config", "pose_config", "lk_config"))
def track_frame_flow(
    key,
    prev_gray: jnp.ndarray,  # (H, W) f32 grayscale of the previous frame
    prev_features: FeatureSet,
    frame: jnp.ndarray,
    K: jnp.ndarray,
    feature_config: FeaturePipelineConfig,
    pose_config: RobustPoseEstimatorConfig,
    lk_config=None,
) -> Tuple[jnp.ndarray, FeatureSet, TrackResult]:
    """Flow-first tracking: pose from pyramidal LK point tracks.

    The reference's offline demo estimates pose from cv2.calcOpticalFlowPyrLK
    tracks first and falls back to feature matching
    (``visual_slam_offline_entry_point.py:36-55, 484-539``); this is the
    fused TPU analog. The new frame's features are still detected in the
    same program (keyframes, loop closure, and the matching fallback need
    them), but the pose comes from flowed previous keypoints.

    Returns ``(gray, features, track)`` — ``gray`` seeds the next call's
    ``prev_gray``; ``track.num_matches`` counts valid LK tracks.
    """
    from mvslam_tpu.ops.lk import LKConfig, lk_track

    lk_config = lk_config or LKConfig()
    gray = rgb_to_gray(frame)
    features = _detect_describe(frame, feature_config)
    nxt_pts, residuals, flow_valid = lk_track(
        prev_gray, gray, prev_features.xy, prev_features.valid, lk_config
    )
    pose = estimate_pose_device(key, prev_features.xy, nxt_pts, flow_valid, K, pose_config)
    num_tracks = jnp.sum(flow_valid).astype(jnp.int32)
    track = TrackResult(
        pose=pose,
        matched_p1=prev_features.xy,
        matched_p2=nxt_pts,
        match_mask=flow_valid,
        match_distances=residuals,
        num_matches=num_tracks,
        num_features=jnp.sum(features.valid).astype(jnp.int32),
        scalars_packed=_pack_values(pose, num_tracks, jnp.sum(features.valid).astype(jnp.int32)),
        features_packed=_pack_features(features),
    )
    return gray, features, track


@partial(jax.jit, static_argnames=("feature_config", "pose_config"))
def match_and_estimate(
    key,
    prev_features: FeatureSet,
    cur_features: FeatureSet,
    K: jnp.ndarray,
    feature_config: FeaturePipelineConfig,
    pose_config: RobustPoseEstimatorConfig,
) -> TrackResult:
    """Match two pre-extracted feature sets + dual-model pose (one program).

    The control-plane async path (``SLAMSystem.run_stream_async``) computes
    features out-of-order via the feature plane, then runs this fused
    match+pose step once results are sequenced — the reference's
    ``_process_frame_with_features`` (slam_api.py:227-325) split.
    """
    _, _, match_cfg = _configs(feature_config)
    result = match_descriptors(
        prev_features.descriptors,
        prev_features.valid,
        cur_features.descriptors,
        cur_features.valid,
        match_cfg,
    )
    selected = select_matches(result, max_matches=feature_config.max_matches)
    p1, p2 = gather_matched_points(prev_features.xy, cur_features.xy, selected)
    pose = estimate_pose_device(key, p1, p2, selected.valid, K, pose_config)
    return TrackResult(
        pose=pose,
        matched_p1=p1,
        matched_p2=p2,
        match_mask=selected.valid,
        match_distances=selected.distances,
        num_matches=selected.num_valid.astype(jnp.int32),
        num_features=jnp.sum(cur_features.valid).astype(jnp.int32),
        scalars_packed=_pack_values(
            pose,
            selected.num_valid.astype(jnp.int32),
            jnp.sum(cur_features.valid).astype(jnp.int32),
        ),
        features_packed=_pack_features(cur_features),
    )


def feature_set_from_arrays(xy, descriptors, valid) -> FeatureSet:
    """Wrap host arrays (e.g. a FeatureResult) as a FeatureSet pytree."""
    import numpy as np

    n = len(valid)
    return FeatureSet(
        xy=jnp.asarray(xy, jnp.float32),
        scores=jnp.zeros((n,), jnp.float32),
        descriptors=jnp.asarray(descriptors, jnp.uint32),
        angles=jnp.zeros((n,), jnp.float32),
        valid=jnp.asarray(valid),
    )




_FEATURE_FETCH_CACHE: "OrderedDict" = __import__("collections").OrderedDict()
_FEATURE_FETCH_CACHE_CAP = 8


def pull_features(track: TrackResult):
    """Numpy (xy, descriptors, valid) of the tracked frame(s).

    ONE lazy fetch per TrackResult (LRU keyed by buffer id): only windows
    that actually create keyframes / relocalize pay the ~35 ms/MB feature
    transfer; the per-window scalar pull stays ~1.5 KB.
    """
    key = id(track.features_packed)
    entry = _FEATURE_FETCH_CACHE.get(key)
    # The entry pins the source buffer: without that reference, a GC'd
    # array's id could be reused by a NEW buffer and hit stale features.
    # The identity check makes id reuse harmless even across eviction.
    if entry is None or entry[0] is not track.features_packed:
        entry = (track.features_packed, unpack_features(np.asarray(track.features_packed)))
        _FEATURE_FETCH_CACHE[key] = entry
        while len(_FEATURE_FETCH_CACHE) > _FEATURE_FETCH_CACHE_CAP:
            _FEATURE_FETCH_CACHE.popitem(last=False)  # evict LRU, keep the rest
    else:
        _FEATURE_FETCH_CACHE.move_to_end(key)
    return entry[1]


def pull_scalars(track: TrackResult) -> dict:
    """One tiny host transfer: every scalar the host control flow needs.

    Works for both single-frame (fields shaped ()) and windowed (fields
    shaped (B,)) results; returned dict values mirror those shapes.
    """
    packed = np.asarray(track.scalars_packed)  # (..., 14 + len(_SCALAR_FIELDS))
    rotation = packed[..., :9].reshape(*packed.shape[:-1], 3, 3)
    translation = packed[..., 9:12]
    out = {"rotation": rotation, "translation": translation}
    for k, name in enumerate(_SCALAR_FIELDS):
        out[name] = packed[..., 12 + k]
    # Counts sit AFTER the pose fields — derive, never hard-code (a stale
    # literal here once silently aliased num_features to the match count,
    # disabling the keyframe match-ratio trigger).
    counts_at = 12 + len(_SCALAR_FIELDS)
    out["num_matches"] = packed[..., counts_at]
    out["num_features"] = packed[..., counts_at + 1]
    out["use_essential"] = out["use_essential"] > 0.5
    return out
