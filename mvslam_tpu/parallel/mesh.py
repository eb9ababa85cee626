"""Multi-chip scaling: mesh construction + sharded tracking/RANSAC.

The reference's parallelism is intra-process thread/process pools
(SURVEY §2.5); the TPU-native equivalents are:

- **Data parallelism over frames** — the offline/batch analog of the
  reference's thread-pool feature extraction
  (``feature_control_plane.py:283-319``): a window of frame *pairs* is
  sharded across the mesh's ``data`` axis and each chip runs the fused
  tracking step on its shard. No collectives needed (embarrassingly
  parallel); XLA partitions automatically from input shardings.

- **Hypothesis parallelism for RANSAC** — the latency-scaling axis for a
  single stream: the K hypothesis batch is sharded across chips via
  ``shard_map``, each chip scores its hypotheses against the (replicated)
  correspondences, and the global argmax travels over ICI as one
  ``all_gather`` of (count, model) pairs — bytes, not megabytes.

Both paths compile and run on an N-virtual-device CPU mesh for testing
(``tests/conftest.py``) and are exercised by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig, FeatureSet
from mvslam_tpu.frontend.pose_estimator import (
    DevicePoseResult,
    RobustPoseEstimatorConfig,
    estimate_pose_device,
)
from mvslam_tpu.geometry.epipolar import eight_point_essential, sampson_error
from mvslam_tpu.ops.ransac import RansacConfig, RansacResult, _sample_indices
from mvslam_tpu.slam.tracking import TrackResult, track_frame, bootstrap_frame


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batched_track_pairs(
    mesh: Mesh,
    frames_prev: jnp.ndarray,
    frames_next: jnp.ndarray,
    K: jnp.ndarray,
    feature_config: FeaturePipelineConfig,
    pose_config: RobustPoseEstimatorConfig,
    seed: int = 0,
) -> Tuple[FeatureSet, TrackResult]:
    """Track B frame pairs data-parallel over the mesh.

    frames_prev/frames_next: (B, H, W); B must be divisible by the mesh
    size. Returns batched FeatureSet + TrackResult (sharded outputs).
    """
    axis = mesh.axis_names[0]
    data_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def pair_step(key, prev_frame, next_frame):
        prev_feats = bootstrap_frame(prev_frame, feature_config)
        return track_frame(key, prev_feats, next_frame, K, feature_config, pose_config)

    batch = frames_prev.shape[0]
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(seed), i))(jnp.arange(batch))

    fn = jax.jit(
        jax.vmap(pair_step),
        in_shardings=(data_sharding, data_sharding, data_sharding),
        out_shardings=(data_sharding, data_sharding),
    )
    frames_prev = jax.device_put(frames_prev, data_sharding)
    frames_next = jax.device_put(frames_next, data_sharding)
    return fn(keys, frames_prev, frames_next)


def sharded_ransac_essential(
    mesh: Mesh,
    key,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
    config: RansacConfig = RansacConfig(threshold=2e-3),
) -> RansacResult:
    """Essential-matrix RANSAC with the hypothesis batch sharded over ICI.

    Each device draws and scores ``K / n_devices`` hypotheses against the
    replicated correspondences; the best-per-device (count, model) pairs
    are all-gathered (tiny) and the global winner is refit on all devices
    redundantly (cheaper than a broadcast round-trip).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.size
    if config.num_hypotheses % n_dev:
        raise ValueError(f"num_hypotheses ({config.num_hypotheses}) must divide by mesh size {n_dev}")
    per_dev = config.num_hypotheses // n_dev
    thresh_sq = jnp.asarray(config.threshold**2, dtype=pts1.dtype)

    def shard_fn(keys, p1, p2, m):
        # keys: (1,) per-device key; p1/p2/m replicated.
        my_key = keys[0]
        idx = _sample_indices(my_key, m[0], per_dev, 8)
        models = eight_point_essential(p1[0][idx], p2[0][idx])
        err = sampson_error(models, p1, p2)  # (per_dev, N)
        inl = (err < thresh_sq) & m
        counts = jnp.sum(inl, axis=1)
        best = jnp.argmax(counts)
        # Tiny all_gather: (n_dev,) counts + (n_dev, 3, 3) models over ICI.
        all_counts = jax.lax.all_gather(counts[best], axis)
        all_models = jax.lax.all_gather(models[best], axis)
        winner = jnp.argmax(all_counts)
        model = all_models[winner]
        # Redundant per-device refit of the winner (deterministic, no bcast).
        inliers = (sampson_error(model[None], p1, p2)[0] < thresh_sq) & m[0]
        for _ in range(config.refit_rounds):
            w = inliers.astype(p1.dtype)
            enough = jnp.sum(w) >= 8
            refit = eight_point_essential(p1[0], p2[0], w)
            model = jnp.where(enough, refit, model)
            inliers = (sampson_error(model[None], p1, p2)[0] < thresh_sq) & m[0]
        count = jnp.sum(inliers)
        num_valid = jnp.sum(m[0])
        ratio = count / jnp.maximum(num_valid, 1)
        success = (count >= config.min_inliers) & (num_valid >= 8)
        return RansacResult(
            model[None],
            inliers[None],
            count.astype(jnp.int32)[None],
            ratio.astype(jnp.float32)[None],
            success[None],
        )

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    keys = jax.random.split(key, n_dev)
    kwargs = dict(
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=RansacResult(P(axis), P(axis), P(axis), P(axis), P(axis)),
    )
    try:
        # The linear-algebra internals (eigh/svd while-loops) confuse the
        # varying-manual-axes checker; disable it (new and old kwarg names).
        fn = shard_map(shard_fn, check_vma=False, **kwargs)
    except TypeError:
        fn = shard_map(shard_fn, check_rep=False, **kwargs)
    # Replicated inputs carry a leading singleton "replica view" dim inside
    # shard_map when specs are P() — pass 2-D views.
    res = fn(keys, pts1[None], pts2[None], mask[None])
    # All shards computed identical results; take shard 0.
    return RansacResult(
        res.model[0], res.inliers[0], res.num_inliers[0], res.inlier_ratio[0], res.success[0]
    )
