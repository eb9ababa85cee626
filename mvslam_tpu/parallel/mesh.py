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

import dataclasses
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig, FeatureSet
from mvslam_tpu.frontend.pose_estimator import (
    DevicePoseResult,
    RobustPoseEstimatorConfig,
    estimate_pose_device,
)
from mvslam_tpu.ops.ransac import RansacConfig, RansacResult, ransac_essential
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
    # Meshed runs pin the RANSAC reduction order so results are identical
    # at any per-device batch shape (RansacConfig.mesh_invariant).
    pose_config = dataclasses.replace(pose_config, mesh_invariant=True)

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
    """Essential-matrix RANSAC with hypothesis solve+scoring sharded over ICI.

    **Mesh-invariant determinism**: the K-hypothesis set is drawn from the
    single global ``key`` exactly as in the unsharded
    :func:`~mvslam_tpu.ops.ransac.ransac_essential`, then *only the
    per-hypothesis solve and K×N scoring* (the dominant cost) is sharded
    via sharding constraints on the hypothesis axis — the SPMD partitioner
    gives each chip a hypothesis slice against replicated correspondences
    and combines the winner argmax over ICI. Because the meshed call runs
    the SAME jaxpr as the single-device path (only input shardings differ),
    the returned model/inliers are **bit-identical on any mesh size** —
    asserted by ``tests/test_parallel.py``.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.size
    if config.num_hypotheses % n_dev:
        raise ValueError(f"num_hypotheses ({config.num_hypotheses}) must divide by mesh size {n_dev}")
    # Pin the reduction order: bit-equality across mesh sizes is this
    # wrapper's contract (callers comparing against an unsharded run must
    # set mesh_invariant=True on that run's config too).
    config = dataclasses.replace(config, mesh_invariant=True)
    hyp_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    pts1 = jax.device_put(pts1, replicated)
    pts2 = jax.device_put(pts2, replicated)
    mask = jax.device_put(mask, replicated)
    key = jax.device_put(key, replicated)
    return ransac_essential(key, pts1, pts2, mask, config, hypothesis_sharding=hyp_sharding)


def track_superwindow_meshed(
    mesh: Mesh,
    key,
    prev_features: FeatureSet,
    frames: jnp.ndarray,  # (S*window, H, W)
    K: jnp.ndarray,
    feature_config: FeaturePipelineConfig,
    pose_config: RobustPoseEstimatorConfig,
    window: int = 16,
    start_index=0,
):
    """The throughput path (``track_superwindow``) data-parallel over a mesh.

    Each window's frame axis is sharded across the mesh: every chip detects
    features for its contiguous slice of the window, and the one-frame pair
    shift (``concat([prev, feats[:-1]])`` inside ``track_window``) becomes
    the carry handoff — XLA lowers it to a boundary collective-permute over
    ICI (one FeatureSet, ~100 KB, per chip per window). The scan carry
    (last frame's features) reshards automatically between windows.

    Determinism contract: runs the SAME jaxpr as the single-chip
    superwindow (``slam.tracking.track_superwindow_chunked``) — per-pair
    RNG keys fold global frame ids, not device ids, so the hypothesis sets
    and all matching outputs (detection, Hamming matches, inlier sets) are
    bit-identical to the 1-chip run on any mesh size. Pose *values* match
    to float tolerance rather than bit-for-bit: the per-device pair batch
    is B/n, and XLA legally reassociates the weighted-refit accumulation
    (AᵀA over match rows) at different batch shapes. For a FIXED mesh the
    run is bit-reproducible. Parity note: this replaces the reference's
    thread/process-pool data parallelism (``feature_control_plane.py:283-319``)
    with frames-DP over ICI (SURVEY §2.5 mapping).
    """
    from mvslam_tpu.slam.tracking import track_superwindow_chunked

    axis = mesh.axis_names[0]
    if window % mesh.size:
        raise ValueError(f"window ({window}) must divide by mesh size {mesh.size}")
    # Pin the RANSAC reduction order (see sharded_ransac_essential) — the
    # per-device pair batch is window/mesh.size, and dot contractions may
    # legally reassociate at different batch shapes. An unsharded reference
    # run must set pose_config.mesh_invariant=True to compare bit-for-bit.
    pose_config = dataclasses.replace(pose_config, mesh_invariant=True)
    if frames.shape[0] % window:
        raise ValueError("frames length must be a multiple of window")
    num_windows = frames.shape[0] // window
    chunks = jnp.reshape(frames, (num_windows, window, *frames.shape[1:]))
    # Shard the WINDOW axis (dim 1); the scan runs over dim 0.
    chunks = jax.device_put(chunks, NamedSharding(mesh, P(None, axis)))
    replicated = NamedSharding(mesh, P())
    prev_features = jax.device_put(prev_features, replicated)
    K = jax.device_put(K, replicated)
    starts = jnp.asarray(start_index, jnp.int32) + window * jnp.arange(
        num_windows, dtype=jnp.int32
    )
    return track_superwindow_chunked(
        key, prev_features, chunks, K, feature_config, pose_config, starts
    )


def run_bundle_adjustment_sharded(
    mesh: Mesh,
    poses,
    points,
    observations,
    K,
    config=None,
    max_observations: Optional[int] = None,
):
    """Windowed BA with the observation axis sharded over ICI.

    The hot part of each Schur-GN iteration — the vmapped ``jacfwd``
    linearization of every reprojection residual and the ``segment_sum``
    assembly of the block Hessians B/C/E and gradients
    (``backend.bundle_adjustment._ba_core``) — is data-parallel over
    observations: each chip linearizes its observation shard and the
    scatter-accumulations become ``psum``s over ICI inserted by the SPMD
    partitioner. The Schur-reduced 6W×6W pose solve and 3×3 point
    back-substitutions run replicated (tiny). Same jaxpr as the
    single-device :func:`~mvslam_tpu.backend.bundle_adjustment.run_bundle_adjustment`
    (only input shardings differ), so results match to float tolerance
    (cross-chip accumulation may reorder sums) and are run-to-run
    deterministic for a fixed mesh. Ref contract: ``bundle_adjustment.py:83-170``.

    Any observation count engages the sharded path: the padded budget is
    rounded up to a mesh multiple here (padding rows are masked out, so
    they contribute exactly zero to the normal equations).
    """
    from mvslam_tpu.backend.bundle_adjustment import run_bundle_adjustment

    axis = mesh.axis_names[0]
    n_dev = mesh.size
    if max_observations is None:
        O = len(observations)
        max_observations = max(64, 1 << max(O - 1, 1).bit_length())
    if max_observations % n_dev:
        rounded = max_observations + (n_dev - max_observations % n_dev)
        logger.info(
            "rounding BA observation budget to a mesh multiple",
            extra={"requested": max_observations, "rounded": rounded, "mesh": n_dev},
        )
        max_observations = rounded
    return run_bundle_adjustment(
        poses,
        points,
        observations,
        K,
        config,
        max_observations=max_observations,
        observation_sharding=NamedSharding(mesh, P(axis)),
    )


def solve_problem_sharded(mesh: Mesh, problem, config=None):
    """Pose-graph Gauss-Newton with the factor (edge) axis sharded over ICI.

    The hot part of each GN iteration — linearizing every factor (vmapped
    autodiff Jacobians) and accumulating the normal equations — is
    data-parallel over factors: each chip linearizes its edge shard and the
    ``segment_sum``/scatter accumulation of JᵀJ and Jᵀr becomes a ``psum``
    over ICI inserted by the SPMD partitioner. The (small) n·d × n·d solve
    runs replicated. Same jaxpr as the single-device
    ``backend.solvers.solve_problem`` (ref contract:
    ``graph_optimization.py:560-654``); only input shardings differ.

    Note: cross-chip float accumulation may reorder sums, so results match
    the single-chip solve to float tolerance (asserted in tests), and are
    run-to-run deterministic for a fixed mesh.
    """
    from mvslam_tpu.backend.solvers import SolverConfig, solve_problem

    config = config or SolverConfig()
    n_dev = mesh.size
    if problem.num_factors == 0:
        return solve_problem(problem, config)
    n_pad = (-problem.num_factors) % n_dev
    if n_pad:
        # Pad with zero-weight identity self-edges on node 0: residuals
        # and Jacobians carry the ×0 weight, so the padded factors add
        # exactly-zero blocks to the normal equations (node ids are
        # explicit in the edge list — no segment-id shift). This lets a
        # chain+loop graph (N edges, power-of-two mesh) take the sharded
        # path instead of silently falling back to replicated.
        d = problem.measurements.shape[1]
        dt = problem.measurements.dtype
        problem = problem._replace(
            edges=jnp.concatenate(
                [jnp.asarray(problem.edges, jnp.int32), jnp.zeros((n_pad, 2), jnp.int32)]
            ),
            measurements=jnp.concatenate(
                [jnp.asarray(problem.measurements, dt), jnp.zeros((n_pad, d), dt)]
            ),
            weights=jnp.concatenate(
                [
                    jnp.asarray(problem.weights),
                    jnp.zeros((n_pad,), jnp.asarray(problem.weights).dtype),
                ]
            ),
        )
        logger.info(
            "padded pose-graph factors to a mesh multiple",
            extra={"factors": problem.num_factors - n_pad, "padded_to": problem.num_factors},
        )
    axis = mesh.axis_names[0]
    edge_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    sharded_problem = problem._replace(
        edges=jax.device_put(problem.edges, edge_sharding),
        measurements=jax.device_put(problem.measurements, edge_sharding),
        weights=jax.device_put(problem.weights, edge_sharding),
        x0=jax.device_put(jnp.asarray(problem.x0), replicated),
        anchor_mask=jax.device_put(jnp.asarray(problem.anchor_mask), replicated),
    )
    return solve_problem(sharded_problem, config)
