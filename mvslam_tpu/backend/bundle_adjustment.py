"""Sliding-window bundle adjustment with a Schur-complement Gauss-Newton.

Parity: reference ``bundle_adjustment.py`` — fixed window of poses (first
pose anchored), 3D points, per-observation reprojection residuals with a
Huber loss, a conditioning gate that falls back to the prior state when
the reduced system is ill-conditioned (ref L135-158), and
``triangulate_points`` (ref L69-80, via the batched DLT instead of cv2).

TPU-first redesign: where the reference builds a dense parameter vector
and lets SciPy's LM difference it (ref L118-134), this solver exploits the
BA structure explicitly — H = [[B, E], [Eᵀ, C]] with B block-diagonal over
poses, C block-diagonal 3x3 over points — and solves the **Schur-reduced
pose system** S = B − E C⁻¹ Eᵀ (tiny: 6W×6W for a window of W) followed by
point back-substitution. All per-observation Jacobians come from one
vmapped ``jacfwd``; assembly is ``segment_sum``. Observations are padded
to a static budget with a validity mask, so window updates never recompile.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.geometry.lie import se3_matrix, so3_exp, so3_log

# ---------------------------------------------------------------------------
# Public data types (parity: bundle_adjustment.py:16-45)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Observation:
    """One 2D observation of a 3D point from a windowed pose."""

    pose_index: int
    point_index: int
    uv: np.ndarray  # (2,)


@dataclass(frozen=True)
class BundleAdjustmentConfig:
    max_iterations: int = 10
    damping: float = 1e-4
    huber_delta_px: float = 2.0
    max_condition_number: float = 1e8
    min_singular_value: float = 1e-12
    fix_first_pose: bool = True
    fix_second_translation: bool = True  # monocular gauge (scale) fixing
    # Soft prior anchoring each pose to its initial value (px-equivalent
    # residual per unit of parameter change). Monocular window BA has
    # weakly-observable scale/depth modes: with noisy tracks a reprojection-
    # only solve can LOWER cost while dragging poses several baselines —
    # the prior turns BA into a refinement of the tracking chain instead
    # of an unanchored re-solve (the reference reaches the same end via
    # its Jacobian-conditioning fallback, ``bundle_adjustment.py:135-158``).
    # (w=10 calibrated on rendered arcs at noise σ∈{5,10}: w=4 under-
    # anchors, w≥30 over-damps the useful correction.)
    pose_prior_weight: float = 10.0


@dataclass
class BundleAdjustmentDiagnostics:
    initial_cost: float
    final_cost: float
    iterations: int
    converged: bool
    conditioning_tripped: bool
    condition_number: float


class BAResult(NamedTuple):
    poses: np.ndarray  # (W, 4, 4)
    points: np.ndarray  # (P, 3)
    diagnostics: BundleAdjustmentDiagnostics


# ---------------------------------------------------------------------------
# Jitted Schur-complement GN core
# ---------------------------------------------------------------------------


def _pose_params(T: jnp.ndarray) -> jnp.ndarray:
    """(W,4,4) world-from-camera → (W,6) [t, rvec] of camera-from-world."""
    R = jnp.swapaxes(T[..., :3, :3], -1, -2)
    t = -(R @ T[..., :3, 3][..., None])[..., 0]
    return jnp.concatenate([t, so3_log(R)], axis=-1)


def _params_to_pose(p: jnp.ndarray) -> jnp.ndarray:
    """(W,6) camera-from-world params → (W,4,4) world-from-camera."""
    R_cw = so3_exp(p[..., 3:6])
    t_cw = p[..., :3]
    R_wc = jnp.swapaxes(R_cw, -1, -2)
    t_wc = -(R_wc @ t_cw[..., None])[..., 0]
    return se3_matrix(R_wc, t_wc)


def _project(pose_param: jnp.ndarray, point: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Project a world point through camera-from-world params [t, rvec]."""
    R = so3_exp(pose_param[3:6])
    cam = R @ point + pose_param[:3]
    z = jnp.where(jnp.abs(cam[2]) < 1e-6, 1e-6, cam[2])
    u = K[0, 0] * cam[0] / z + K[0, 2]
    v = K[1, 1] * cam[1] / z + K[1, 2]
    return jnp.stack([u, v])


@partial(jax.jit, static_argnames=("config", "num_poses"))
def _ba_core_packed(
    pose_params0: jnp.ndarray,
    points0: jnp.ndarray,
    obs_pose: jnp.ndarray,
    obs_point: jnp.ndarray,
    obs_uv: jnp.ndarray,
    obs_mask: jnp.ndarray,
    K: jnp.ndarray,
    config: "BundleAdjustmentConfig",
    num_poses: int,
) -> jnp.ndarray:
    """:func:`_ba_core` with everything the host needs in ONE flat buffer.

    ``run_bundle_adjustment`` used to pull four device scalars
    (init/final cost, eig min/max) and two arrays (poses via an eager
    ``_params_to_pose`` dispatch, points) — six-plus device→host round
    trips per window-BA call, ~0.8 s per keyframe on a network-tunneled
    chip and the dominant full-system cost (every frame is a keyframe on
    the committed scenes). Layout: ``[init, final, eig_min, eig_max,
    poses(W·16), points(P·3)]`` — one launch, one fetch.
    """
    pp, pts, init_cost, final_cost, _costs, eig_min, eig_max = _ba_core(
        pose_params0, points0, obs_pose, obs_point, obs_uv, obs_mask, K, config, num_poses
    )
    poses = _params_to_pose(pp)
    head = jnp.stack([init_cost, final_cost, eig_min, eig_max]).astype(jnp.float32)
    return jnp.concatenate([head, poses.reshape(-1), pts.reshape(-1)])


@partial(jax.jit, static_argnames=("config", "num_poses"))
def _ba_core(
    pose_params0: jnp.ndarray,  # (W, 6)
    points0: jnp.ndarray,  # (P, 3)
    obs_pose: jnp.ndarray,  # (O,) int32
    obs_point: jnp.ndarray,  # (O,) int32
    obs_uv: jnp.ndarray,  # (O, 2)
    obs_mask: jnp.ndarray,  # (O,) bool
    K: jnp.ndarray,
    config: BundleAdjustmentConfig,
    num_poses: int,
):
    W = num_poses
    P = points0.shape[0]
    delta = jnp.asarray(config.huber_delta_px, pose_params0.dtype)

    free_np = np.ones((W, 6), bool)
    if config.fix_first_pose:
        free_np[0] = False
    if config.fix_second_translation and W > 1:
        free_np[1, :3] = False
    # Static index set of free pose coordinates (config and W are static
    # argnames) — lets the conditioning check eig-decompose exactly the
    # free sub-block of the Schur system instead of a padded projection.
    free_idx = np.where(free_np.reshape(-1))[0]
    pose_free = jnp.asarray(free_np, pose_params0.dtype)

    def residuals(pp, pts):
        pred = jax.vmap(lambda w, x: _project(pp[w], pts[x], K))(obs_pose, obs_point)
        r = pred - obs_uv
        return jnp.where(obs_mask[:, None], r, 0.0)

    prior_w2 = jnp.asarray(config.pose_prior_weight**2, pose_params0.dtype)

    def cost_of(pp, pts):
        r = residuals(pp, pts)
        s = jnp.sum(r * r, axis=-1)
        # Huber on squared pixel error.
        d2 = delta * delta
        rho = jnp.where(s <= d2, s, 2.0 * delta * jnp.sqrt(jnp.maximum(s, d2)) - d2)
        data = 0.5 * jnp.sum(jnp.where(obs_mask, rho, 0.0))
        prior = 0.5 * prior_w2 * jnp.sum(pose_free * (pp - pose_params0) ** 2)
        return data + prior

    def lin_single(pp, pts, w, x, uv, m):
        def res_fn(pose_p, point):
            pred = _project(pose_p, point, K)
            return (pred - uv) * m

        r = res_fn(pp[w], pts[x])
        Jp = jax.jacfwd(res_fn, argnums=0)(pp[w], pts[x])  # (2, 6)
        Jx = jax.jacfwd(res_fn, argnums=1)(pp[w], pts[x])  # (2, 3)
        return r, Jp, Jx

    def gn_step(carry, _):
        pp, pts, lam, old_cost = carry
        mf = obs_mask.astype(pp.dtype)
        r, Jp, Jx = jax.vmap(lambda w, x, uv, m: lin_single(pp, pts, w, x, uv, m))(
            obs_pose, obs_point, obs_uv, mf
        )
        s = jnp.sum(r * r, axis=-1)
        d2 = delta * delta
        w_irls = jnp.where(s <= d2, 1.0, delta / jnp.sqrt(jnp.maximum(s, d2)))
        w_irls = w_irls * mf

        Jp_w = Jp * w_irls[:, None, None]
        Jx_w = Jx * w_irls[:, None, None]
        # Block-diagonal pose Hessian B (W, 6, 6) and point Hessian C (P, 3, 3).
        B = jax.ops.segment_sum(jnp.einsum("ori,orj->oij", Jp, Jp_w), obs_pose, num_segments=W)
        C = jax.ops.segment_sum(jnp.einsum("ori,orj->oij", Jx, Jx_w), obs_point, num_segments=P)
        # Cross blocks E: accumulate per (pose, point) pair into dense (W, P, 6, 3).
        Eo = jnp.einsum("ori,orj->oij", Jp, Jx_w)  # (O, 6, 3)
        pair_idx = obs_pose * P + obs_point
        E = jax.ops.segment_sum(Eo, pair_idx, num_segments=W * P).reshape(W, P, 6, 3)
        # Gradients.
        gp = jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jp_w, r), obs_pose, num_segments=W)
        gx = jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jx_w, r), obs_point, num_segments=P)

        # Pose-anchor prior: residual w·(pp − pp0) adds w²·diag(pose_free)
        # to B and w²·pose_free·(pp − pp0) to the gradient — masked by
        # pose_free so gradient/Hessian match the masked cost by
        # construction (fixed rows were previously only saved by the gauge
        # projection below overwriting them).
        B = B + prior_w2 * (pose_free[:, :, None] * jnp.eye(6, dtype=pp.dtype))
        gp = gp + prior_w2 * pose_free * (pp - pose_params0)

        B = B + lam * jnp.eye(6, dtype=pp.dtype)
        C = C + lam * jnp.eye(3, dtype=pp.dtype)
        C_inv = jnp.linalg.inv(C)  # (P, 3, 3)

        # Schur complement S = B − E C⁻¹ Eᵀ  (block form → dense 6W x 6W).
        ECi = jnp.einsum("wpij,pjk->wpik", E, C_inv)  # (W, P, 6, 3)
        S_blocks = jnp.einsum("wpik,vpjk->wvij", ECi, E)  # (W, W, 6, 6)
        S = jnp.zeros((W, W, 6, 6), pp.dtype).at[jnp.arange(W), jnp.arange(W)].set(B) - S_blocks
        rhs = -(gp - jnp.einsum("wpik,pk->wi", ECi, gx))  # (W, 6)

        # Gauge fixing: project out fixed pose coordinates.
        free = pose_free.reshape(-1)
        S_dense = S.transpose(0, 2, 1, 3).reshape(W * 6, W * 6)
        S_dense = S_dense * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        rhs_flat = rhs.reshape(-1) * free
        # Conditioning of the DATA term's reduced normal matrix (parity:
        # the reference's SVD-based _conditioning_stats, ref L135-158,
        # L173-184): on the free coordinates both the prior and the
        # damping add an exact multiple of identity, so the raw spectrum
        # is the computed spectrum shifted by −(w² + λ). eigvalsh of the
        # 6W×6W free block is nearly free next to the O-sized assembly.
        eigs = jnp.linalg.eigvalsh(S_dense[free_idx][:, free_idx])
        shift = prior_w2 + lam
        eig_min = eigs[0] - shift
        eig_max = eigs[-1] - shift
        dp = jax.scipy.linalg.solve(S_dense, rhs_flat, assume_a="pos").reshape(W, 6)
        dp = dp * pose_free
        # Back-substitute points: dx = C⁻¹ (−gx − Eᵀ dp).
        Etdp = jnp.einsum("wpij,wi->pj", E, dp)  # (P, 3)
        dx = jnp.einsum("pij,pj->pi", C_inv, -gx - Etdp)

        pp_new = pp + dp
        pts_new = pts + dx
        # The current state's cost rides in the carry (it is the previous
        # iteration's accepted cost) — only the CANDIDATE costs a fresh
        # residual pass.
        new_cost = cost_of(pp_new, pts_new)
        improved = new_cost < old_cost
        # Levenberg-Marquardt trust-region schedule: accept + relax damping
        # on improvement, reject + stiffen on failure (the rejected
        # iteration re-linearizes at the same point with 10x damping —
        # a plain GN latch would park the solve on its first bad step).
        pp_next = jnp.where(improved, pp_new, pp)
        pts_next = jnp.where(improved, pts_new, pts)
        lam_next = jnp.where(
            improved,
            jnp.maximum(lam * 0.3, config.damping),
            jnp.minimum(lam * 10.0, 1e6),
        )
        cost_next = jnp.where(improved, new_cost, old_cost)
        return (pp_next, pts_next, lam_next, cost_next), (old_cost, eig_min, eig_max)

    init_cost = cost_of(pose_params0, points0)
    (pp, pts, _, final_cost), (costs, eig_mins, eig_maxs) = jax.lax.scan(
        gn_step,
        (pose_params0, points0, jnp.asarray(config.damping, pose_params0.dtype), init_cost),
        None,
        length=config.max_iterations,
    )
    # Conditioning is gated on the INITIAL linearization (parity with the
    # reference, which checks before accepting the solve).
    return pp, pts, init_cost, final_cost, costs, eig_mins[0], eig_maxs[0]


def run_bundle_adjustment(
    poses: np.ndarray,  # (W, 4, 4) world-from-camera
    points: np.ndarray,  # (P, 3)
    observations: List[Observation],
    K: np.ndarray,
    config: Optional[BundleAdjustmentConfig] = None,
    max_observations: Optional[int] = None,
    observation_sharding=None,
) -> BAResult:
    """Refine window poses + points. Parity: ``bundle_adjustment.py:83-170``.

    ``observation_sharding``: optional ``NamedSharding`` over a 1-D mesh
    axis. When given, the padded observation arrays are placed with it and
    everything else replicated, so the SPMD partitioner shards the vmapped
    per-observation linearization (the dominant cost) across chips and
    accumulates the normal equations (``segment_sum`` → ``psum``) over ICI.
    Same jaxpr as the unsharded solve — see
    :func:`mvslam_tpu.parallel.mesh.run_bundle_adjustment_sharded`.
    """
    config = config or BundleAdjustmentConfig()
    W = poses.shape[0]
    P = points.shape[0]
    O = len(observations)
    if O == 0 or P == 0 or W < 2:
        diag = BundleAdjustmentDiagnostics(0.0, 0.0, 0, True, False, 1.0)
        return BAResult(np.asarray(poses), np.asarray(points), diag)

    budget = max_observations or max(64, 1 << (O - 1).bit_length())
    obs_pose = np.zeros(budget, np.int32)
    obs_point = np.zeros(budget, np.int32)
    obs_uv = np.zeros((budget, 2), np.float32)
    obs_mask = np.zeros(budget, bool)
    for k, obs in enumerate(observations[:budget]):
        obs_pose[k] = obs.pose_index
        obs_point[k] = obs.point_index
        obs_uv[k] = obs.uv
        obs_mask[k] = True

    # Pad points to a power-of-two budget so _ba_core never recompiles on
    # the (data-dependent) track count. Padded points carry no
    # observations: their gradient is exactly zero and the Levenberg
    # damping keeps their C blocks invertible, so they stay put.
    pbudget = max(64, 1 << (P - 1).bit_length())
    points_padded = np.zeros((pbudget, 3), np.float32)
    points_padded[:P] = points

    if observation_sharding is not None:
        n_shards = observation_sharding.mesh.size
        if budget % n_shards:
            raise ValueError(
                f"observation budget ({budget}) must divide by mesh size {n_shards}"
            )
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = NamedSharding(observation_sharding.mesh, PartitionSpec())
        put_obs = lambda a: jax.device_put(a, observation_sharding)  # noqa: E731
        put_rep = lambda a: jax.device_put(a, replicated)  # noqa: E731
    else:
        put_obs = put_rep = jnp.asarray

    pose_params0 = put_rep(np.asarray(_pose_params(jnp.asarray(poses, jnp.float32))))
    packed = np.asarray(
        _ba_core_packed(
            pose_params0,
            put_rep(points_padded),
            put_obs(obs_pose),
            put_obs(obs_point),
            put_obs(obs_uv),
            put_obs(obs_mask),
            put_rep(np.asarray(K, np.float32)),
            config,
            W,
        )
    )  # ONE device→host fetch for scalars + poses + points
    init_cost, final_cost, eig_min, eig_max = (float(x) for x in packed[:4])
    refined_poses = packed[4 : 4 + W * 16].reshape(W, 4, 4).astype(np.float64)
    refined_points = packed[4 + W * 16 :].reshape(pbudget, 3).astype(np.float64)[:P]
    # Condition number of the data term's Schur-reduced pose system at the
    # initial linearization (parity: bundle_adjustment.py:135-158 computes
    # SVD conditioning stats and falls back when ill-conditioned).
    cond = eig_max / max(eig_min, 1e-30) if eig_max > 0 else np.inf

    # Conditioning gate: reject the solve when the reduced system is
    # ill-conditioned, the solve failed to reduce cost, or produced
    # non-finite state.
    tripped = False
    if cond > config.max_condition_number or eig_min < config.min_singular_value:
        tripped = True
    elif not np.isfinite(refined_poses).all() or not np.isfinite(refined_points).all():
        tripped = True
    elif final_cost > init_cost * 1.001 + 1e-9:
        tripped = True
    if tripped:
        diag = BundleAdjustmentDiagnostics(init_cost, init_cost, 0, False, True, cond)
        return BAResult(np.asarray(poses), np.asarray(points), diag)

    converged = final_cost <= init_cost
    diag = BundleAdjustmentDiagnostics(
        init_cost, final_cost, config.max_iterations, converged, False, cond
    )
    return BAResult(refined_poses, refined_points, diag)


def triangulate_points(
    pose1: np.ndarray, pose2: np.ndarray, uv1: np.ndarray, uv2: np.ndarray, K: np.ndarray
) -> np.ndarray:
    """Triangulate matched pixels from two world-from-camera poses.

    Parity: ``bundle_adjustment.py:69-80`` (batched DLT instead of cv2).

    Host numpy on purpose: this is called from the host-side window
    assembler in a Python loop over (first, last) keyframe spans with
    irregular per-span point counts. The eager-jax version dispatched
    ~300 tiny device ops PER SPAN — milliseconds on CPU, but ~40 ms/op
    over a tunneled TPU, which made every keyframe insertion take minutes
    (observed live r4). A batched (N, 4, 4) numpy SVD is microseconds,
    keeps the device free for the big regular programs, and needs no
    per-shape recompiles.
    """
    def proj(T):
        T_cw = np.linalg.inv(np.asarray(T, np.float64))
        return np.asarray(K, np.float64) @ T_cw[:3, :]

    def rows(P, pts):
        u = pts[:, 0:1]
        v = pts[:, 1:2]
        r1 = u * P[2:3, :] - P[0:1, :]
        r2 = v * P[2:3, :] - P[1:2, :]
        return np.stack([r1, r2], axis=1)  # (N, 2, 4)

    uv1 = np.asarray(uv1, np.float64)
    uv2 = np.asarray(uv2, np.float64)
    A = np.concatenate([rows(proj(pose1), uv1), rows(proj(pose2), uv2)], axis=1)  # (N,4,4)
    _, _, Vt = np.linalg.svd(A)
    X = Vt[:, -1, :]  # smallest right singular vector per point
    w = X[:, 3]
    scale = np.where(np.abs(w) < 1e-12, 1e-12, w)
    return (X[:, :3] / scale[:, None]).astype(np.float64)


_PAIR_GATE = None
_PAIR_GATE_M = 192  # max matches per window pair


def _gated_pair_packed(key, a_id, b_id, descA, validA, kpA, descB, validB, kpB, K, thresh):
    """Match + select + essential-RANSAC gate for one keyframe pair,
    packed into ONE device buffer (one launch + one fetch).

    The unfused form ran three dispatches plus four separate device→host
    pulls (valid, success, inliers, pairs) and two eager ``fold_in``
    device ops per NEW pair — ~0.6 s per keyframe over a tunneled chip,
    the window-BA stage's dominant cost. Math is unchanged: the same
    nested jitted calls inline into one program (no vmap — per-pair
    shapes and therefore numerics are exactly the unfused path's).
    Buffer layout: ``[pairs_a (M), pairs_b (M), mask (M)]`` where mask is
    ``sel.valid`` AND (RANSAC inliers when the fit succeeded).
    """
    global _PAIR_GATE
    import jax

    if _PAIR_GATE is None:
        from mvslam_tpu.ops.hamming import MatchConfig, match_descriptors

        def impl(key, a_id, b_id, descA, validA, kpA, descB, validB, kpB, K, thresh):
            res = match_descriptors(descA, validA, descB, validB, MatchConfig(cross_check=True))
            return _pair_gate_post(
                key, a_id, b_id, res.indices, res.distances, res.second_distances,
                res.valid, kpA, kpB, K, thresh,
            )

        _PAIR_GATE = jax.jit(impl)
    return _PAIR_GATE(key, a_id, b_id, descA, validA, kpA, descB, validB, kpB, K, thresh)


def _pair_gate_post(key, a_id, b_id, idx, dist, second, ok, kpA, kpB, K, thresh):
    """Select + RANSAC gate + pack, given a MatchResult's arrays.

    Shared by the fused device program (inlined under ``_PAIR_GATE``'s
    jit, so the fused jaxpr is unchanged by this refactor) and the host
    path below, which feeds it the native matcher's numpy outputs.
    """
    import jax

    from mvslam_tpu.geometry.projection import normalize_pixels
    from mvslam_tpu.ops.hamming import (
        MatchResult,
        gather_matched_points,
        select_matches,
    )
    from mvslam_tpu.ops.ransac import RansacConfig, ransac_essential

    sel = select_matches(MatchResult(idx, dist, second, ok), max_matches=_PAIR_GATE_M)
    p1, p2 = gather_matched_points(kpA, kpB, sel)
    r = ransac_essential(
        jax.random.fold_in(jax.random.fold_in(key, a_id), b_id),
        normalize_pixels(p1, K),
        normalize_pixels(p2, K),
        sel.valid,
        RansacConfig(num_hypotheses=128, min_inliers=8),
        threshold=thresh,
    )
    mask = sel.valid & jnp.where(r.success, r.inliers, True)
    return jnp.concatenate(
        [
            sel.pairs[:, 0].astype(jnp.float32),
            sel.pairs[:, 1].astype(jnp.float32),
            mask.astype(jnp.float32),
        ]
    )


def _use_host_matcher() -> bool:
    """True when small solves execute on the host CPU and the native
    matcher is available — i.e. the N x M matching stage should bypass
    XLA:CPU. False keeps the fused single-program device path."""
    from mvslam_tpu import native
    from mvslam_tpu.core.hostdispatch import small_solve_device

    if not native.native_available():
        return False
    if small_solve_device() is not None:
        return True
    import jax

    return jax.default_backend() == "cpu"


_PAIR_GATE_HOST_POST = None


def _gated_pair_host(key, a_id, b_id, descA, validA, kpA, descB, validB, kpB, K, thresh):
    """Host-path pair gate: native C++ matcher + jitted post stage.

    Same buffer contract as :func:`_gated_pair_packed`. The matcher's
    outputs are bitwise-identical to the in-program matcher
    (tests/test_native.py), and the post stage is the same traced code;
    only XLA's fusion boundary moves, so results can differ from the
    fused program at most at ULP level in the RANSAC floats. Used when
    the solve executes on the host CPU (small-solve placement), where the
    N x M matching stage is ~10x faster natively than under XLA:CPU.
    """
    global _PAIR_GATE_HOST_POST
    import jax

    from mvslam_tpu.core.hostdispatch import small_solve_scope
    from mvslam_tpu.ops.hamming import MatchConfig, match_descriptors_host

    res = match_descriptors_host(descA, validA, descB, validB, MatchConfig(cross_check=True))
    if _PAIR_GATE_HOST_POST is None:
        _PAIR_GATE_HOST_POST = jax.jit(_pair_gate_post)
    with small_solve_scope():  # idempotent under refine_window's caller scope
        return _PAIR_GATE_HOST_POST(
            key, a_id, b_id, res.indices, res.distances, res.second_distances,
            res.valid, kpA, kpB, K, thresh,
        )


class WindowBundleAdjuster:
    """Builds observations from a keyframe window and refines poses in place.

    Parity: ``keyframe_manager.py:85-183`` (windowed observation building by
    chaining pairwise matches + triangulation, then local BA).
    """

    def __init__(
        self,
        K: np.ndarray,
        config: Optional[BundleAdjustmentConfig] = None,
        max_track_error_px: float = 12.0,
        max_pose_move_ratio: float = 0.6,
    ) -> None:
        self.K = np.asarray(K)
        self.config = config or BundleAdjustmentConfig()
        self.max_track_error_px = float(max_track_error_px)
        self.max_pose_move_ratio = float(max_pose_move_ratio)
        self.last_diagnostics: Optional[BundleAdjustmentDiagnostics] = None
        # RANSAC-gated match pairs per (frame_id_a, frame_id_b): a sliding
        # window of W keyframes shares W-2 consecutive pairs with the
        # previous refine_window call, so re-matching them would cost ~4x
        # the necessary device work on the default local-BA hot path.
        # Matching depends only on the two keyframes' features (not their
        # poses), so entries never go stale; bounded by window size.
        self._pair_cache: dict = {}

    def refine_window(self, window, key=None) -> Optional[BAResult]:
        import jax

        if len(window) < 2:
            return None
        if key is None:
            key = jax.random.PRNGKey(0)
        poses = np.stack([kf.pose for kf in window])
        # Chain pairwise consecutive matches into multi-view tracks
        # (feature i in kf k matched to j in kf k+1 extends i's track).
        # Each pair's matches are RANSAC-gated first: ~10-15% of
        # cross-checked descriptor matches are wrong, and the span
        # triangulation below cannot see a bad LINK (a two-view fit always
        # reprojects both of its own views exactly), so ungated chains
        # poison BA. Parity: the reference chains matches across its
        # window the same way (``keyframe_manager.py:130-183``).
        track_obs: List[List[tuple]] = []  # track -> [(kf_idx, feature_idx)]
        prev_assign: dict = {}
        for k in range(len(window) - 1):
            a, b = window[k], window[k + 1]
            # A sliding window shares W-2 consecutive pairs with the
            # previous refine_window call — serve those from the pair
            # cache instead of re-running match+RANSAC device programs.
            # The RANSAC key folds the pair's FRAME ids (not the window
            # position), so a pair's gated matches are a deterministic
            # function of the pair alone and cache hits are exact replays.
            cache_key = (a.frame_id, b.frame_id)
            pairs = self._pair_cache.get(cache_key)
            if pairs is None:
                gate = _gated_pair_host if _use_host_matcher() else _gated_pair_packed
                buf = np.asarray(  # ONE launch + ONE fetch (see _gated_pair_packed)
                    gate(
                        key,
                        jnp.asarray(a.frame_id, jnp.int32),
                        jnp.asarray(b.frame_id, jnp.int32),
                        jnp.asarray(a.descriptors),
                        jnp.asarray(a.valid),
                        jnp.asarray(a.keypoints, jnp.float32),
                        jnp.asarray(b.descriptors),
                        jnp.asarray(b.valid),
                        jnp.asarray(b.keypoints, jnp.float32),
                        jnp.asarray(self.K, jnp.float32),
                        2.0 / float(self.K[0, 0]),
                    )
                )
                M = _PAIR_GATE_M
                mask = buf[2 * M :] > 0.5
                pairs = np.stack(
                    [buf[:M].astype(np.int64), buf[M : 2 * M].astype(np.int64)], axis=1
                )[mask]
                self._pair_cache[cache_key] = pairs
                # Keep only pairs that can recur in a sliding window.
                if len(self._pair_cache) > 4 * max(len(window), 2):
                    self._pair_cache.pop(next(iter(self._pair_cache)))
            cur_assign: dict = {}
            for i, j in pairs:
                tid = prev_assign.get(int(i))
                if tid is None:
                    tid = len(track_obs)
                    track_obs.append([(k, int(i))])
                track_obs[tid].append((k + 1, int(j)))
                cur_assign[int(j)] = tid
            prev_assign = cur_assign
        # Triangulate each track from its first/last observation (widest
        # baseline), batched per (first, last) keyframe pair.
        tracks = [t for t in track_obs if len(t) >= 2]
        if len(tracks) < 8:
            return None
        by_span: dict = {}
        for tid, t in enumerate(tracks):
            by_span.setdefault((t[0][0], t[-1][0]), []).append(tid)
        points = np.zeros((len(tracks), 3))
        good = np.zeros(len(tracks), dtype=bool)
        for (ka, kb), tids in by_span.items():
            uv1 = np.stack([window[ka].keypoints[tracks[t][0][1]] for t in tids])
            uv2 = np.stack([window[kb].keypoints[tracks[t][-1][1]] for t in tids])
            X = triangulate_points(poses[ka], poses[kb], uv1, uv2, self.K)
            ok = np.isfinite(X).all(axis=1) & (np.abs(X) < 1e4).all(axis=1)
            for row, t in enumerate(tids):
                points[t] = X[row]
                good[t] = ok[row]
        if not good.any():
            # Degenerate window (near-zero baseline / garbage poses): every
            # triangulation failed the sanity gate. Nothing to refine.
            return None
        # Reject poisoned tracks: one wrong link in a chain gives that track
        # a huge residual in some view, and even a Huber loss lets enough of
        # them bias the solve. Gate each track on its worst initial
        # reprojection error under the current (unrefined) poses.
        obs_k = np.asarray([k for tid, t in enumerate(tracks) if good[tid] for k, _ in t])
        obs_tid = np.asarray([tid for tid, t in enumerate(tracks) if good[tid] for _ in t])
        obs_uv = np.stack(
            [window[k].keypoints[f] for tid, t in enumerate(tracks) if good[tid] for k, f in t]
        ).astype(np.float64)
        T_cw = np.linalg.inv(poses)  # (W, 4, 4)
        cam = np.einsum("oij,oj->oi", T_cw[obs_k, :3, :3], points[obs_tid]) + T_cw[obs_k, :3, 3]
        z = np.where(np.abs(cam[:, 2]) < 1e-9, 1e-9, cam[:, 2])
        u = self.K[0, 0] * cam[:, 0] / z + self.K[0, 2]
        v = self.K[1, 1] * cam[:, 1] / z + self.K[1, 2]
        err = np.hypot(u - obs_uv[:, 0], v - obs_uv[:, 1])
        err = np.where(cam[:, 2] > 0, err, np.inf)
        worst = np.zeros(len(tracks))
        np.maximum.at(worst, obs_tid, err)
        for tid in np.where(worst > self.max_track_error_px)[0]:
            good[tid] = False

        observations: List[Observation] = []
        kept_points: List[np.ndarray] = []
        remap: dict = {}
        for tid, t in enumerate(tracks):
            if not good[tid]:
                continue
            pt_id = remap.setdefault(tid, len(kept_points))
            if pt_id == len(kept_points):
                kept_points.append(points[tid])
            for k, feat in t:
                observations.append(
                    Observation(k, pt_id, window[k].keypoints[feat].astype(np.float64))
                )
        if len(kept_points) < 8:
            return None
        result = run_bundle_adjustment(
            poses, np.stack(kept_points), observations, self.K, self.config
        )
        self.last_diagnostics = result.diagnostics
        # Update-magnitude gate: a refinement must stay NEAR the tracking
        # chain. A pose dragged beyond ~the inter-keyframe spacing means
        # the solve escaped along a weakly-observable monocular mode
        # (reprojection cost can still drop) — reject it like a
        # conditioning trip rather than poison the trajectory.
        spacing = np.median(np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1))
        moves = np.linalg.norm(result.poses[:, :3, 3] - poses[:, :3, 3], axis=1)
        if moves.max() > self.max_pose_move_ratio * max(spacing, 1e-9):
            result.diagnostics.conditioning_tripped = True
        if not result.diagnostics.conditioning_tripped:
            for kf, pose in zip(window, result.poses):
                kf.pose = pose
        return result
