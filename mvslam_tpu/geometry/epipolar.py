"""Epipolar geometry: essential/homography estimation + decomposition.

TPU-first replacement for the reference's pure-NumPy multiview module
(``homography.py``): the 8-point essential solver (ref L222-248), DLT
homography (ref L118-142), Sampson error (ref L302-345 scoring), symmetric
transfer error (ref L148-216 scoring), cheirality-based E decomposition
(ref L251-299), and planar H decomposition (ref L59-78). Everything here
is written to be *batched over hypotheses* with ``vmap`` — a RANSAC
iteration becomes one fused device program instead of a Python loop.

All solvers operate on **normalised camera coordinates** (pixels pre-
multiplied by K⁻¹); RANSAC thresholds are divided by focal length at the
call site.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mvslam_tpu.geometry.linalg import inv3x3, smallest_eigvec_psd, tree_sum
from mvslam_tpu.geometry.projection import hartley_normalization

# Inverse-iteration counts for the null-space solves. Hypothesis batches
# AND refits both keep the full 10. Round 4 tiered refits down to 4 on
# the theory that averaged inlier spectra are clean — measurably false:
# near-degenerate two-view geometry (e.g. pure lateral translation)
# leaves refit gram matrices with weak spectral gaps, the 4-iteration
# null vector does not converge, and downstream pose precision drops
# enough to flip loop-closure from helping to hurting on the
# out-and-back accuracy scene (VERDICT r4 #1, bisected to ab04a4b;
# A/B: refit=4 → loop-ON ATE 0.117 > loop-OFF 0.101; refit=10 →
# 0.028 < 0.040). The cost is ~12 extra fused 9x9 matvecs per refit
# round — noise next to the hypothesis batch.
HYPOTHESIS_EIGVEC_ITERS = 10
REFIT_EIGVEC_ITERS = 10


def _homogeneous(pts: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def _matvec3(M: jnp.ndarray, x: jnp.ndarray, pinned: bool = True) -> jnp.ndarray:
    """(..., 3, 3) applied to (..., N, 3) rows.

    ``pinned=True``: written as explicit ``(m0·x0 + m1·x1) + m2·x2`` so the
    3-term accumulation order cannot be retiled differently at different
    per-device batch shapes (the scorer outputs feed RANSAC vote
    thresholds — see ``_gram_tree``). ``pinned=False``: a plain dot
    contraction — measurably faster on one chip (the pinned elementwise
    form skips the MXU), used when cross-mesh bit-stability is not
    contractual (see ``RansacConfig.mesh_invariant``).
    """
    if not pinned:
        return x @ jnp.swapaxes(M, -1, -2)
    cols = [x[..., j] for j in range(3)]
    rows = [
        (M[..., i, 0, None] * cols[0] + M[..., i, 1, None] * cols[1])
        + M[..., i, 2, None] * cols[2]
        for i in range(3)
    ]
    return jnp.stack(rows, axis=-1)


def _gram_tree(A: jnp.ndarray) -> jnp.ndarray:
    """AᵀA accumulated by an order-pinned balanced tree over the row axis.

    A: (..., N, D) → (..., D, D). A ``dot`` contraction over N is
    reassociated freely by XLA when the program recompiles at a different
    per-device batch shape (mesh size), so f32 refits drift across meshes;
    the explicit outer-product + :func:`~mvslam_tpu.geometry.linalg.tree_sum`
    form is bit-identical on any mesh and loses only O(log N · eps) to
    roundoff. Refit-only (once per pair, N ≤ a few hundred rows): the
    (N, D, D) intermediate stays fusion-resident.
    """
    outer = A[..., :, :, None] * A[..., :, None, :]
    return tree_sum(outer, axis=-3)


def _smallest_singular_vector(
    A: jnp.ndarray,
    rescue: bool = True,
    iterations: int = HYPOTHESIS_EIGVEC_ITERS,
    pinned: bool = True,
) -> jnp.ndarray:
    """Right singular vector of A with the smallest singular value.

    Inverse iteration on AᵀA (see ``geometry.linalg``) — far
    faster than eigh/svd for the thousands of tiny systems in a RANSAC
    hypothesis batch. ``rescue=False`` skips the NaN-rescue factorization
    (appropriate when a failed element merely loses a RANSAC vote).
    ``pinned=False`` accumulates AᵀA with a dot contraction instead of the
    order-pinned tree (single-chip fast path; see ``_matvec3``).

    AᵀA is accumulated with the order-pinned tree form (``_gram_tree``)
    rather than a ``dot``: the contraction is tiny (8 or 4 rows), so the
    cost is identical, and the result is bit-stable across the different
    per-device batch shapes a mesh introduces — keeping hypothesis models
    (and therefore RANSAC votes/argmax) mesh-invariant.
    """
    gram = _gram_tree(A) if pinned else jnp.swapaxes(A, -1, -2) @ A
    return smallest_eigvec_psd(gram, iterations=iterations, rescue=rescue)


def essential_rows(
    pts1: jnp.ndarray, pts2: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Constraint rows of the 8-point system: (..., N, 9), one
    ``kron(x2, x1)`` row per correspondence so that x2ᵀ E x1 = 0."""
    x1 = _homogeneous(pts1)
    x2 = _homogeneous(pts2)
    A = (x2[..., :, :, None] * x1[..., :, None, :]).reshape(*x1.shape[:-1], 9)
    if weights is not None:
        A = A * weights[..., None]
    return A


def _invsqrt3x3_psd(C: jnp.ndarray, iterations: int = 5) -> jnp.ndarray:
    """Newton–Schulz C^(−1/2) for (..., 3, 3) SPD with spectrum ⊂ (0, 3).

    X ← ½ X (3I − C X²), X₀ = I — pure batched 3×3 matmuls (a handful of
    fused VPU ops), converging quadratically. Five rounds cover spectra
    as lopsided as λmax/λmin ≈ 10; callers must pre-scale C so its
    spectrum sits near 1 (see :func:`essential_from_vec`).
    """
    eye = jnp.broadcast_to(jnp.eye(3, dtype=C.dtype), C.shape)
    X = eye
    for _ in range(iterations):
        X = 0.5 * (X @ (3.0 * eye - C @ (X @ X)))
    return X


def essential_from_vec(e: jnp.ndarray, exact_rank2: bool) -> jnp.ndarray:
    """E (..., 3, 3) from the null-space vector (..., 9).

    ``exact_rank2=False`` (hypothesis batches): enforce only rank 2 by
    projecting out the smallest right-singular direction, E(I − v₃v₃ᵀ).
    Sampson scoring is scale-invariant and true essentials have σ₁ = σ₂,
    so the (1,1,0) renormalisation is indistinguishable for vote counting
    — but jnp.linalg.svd on a (K,3,3) batch is Jacobi sweeps and costs
    ~3.5 ms at K=512 where this projection costs ~0.3 ms.

    ``exact_rank2=True`` (refits, decomposition inputs): enforce the full
    σ = (1, 1, 0) spectrum — WITHOUT the SVD custom-call (a sequential
    Jacobi chain; the refit batch is 1-2 matrices, so it ran at pure
    latency). With E₂ = E(I − v₃v₃ᵀ) = σ₁u₁v₁ᵀ + σ₂u₂v₂ᵀ and
    σ̂² = tr(E₂ᵀE₂)/2, the matrix C = E₂ᵀE₂/σ̂² + v₃v₃ᵀ has
    C^(−1/2) = (σ̂/σ₁)v₁v₁ᵀ + (σ̂/σ₂)v₂v₂ᵀ + v₃v₃ᵀ, so

        (E₂/σ̂) · C^(−1/2) = u₁v₁ᵀ + u₂v₂ᵀ = U diag(1,1,0) Vᵀ

    exactly — and C's spectrum is {2λ₁/(λ₁+λ₂), 2λ₂/(λ₁+λ₂), 1} ⊂ [0, 2],
    inside Newton–Schulz's basin by construction. A tiny ridge keeps the
    degenerate σ₂ → 0 case finite (such frames fail the pose gates anyway).
    """
    E = e.reshape(*e.shape[:-1], 3, 3)
    v3 = smallest_eigvec_psd(
        jnp.swapaxes(E, -1, -2) @ E,
        iterations=HYPOTHESIS_EIGVEC_ITERS if not exact_rank2 else REFIT_EIGVEC_ITERS,
        rescue=False,
    )
    E2 = E - (E @ v3[..., :, None]) * v3[..., None, :]
    if not exact_rank2:
        return E2
    A = jnp.swapaxes(E2, -1, -2) @ E2
    s2 = 0.5 * ((A[..., 0, 0] + A[..., 1, 1]) + A[..., 2, 2])
    s2 = jnp.maximum(s2, 1e-20)
    C = A / s2[..., None, None] + v3[..., :, None] * v3[..., None, :]
    eye = jnp.eye(3, dtype=E.dtype)
    C = C + 1e-6 * eye
    inv_sqrt = _invsqrt3x3_psd(C)
    return (E2 / jnp.sqrt(s2)[..., None, None]) @ inv_sqrt


def eight_point_essential(
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    pinned: bool = True,
) -> jnp.ndarray:
    """Essential matrix from ≥8 normalised correspondences (batched).

    pts1, pts2: (..., N, 2) with N ≥ 8. Optional ``weights`` (..., N) scale
    each constraint row — pass an inlier mask to refit on inliers without
    dynamic shapes. Returns (..., 3, 3) with the rank-2 constraint
    (singular values 1, 1, 0) enforced. ``pinned`` selects the
    mesh-invariant order-pinned accumulation (see ``_matvec3``).
    """
    A = essential_rows(pts1, pts2, weights)
    # Refits (weights given) poison the final model on NaN -> rescue;
    # hypothesis batches just lose one vote -> skip the extra inversion.
    refit = weights is not None
    e = _smallest_singular_vector(
        A,
        rescue=refit,
        iterations=REFIT_EIGVEC_ITERS if refit else HYPOTHESIS_EIGVEC_ITERS,
        pinned=pinned,
    )
    return essential_from_vec(e, exact_rank2=refit)


def sampson_error(
    E: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray, pinned: bool = True
) -> jnp.ndarray:
    """First-order geometric (Sampson) error of x2ᵀ E x1 (batched).

    E: (..., 3, 3); pts: (..., N, 2). Returns (..., N) squared errors.
    """
    x1 = _homogeneous(pts1)
    x2 = _homogeneous(pts2)
    Ex1 = _matvec3(E, x1, pinned)  # (..., N, 3) = (E @ x1ᵀ)ᵀ
    Etx2 = _matvec3(jnp.swapaxes(E, -1, -2), x2, pinned)  # (..., N, 3) = (Eᵀ @ x2ᵀ)ᵀ
    prod = x2 * Ex1
    num = ((prod[..., 0] + prod[..., 1]) + prod[..., 2]) ** 2
    den = Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    return num / jnp.where(den < 1e-12, 1e-12, den)


def _two_ray_depths(R, t_vec, pts1, pts2):
    """Per-point depths (z1, z2) from the 2x2 normal equations of
    [f2 | -R f1] [z2; z1] = t (two-ray linear triangulation, cam1 at
    identity) — shared by the cheirality vote and triangulation."""
    f1 = _homogeneous(pts1)
    f2 = _homogeneous(pts2)
    Rf1 = f1 @ R.T
    A = jnp.stack([f2, -Rf1], axis=-1)  # (N, 3, 2)
    b = jnp.broadcast_to(t_vec, f1.shape)[..., None]  # (N, 3, 1)
    AtA = jnp.swapaxes(A, -1, -2) @ A  # (N, 2, 2)
    Atb = jnp.swapaxes(A, -1, -2) @ b  # (N, 2, 1)
    det = AtA[..., 0, 0] * AtA[..., 1, 1] - AtA[..., 0, 1] * AtA[..., 1, 0]
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z2 = (AtA[..., 1, 1] * Atb[..., 0, 0] - AtA[..., 0, 1] * Atb[..., 1, 0]) / det
    z1 = (-AtA[..., 1, 0] * Atb[..., 0, 0] + AtA[..., 0, 0] * Atb[..., 1, 0]) / det
    return z1, z2


def decompose_essential(
    E: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Recover (R, t) from E by cheirality voting over the 4 candidates.

    pts1, pts2: (N, 2) normalised inlier correspondences. Candidate test
    triangulates midpoints in closed form for all N points and all 4
    (R, t) pairs at once (parity: ``homography.py:251-299`` which loops in
    Python per point). Returns (R (3,3), t (3,) unit norm, cheirality_count).

    The rotation pair comes from Horn's closed form rather than an SVD
    custom-call (a sequential Jacobi chain — pure latency on a single
    3×3): for an exact essential E = [t]×R with ‖t‖ = 1,
    adj(E)ᵀ = t tᵀ R and [t]×E = (t tᵀ − I) R, so

        R  = adj(E)ᵀ − [t]×E          (the second rotation of the
        R' = adj(E)ᵀ + [t]×E           twisted pair, (2ttᵀ − I)R)

    and the sign ambiguity of E merely swaps R ↔ R'. E is rescaled to
    ‖E‖_F = √2 first (adj is quadratic in scale, [t]× linear), and one
    Newton orthonormalisation step absorbs the O(σ₁−σ₂) error when the
    input was only rank-2-projected rather than fully σ-equalised.
    """
    fnorm = jnp.sqrt(jnp.sum(E * E))
    En = E * (jnp.sqrt(2.0) / jnp.maximum(fnorm, 1e-20))
    # Left null vector: E Eᵀ t = 0 (the translation direction, up to sign).
    t = smallest_eigvec_psd(
        En @ En.T, iterations=REFIT_EIGVEC_ITERS, rescue=True
    )
    a, b, c = En[0, 0], En[0, 1], En[0, 2]
    d, e, f = En[1, 0], En[1, 1], En[1, 2]
    g, h, i = En[2, 0], En[2, 1], En[2, 2]
    cof = jnp.stack(
        [
            jnp.stack([e * i - f * h, f * g - d * i, d * h - e * g]),
            jnp.stack([c * h - b * i, a * i - c * g, b * g - a * h]),
            jnp.stack([b * f - c * e, c * d - a * f, a * e - b * d]),
        ]
    )  # adj(En)ᵀ
    tx = jnp.asarray(
        [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 0.0]], dtype=E.dtype
    )
    skew_t = (
        t[0] * jnp.asarray([[0, 0, 0], [0, 0, -1], [0, 1, 0]], dtype=E.dtype)
        + t[1] * jnp.asarray([[0, 0, 1], [0, 0, 0], [-1, 0, 0]], dtype=E.dtype)
        + t[2] * tx
    )
    txE = skew_t @ En
    eye3 = jnp.eye(3, dtype=E.dtype)

    def _orthonormalize(R):
        return R @ (1.5 * eye3 - 0.5 * (R.T @ R))

    R1 = _orthonormalize(cof - txE)
    R2 = _orthonormalize(cof + txE)
    Rs = jnp.stack([R1, R1, R2, R2])  # (4, 3, 3)
    ts = jnp.stack([t, -t, t, -t])  # (4, 3)

    def count_cheirality(R, t_vec):
        z1, z2 = _two_ray_depths(R, t_vec, pts1, pts2)
        good = ((z1 > 1e-6) & (z2 > 1e-6)).astype(E.dtype)
        if weights is not None:
            good = good * weights
        return jnp.sum(good)

    counts = jnp.stack([count_cheirality(Rs[i], ts[i]) for i in range(4)])
    best = jnp.argmax(counts)
    R_best = Rs[best]
    t_best = ts[best]
    t_norm = jnp.linalg.norm(t_best)
    t_best = t_best / jnp.where(t_norm < 1e-12, 1e-12, t_norm)
    return R_best, t_best, counts[best]


def triangulate_normalized(
    R: jnp.ndarray, t: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray
) -> jnp.ndarray:
    """Two-ray linear triangulation (normalised coords, cam1 at identity).

    Returns (N, 3) points in cam1 frame; used for parallax/cheirality
    diagnostics without forming projection matrices.
    """
    z1, _ = _two_ray_depths(R, t, pts1, pts2)
    return _homogeneous(pts1) * z1[..., None]


# ---------------------------------------------------------------------------
# Homography
# ---------------------------------------------------------------------------


def homography_rows(
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    pinned: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hartley-normalised DLT constraint rows: ((..., 2N, 9), T1, T2)."""
    n1, T1 = hartley_normalization(pts1, weights, pinned=pinned)
    n2, T2 = hartley_normalization(pts2, weights, pinned=pinned)
    x, y = n1[..., 0], n1[..., 1]
    u, v = n2[..., 0], n2[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    row1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=-1)
    row2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1)
    if weights is not None:
        row1 = row1 * weights[..., None]
        row2 = row2 * weights[..., None]
    return jnp.concatenate([row1, row2], axis=-2), T1, T2


def homography_from_vec(h: jnp.ndarray, T1: jnp.ndarray, T2: jnp.ndarray) -> jnp.ndarray:
    """H (..., 3, 3) from the null-space vector (..., 9), denormalised."""
    Hn = h.reshape(*h.shape[:-1], 3, 3)
    H = inv3x3(T2) @ Hn @ T1
    scale = H[..., 2:3, 2:3]
    return H / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)


def dlt_homography(
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    pinned: bool = True,
) -> jnp.ndarray:
    """Hartley-normalised DLT homography from ≥4 correspondences (batched).

    pts1, pts2: (..., N, 2), N ≥ 4. Optional ``weights`` (..., N) scale the
    constraint rows (masked inlier refit). Returns (..., 3, 3) with
    H[2,2] = 1. Parity: ``homography.py:118-142``.
    """
    A, T1, T2 = homography_rows(pts1, pts2, weights, pinned=pinned)
    refit = weights is not None
    h = _smallest_singular_vector(
        A,
        rescue=refit,
        iterations=REFIT_EIGVEC_ITERS if refit else HYPOTHESIS_EIGVEC_ITERS,
        pinned=pinned,
    )
    return homography_from_vec(h, T1, T2)


def symmetric_transfer_error(
    H: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray, pinned: bool = True
) -> jnp.ndarray:
    """Forward + backward reprojection error of a homography (batched).

    Returns (..., N) summed squared errors. Parity: ``homography.py:148-216``.
    """
    H_inv = inv3x3(H)

    def transfer(M, pts):
        x = _homogeneous(pts)
        y = _matvec3(M, x, pinned)
        w = jnp.where(jnp.abs(y[..., 2:3]) < 1e-12, 1e-12, y[..., 2:3])
        return y[..., :2] / w

    fwd = transfer(H, pts1) - pts2
    bwd = transfer(H_inv, pts2) - pts1
    return jnp.sum(fwd * fwd, axis=-1) + jnp.sum(bwd * bwd, axis=-1)


def decompose_homography(
    H: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Calibrated homography → (R, t_unit, cheirality count).

    Full Faugeras SVD decomposition (parity: ``homography.py:59-78``'s
    role): with H = U·diag(d1,d2,d3)·Vᵀ and H normalised by d2, the four
    sign combinations of

        x1 = ±√((d1²−d2²)/(d1²−d3²)),  x3 = ±√((d2²−d3²)/(d1²−d3²))

    yield candidate (R', t', n') triples in the SVD frame; candidates are
    mapped back through U/V and ranked by cheirality voting over the
    correspondences (both depths positive). Near-pure-rotation H
    degenerates to t→0 — such models lose to the essential branch via the
    parallax gate. Assumes normalised coordinates.

    Uses the closed-form :func:`~mvslam_tpu.geometry.linalg.svd3x3`
    (analytic eigendecomposition of HᵀH) instead of the SVD custom-call —
    a single 3×3 per frame runs at pure sequential-op latency, and the
    Jacobi custom-call dominated this stage's profile. Degenerate spectra
    get an arbitrary basis of the degenerate subspace, which the Faugeras
    candidates are invariant to.
    """
    from mvslam_tpu.geometry.linalg import det3x3, svd3x3

    U, S, Vt = svd3x3(H)
    # Work with proper rotations: fold the reflection into both factors.
    detU = det3x3(U)
    detV = det3x3(Vt)
    U = U * detU
    Vt = Vt * detV
    d1, d2, d3 = S[0], S[1], S[2]
    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    x1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / denom, 0.0, 1.0))
    x3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / denom, 0.0, 1.0))
    d2_safe = jnp.maximum(d2, 1e-12)

    signs = jnp.asarray(
        [[1.0, 1.0], [1.0, -1.0], [-1.0, 1.0], [-1.0, -1.0]], dtype=H.dtype
    )

    def candidate(sgn):
        e1, e3 = sgn[0], sgn[1]
        s_theta = (d1 - d3) * (e1 * x1) * (e3 * x3) / d2_safe
        c_theta = (d1 * x3 * x3 + d3 * x1 * x1) / d2_safe
        Rp = jnp.asarray(
            [
                [c_theta, 0.0, -s_theta],
                [0.0, 1.0, 0.0],
                [s_theta, 0.0, c_theta],
            ],
            dtype=H.dtype,
        )
        tp = (d1 - d3) * jnp.asarray([e1 * x1, 0.0, -e3 * x3], dtype=H.dtype)
        R = U @ Rp @ Vt
        t = U @ tp
        return R, t

    Rs, ts = jax.vmap(candidate)(signs)

    def count(R, t_vec):
        # Guard t≈0 (pure rotation): normalise for voting, report raw count.
        norm = jnp.linalg.norm(t_vec)
        t_unit = t_vec / jnp.where(norm < 1e-9, 1.0, norm)
        pts = triangulate_normalized(R, t_unit, pts1, pts2)
        z1 = pts[..., 2]
        cam2 = pts @ R.T + t_unit
        return jnp.sum((z1 > 1e-6) & (cam2[..., 2] > 1e-6))

    counts = jax.vmap(count)(Rs, ts)
    best = jnp.argmax(counts)
    R_best = Rs[best]
    t_best = ts[best]
    t_norm = jnp.linalg.norm(t_best)
    t_best = t_best / jnp.where(t_norm < 1e-9, 1.0, t_norm)
    return R_best, t_best, counts[best]
