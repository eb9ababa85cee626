"""Batch-friendly small-matrix linear algebra for TPU.

``eigh``/``svd`` lower to iterative Jacobi/QR sweeps with heavy control
flow — fine for one big matrix, very slow for thousands of tiny ones (the
RANSAC hypothesis batch, per-correspondence triangulation). The helpers
here use Cholesky inverse iteration instead: pure polynomial work that XLA
vectorises across the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_sum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Sum along ``axis`` as an explicit balanced tree of adds.

    The accumulation order inside a ``reduce``/``dot`` contraction is an
    XLA implementation detail: it legally changes when the surrounding
    program is compiled at a different (e.g. per-device, after sharding)
    batch shape, which makes f32 sums disagree across mesh sizes. The
    explicit pairwise adds here pin the order in the jaxpr itself — the
    result is bit-identical for any mesh/batch shape — and as a balanced
    tree the roundoff is O(log N · eps) instead of O(N · eps). Used by the
    weighted (inlier-refit) normal-equation accumulations in
    ``geometry.epipolar``.
    """
    axis = axis % x.ndim
    n = x.shape[axis]
    if n <= 1:
        return jnp.sum(x, axis=axis)
    m = 1 << (n - 1).bit_length()  # next power of two ≥ n
    if m != n:
        pad_width = [(0, 0)] * x.ndim
        pad_width[axis] = (0, m - n)
        x = jnp.pad(x, pad_width)
    while m > 1:
        m //= 2
        a = jax.lax.slice_in_dim(x, 0, m, axis=axis)
        b = jax.lax.slice_in_dim(x, m, 2 * m, axis=axis)
        x = a + b
    return jnp.squeeze(x, axis=axis)


def inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of (..., 3, 3) matrices.

    XLA lowers ``jnp.linalg.inv`` of tiny batched matrices to an
    LuDecompositionBlock custom-call that is latency-bound on TPU
    (profiled at ~0.2 ms per 16x256 batch in the tracking program); the
    adjugate formula is a handful of fused elementwise ops.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    # Sign-preserving clamp: a tiny NEGATIVE det must clamp to -1e-30, or
    # the inverse comes back globally sign-flipped.
    det = jnp.where(jnp.abs(det) < 1e-30, jnp.where(det < 0, -1e-30, 1e-30), det)
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], axis=-1),
            jnp.stack([D, E, F], axis=-1),
            jnp.stack([G, H, I], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def det3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form determinant of (..., 3, 3) matrices (no LU custom-call)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    return a * (e * i - f * h) + b * (f * g - d * i) + c * (d * h - e * g)


def eigh3x3(A: jnp.ndarray):
    """Closed-form eigendecomposition of symmetric (..., 3, 3) matrices.

    Returns ``(eigvals (..., 3) descending, eigvecs (..., 3, 3) columns)``.
    Pure elementwise work — eigenvalues by the trigonometric (Cardano)
    solution of the characteristic cubic, eigenvectors by the largest
    cross product of rows of (A − λI), with the middle vector completed
    as v₃ × v₁ so the basis is exactly orthonormal. Replaces
    ``jnp.linalg.eigh``'s sequential Jacobi custom-call, which is pure
    latency for the single small systems on the pose hot path.

    Degenerate spectra (λ₁ ≈ λ₂ or A ≈ qI) yield an *arbitrary* orthonormal
    basis of the degenerate subspace — callers must be invariant to that
    choice (the essential/homography decompositions are: their recovered
    R, t depend only on the eigenspaces).
    """
    q = (jnp.trace(A, axis1=-2, axis2=-1)) / 3.0
    eye = jnp.eye(3, dtype=A.dtype)
    Aq = A - q[..., None, None] * eye
    p2 = jnp.sum(Aq * Aq, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    B = Aq / p[..., None, None]
    r = jnp.clip(0.5 * det3x3(B), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam2 = 3.0 * q - lam1 - lam3

    def _null_vec(lam):
        M = A - lam[..., None, None] * eye
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        cands = jnp.stack([c01, c02, c12], axis=-2)  # (..., 3, 3)
        norms = jnp.sum(cands * cands, axis=-1)
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
        n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        # A ≈ λI: every cross product vanishes — fall back to e₀ (the
        # caller-invariance contract covers this fully-degenerate case).
        e0 = jnp.zeros_like(v).at[..., 0].set(1.0)
        return jnp.where(n > 1e-20, v / jnp.maximum(n, 1e-30), e0)

    v1 = _null_vec(lam1)
    v3 = _null_vec(lam3)

    # The eigenvector at the larger spectral gap is the reliable one;
    # orthogonalise the other against it (λ₁ ≈ λ₂ makes v₁ noisy while v₃
    # stays well-conditioned, and vice versa).
    def _orth(v, anchor):
        # Gram-Schmidt twice ("twice is enough"): with v ≈ anchor the first
        # residual is parallel-to-anchor roundoff of magnitude ~eps — far
        # above any absolute threshold — and only the second projection
        # collapses it to a true zero that the fallback test can see.
        w = v - anchor * jnp.sum(anchor * v, axis=-1, keepdims=True)
        w = w - anchor * jnp.sum(anchor * w, axis=-1, keepdims=True)
        n = jnp.sqrt(jnp.sum(w * w, axis=-1, keepdims=True))
        # v parallel to the anchor can only happen fully degenerate — any
        # perpendicular completes the basis. Pick the axis least aligned
        # with the anchor so the fallback projection never degenerates.
        axis_idx = jnp.argmin(jnp.abs(anchor), axis=-1)
        axis = jax.nn.one_hot(axis_idx, 3, dtype=v.dtype)
        fallback = axis - anchor * jnp.sum(anchor * axis, axis=-1, keepdims=True)
        fn = jnp.sqrt(jnp.sum(fallback * fallback, axis=-1, keepdims=True))
        fallback = fallback / jnp.maximum(fn, 1e-30)
        return jnp.where(n > 1e-5, w / jnp.maximum(n, 1e-30), fallback)

    top_gap_larger = ((lam1 - lam2) >= (lam2 - lam3))[..., None]
    v1_f = jnp.where(top_gap_larger, v1, _orth(v1, v3))
    v3_f = jnp.where(top_gap_larger, _orth(v3, v1), v3)
    v1, v3 = v1_f, v3_f
    v2 = jnp.cross(v3, v1)
    vals = jnp.stack([lam1, lam2, lam3], axis=-1)
    vecs = jnp.stack([v1, v2, v3], axis=-1)  # columns
    return vals, vecs


def svd3x3(M: jnp.ndarray):
    """Closed-form SVD of (..., 3, 3): ``(U, S (..., 3) descending, Vt)``.

    V and S come from :func:`eigh3x3` of MᵀM; U's first two columns are
    M·vᵢ/σᵢ and the third is their cross product (orthonormal by
    construction, stable when σ₃ → 0 — the essential-matrix case). All
    elementwise — no SVD custom-call. Signs follow u = M v / σ, so
    M = U diag(S) Vᵀ holds with S ≥ 0; U or V may be reflections (same
    contract as LAPACK), callers fold dets as needed.
    """
    vals, V = eigh3x3(jnp.swapaxes(M, -1, -2) @ M)
    S = jnp.sqrt(jnp.maximum(vals, 0.0))
    u1 = (M @ V[..., :, 0, None])[..., 0]
    u2 = (M @ V[..., :, 1, None])[..., 0]
    n1 = jnp.sqrt(jnp.sum(u1 * u1, axis=-1, keepdims=True))
    n2 = jnp.sqrt(jnp.sum(u2 * u2, axis=-1, keepdims=True))
    e0 = jnp.zeros_like(u1).at[..., 0].set(1.0)
    e1 = jnp.zeros_like(u2).at[..., 1].set(1.0)
    u1 = jnp.where(n1 > 1e-20, u1 / jnp.maximum(n1, 1e-30), e0)
    u2 = jnp.where(n2 > 1e-20, u2 / jnp.maximum(n2, 1e-30), e1)
    # Re-orthogonalise u₂ against u₁ (σ₁ ≈ σ₂ leaves them slightly skew);
    # project twice so a parallel pair collapses to a detectable zero.
    u2 = u2 - u1 * jnp.sum(u1 * u2, axis=-1, keepdims=True)
    u2 = u2 - u1 * jnp.sum(u1 * u2, axis=-1, keepdims=True)
    nn2 = jnp.sqrt(jnp.sum(u2 * u2, axis=-1, keepdims=True))
    axis_idx = jnp.argmin(jnp.abs(u1), axis=-1)
    axis = jax.nn.one_hot(axis_idx, 3, dtype=u1.dtype)
    fb = axis - u1 * jnp.sum(u1 * axis, axis=-1, keepdims=True)
    fb = fb / jnp.maximum(jnp.sqrt(jnp.sum(fb * fb, axis=-1, keepdims=True)), 1e-30)
    u2 = jnp.where(nn2 > 1e-5, u2 / jnp.maximum(nn2, 1e-30), fb)
    u3 = jnp.cross(u1, u2)
    # u₃ must satisfy M v₃ = σ₃ u₃ — the cross product fixes it only up to
    # sign, and the wrong sign flips the σ₃ component of the
    # reconstruction. When σ₃ ≈ 0 the sign is immaterial; keep +1.
    mv3 = (M @ V[..., :, 2, None])[..., 0]
    sgn = jnp.sign(jnp.sum(u3 * mv3, axis=-1, keepdims=True))
    u3 = u3 * jnp.where(sgn == 0.0, 1.0, sgn)
    U = jnp.stack([u1, u2, u3], axis=-1)
    return U, S, jnp.swapaxes(V, -1, -2)


def _gauss_jordan_inverse_with_pivots(S: jnp.ndarray):
    """Unrolled no-pivot Gauss-Jordan inverse of (..., n, n) SPD matrices,
    also returning the minimum elimination pivot.

    Ridge-regularised SPD input keeps every pivot positive, so pivoting is
    unnecessary; a non-positive ``min_pivot`` (...,) means roundoff left
    the system indefinite and the returned inverse — finite or not — is
    untrustworthy.
    """
    n = S.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=S.dtype), S.shape)
    aug = jnp.concatenate([S, eye], axis=-1)  # (..., n, 2n)
    min_pivot = jnp.full(S.shape[:-2], jnp.inf, dtype=S.dtype)
    for k in range(n):
        pivot = aug[..., k, k : k + 1]  # (..., 1)
        min_pivot = jnp.minimum(min_pivot, pivot[..., 0])
        row_k = aug[..., k, :] / pivot  # (..., 2n)
        factor = aug[..., :, k]  # (..., n)
        factor = factor.at[..., k].set(0.0)
        aug = aug - factor[..., :, None] * row_k[..., None, :]
        aug = aug.at[..., k, :].set(row_k)
    return aug[..., :, n:], min_pivot


def smallest_eigvec_psd(S: jnp.ndarray, iterations: int = 10, rescue: bool = True) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of a PSD matrix (batched).

    S: (..., n, n) symmetric positive semi-definite (e.g. AᵀA). A
    scale-aware ridge regularises the (near-)singular case; the fixed
    iteration count keeps the compiled program static. Ten iterations:
    noisy minimal samples can have weak spectral gaps (six rounds measurably
    hurt RANSAC inlier recall); clean refit spectra converge in 1-2.
    """
    n = S.shape[-1]
    # All tiny-dim reductions here go through tree_sum: a plain
    # reduce/dot's accumulation order can change with the surrounding
    # compiled batch shape (mesh sharding), and downstream RANSAC votes
    # threshold on these values — order-pinned adds keep the whole solve
    # bit-stable across mesh sizes.
    trace = tree_sum(jnp.diagonal(S, axis1=-2, axis2=-1), axis=-1)
    # A ridge shifts every eigenvalue equally but never changes the
    # eigenvectors. It must (a) dominate the f32 matmul roundoff that can
    # leave AᵀA slightly indefinite (λ_min ≈ −1e-8·tr observed) yet (b)
    # stay below the informative spectral gap, which for the 8-point
    # essential system is as small as ~1e-6·tr. 1e-7·tr threads the
    # needle; stragglers that still fail get a 100x rescue ridge.
    eye = jnp.eye(n, dtype=S.dtype)
    ridge = (1e-7 * trace + 1e-12)[..., None, None] * eye

    # Build S⁻¹ explicitly (closed-form adjugate at n=3, unrolled
    # Gauss-Jordan otherwise — both pure fused elementwise work, replacing
    # the sequential Cholesky/triangular-solve custom-calls that profiled
    # as the pose stage's hottest ops), then run the iterations as batched
    # matvecs (near-free on the MXU).
    if n == 3:
        def invert(M):
            # SPD health signal for the adjugate path: non-positive
            # determinant ⇔ roundoff-indefinite input. Closed-form det
            # (no LU custom-call, matching inv3x3's design).
            return inv3x3(M), det3x3(M)

    else:
        invert = _gauss_jordan_inverse_with_pivots
    S_ridged = S + ridge
    S_inv, pivot_sig = invert(S_ridged)
    if rescue:
        # A second inversion with 100x ridge rescues elements whose f32
        # roundoff left S singular beyond the base ridge. Unlike the old
        # Cholesky (which signalled failure with NaN), no-pivot
        # Gauss-Jordan / clamped adjugate return FINITE garbage on
        # singular input — but the ridge bounds the TRUE inverse:
        # λ_min(S+ridge) ≥ 1e-7·tr, so ‖S⁻¹‖_max ≤ 1/(1e-7·tr). Entries
        # past that bound (10x slack) can only be numerical blow-up.
        # (An ‖S·S⁻¹−I‖ residual check is the wrong detector here: it
        # also fires on merely ill-conditioned systems, and the 8-point
        # refit spectra are legitimately ill-conditioned.) The extra
        # inverse only runs on the rescue path (inlier REFITS, where a
        # poisoned model matters); RANSAC hypothesis batches (where a bad
        # candidate merely scores zero inliers) skip it.
        # Two independent detectors: the magnitude bound, plus a pivot/
        # determinant positivity signal — no-pivot elimination on a
        # roundoff-indefinite S can return finite, in-bound but inaccurate
        # inverses that magnitude alone would miss.
        bound = 10.0 / (1e-7 * trace + 1e-12)[..., None, None]
        peak = jnp.max(jnp.abs(S_inv), axis=(-2, -1), keepdims=True)
        bad = ~jnp.isfinite(peak) | (peak > bound) | (pivot_sig <= 0)[..., None, None]
        # The rescue inversion runs under lax.cond: on the latency-bound
        # refit path (batch of 1-2 systems) the unrolled inversion is a
        # long chain of tiny sequential ops, and healthy refits — the
        # overwhelmingly common case — skip the whole second chain at
        # runtime. When any element IS bad the branch computes exactly
        # what the unconditional form computed, so results are
        # bit-identical either way. (Under vmap the cond lowers back to
        # select/both-branches — the pre-existing behavior.)
        S_inv = jax.lax.cond(
            jnp.any(bad),
            lambda: jnp.where(bad, invert(S + 100.0 * ridge)[0], S_inv),
            lambda: S_inv,
        )

    x = jnp.broadcast_to(jnp.linspace(1.0, 1.3, n, dtype=S.dtype), S.shape[:-2] + (n,))
    for _ in range(iterations):
        x = tree_sum(S_inv * x[..., None, :], axis=-1)
        norm = jnp.sqrt(tree_sum(x * x, axis=-1))[..., None]
        x = x / jnp.maximum(norm, 1e-30)
    return x
