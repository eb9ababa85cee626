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
        S_inv_big, _ = invert(S + 100.0 * ridge)
        S_inv = jnp.where(bad, S_inv_big, S_inv)

    x = jnp.broadcast_to(jnp.linspace(1.0, 1.3, n, dtype=S.dtype), S.shape[:-2] + (n,))
    for _ in range(iterations):
        x = tree_sum(S_inv * x[..., None, :], axis=-1)
        norm = jnp.sqrt(tree_sum(x * x, axis=-1))[..., None]
        x = x / jnp.maximum(norm, 1e-30)
    return x
