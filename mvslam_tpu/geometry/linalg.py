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


def smallest_eigvec_psd(S: jnp.ndarray, iterations: int = 10, rescue: bool = True) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of a PSD matrix (batched).

    S: (..., n, n) symmetric positive semi-definite (e.g. AᵀA). A
    scale-aware ridge regularises the (near-)singular case; the fixed
    iteration count keeps the compiled program static. Ten iterations:
    noisy minimal samples can have weak spectral gaps (six rounds measurably
    hurt RANSAC inlier recall); clean refit spectra converge in 1-2.
    """
    n = S.shape[-1]
    trace = jnp.trace(S, axis1=-2, axis2=-1)
    # A ridge shifts every eigenvalue equally but never changes the
    # eigenvectors. It must (a) dominate the f32 matmul roundoff that can
    # leave AᵀA slightly indefinite (λ_min ≈ −1e-8·tr observed) yet (b)
    # stay below the informative spectral gap, which for the 8-point
    # essential system is as small as ~1e-6·tr. 1e-7·tr threads the
    # needle; stragglers that still fail Cholesky get a 100x rescue ridge.
    eye = jnp.eye(n, dtype=S.dtype)
    ridge = (1e-7 * trace + 1e-12)[..., None, None] * eye
    L = jax.lax.linalg.cholesky(S + ridge)
    if rescue:
        # A second factorization with 100x ridge rescues elements whose f32
        # roundoff left S indefinite beyond the base ridge. It costs a full
        # extra Cholesky, so RANSAC hypothesis batches (where a NaN
        # candidate merely scores zero inliers) skip it; inlier REFITS
        # (where a NaN poisons the final model) keep it.
        bad = jnp.isnan(L).any(axis=(-2, -1), keepdims=True)
        L_big = jax.lax.linalg.cholesky(S + 100.0 * ridge)
        L = jnp.where(bad, L_big, L)

    # Build S⁻¹ explicitly with two *wide* triangular solves, then run the
    # iterations as batched matvecs. Triangular substitution is sequential
    # on TPU, so 2·iterations narrow solves cost ~0.38 ms/round at batch
    # 512; one n-RHS solve pair costs about the same as a single round and
    # the matvecs are near-free on the MXU (measured 1.91 → 0.70 ms/call,
    # eigenvectors bit-identical to the factored-solve path).
    eye_b = jnp.broadcast_to(eye, S.shape)
    Y = jax.lax.linalg.triangular_solve(L, eye_b, left_side=True, lower=True)
    S_inv = jax.lax.linalg.triangular_solve(
        L, Y, left_side=True, lower=True, transpose_a=True
    )

    x = jnp.broadcast_to(jnp.linspace(1.0, 1.3, n, dtype=S.dtype), S.shape[:-2] + (n,))
    for _ in range(iterations):
        x = jnp.sum(S_inv * x[..., None, :], axis=-1)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)
    return x
