"""Umeyama similarity alignment (used by ATE and Sim(3) loop scaling).

Counterpart of the reference's SVD alignment in
``evaluate_trajectory.py:34-53`` and the Sim(3) loop-scale estimation in
``visual_slam_offline_entry_point.py:417-430``. Pure jnp so it can run
jitted on device for large trajectories or on host for evaluation.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def umeyama_alignment(
    source: jnp.ndarray,
    target: jnp.ndarray,
    with_scale: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Least-squares similarity transform aligning source → target.

    source, target: (N, D). Returns (R, t, s) minimising
    ``|| target - (s R source + t) ||²`` with the determinant flip guard.
    """
    source = jnp.asarray(source)
    target = jnp.asarray(target)
    n = source.shape[0]
    mu_s = jnp.mean(source, axis=0)
    mu_t = jnp.mean(target, axis=0)
    src_c = source - mu_s
    tgt_c = target - mu_t
    cov = (tgt_c.T @ src_c) / n
    U, D, Vt = jnp.linalg.svd(cov)
    d = source.shape[1]
    det_sign = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    S = jnp.ones((d,), dtype=source.dtype).at[-1].set(det_sign)
    R = (U * S[None, :]) @ Vt
    var_s = jnp.mean(jnp.sum(src_c * src_c, axis=1))
    scale = jnp.where(
        with_scale,
        jnp.sum(D * S) / jnp.where(var_s < 1e-12, 1e-12, var_s),
        jnp.asarray(1.0, dtype=source.dtype),
    )
    t = mu_t - scale * (R @ mu_s)
    return R, t, scale


def apply_similarity(points: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    return s * (points @ R.T) + t
