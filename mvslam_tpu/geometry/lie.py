"""SO(3)/SE(3)/SE(2)/Sim(3) exponential and logarithm maps in JAX.

Replaces the reference's ``cv2.Rodrigues`` round-trips
(``factor_graph.py:225-284``, ``pose_graph.py:249-488``) with closed-form,
jittable, batched-friendly Lie maps. All functions are pure, follow the
input dtype, and are safe at the small-angle singularity via Taylor
branches selected with ``jnp.where`` (no data-dependent control flow, so
everything traces under ``jit``/``vmap``/``grad``).

Conventions: rotation vectors are axis*angle (rvec); SE(3) tangent vectors
are ``[rho(3), phi(3)]`` with translation part first composed as
``T = [[exp(phi), V(phi) @ rho], [0, 1]]``; Sim(3) tangent adds a log-scale
7th component (matching the reference's 7-dof parameterisation,
``factor_graph.py:253-284``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector (batched over leading dims)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def _sinc_coeffs(theta2: jnp.ndarray):
    """(A, B, C) = (sinθ/θ, (1-cosθ)/θ², (θ-sinθ)/θ³) as functions of θ².

    Taking θ² (smooth in the rotation vector — no norm-at-zero kink) keeps
    these coefficients differentiable at the identity: the Taylor branches
    are polynomials in θ², and the generic branch only sees θ² bounded
    away from 0, so autodiff (``jacfwd`` in the factor-graph linearizer)
    never produces NaN.
    """
    small = theta2 < 1e-8
    safe = jnp.sqrt(jnp.where(small, jnp.ones_like(theta2), theta2))
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe) / safe)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (safe - jnp.sin(safe)) / (safe**3))
    return A, B, C


def so3_exp(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: rotation vector → rotation matrix (batched)."""
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    K = hat(rvec)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + A[..., None, None] * K + B[..., None, None] * (K @ K)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix → rotation vector, stable near 0 and π.

    Differentiable at the identity: the near-identity branch is a series in
    (1 − cosθ) (smooth in R), sinθ comes from a regularised norm (finite
    derivative at w = 0), and atan2 is smooth away from the origin — so
    derivatives stay finite even in unselected branches (the JAX
    ``where``-gradient rule).
    """
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # Generic branch: axis from the antisymmetric part.
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # sinθ from the antisymmetric part (|w| = 2 sinθ): uniformly well-
    # conditioned, unlike sin(arccos(trace)) whose error grows as
    # δtrace/sin²θ approaching π. The regulariser keeps d|w|/dw finite at
    # w = 0 (autodiff through unselected branches).
    w_norm = jnp.sqrt(jnp.sum(w * w, axis=-1) + 1e-24)
    sin_theta = 0.5 * w_norm
    theta = jnp.arctan2(sin_theta, cos_theta)
    near_id = cos_theta > 1.0 - 1e-6  # θ ≲ 1.4e-3
    # Wide π-window (θ ≳ π − 0.014): below it the generic w·θ/(2 sinθ)
    # is well-conditioned (|w| ≥ 0.028 ≫ f32 noise); inside it BOTH the
    # axis and the magnitude must come from better-conditioned parts —
    # sinθ recovered from the f32 trace via arccos carries up to tens of
    # percent relative error there.
    near_pi = cos_theta < -0.9999
    # γ(θ) = θ / (2 sinθ): even in θ ⇒ smooth series in θ² ≈ 2(1 − cosθ).
    one_minus_c = jnp.clip(1.0 - cos_theta, 0.0, 2.0)
    scale_series = 0.5 + one_minus_c / 6.0 + one_minus_c * one_minus_c * 7.0 / 90.0
    scale_arccos = theta / jnp.where(jnp.abs(sin_theta) < _EPS, _EPS, 2.0 * sin_theta)
    scale_generic = jnp.where(near_id, scale_series, scale_arccos)
    generic = w * scale_generic[..., None]
    # Near π: axis from the symmetric part diag(R) = cosθ I + (1-cosθ) aaᵀ.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    aa = jnp.clip((diag - cos_theta[..., None]) / jnp.where(
        jnp.abs(1.0 - cos_theta[..., None]) < _EPS, _EPS, 1.0 - cos_theta[..., None]
    ), 0.0, 1.0)
    axis_mag = jnp.sqrt(aa + 1e-24)  # regularised: finite d/daa at aa=0
    # Relative signs from the symmetric off-diagonals: at θ≈π,
    # R_ij + R_ji = 2(1−cosθ)·a_i·a_j, so sign(a_i·a_j) = sign(S_ij).
    # (The antisymmetric part w = 2 sinθ·a VANISHES at θ=π — per-component
    # signs read from it are noise and can flip a mixed-sign axis into a
    # perpendicular one.) Anchor on the largest |a_k| (whose S row is the
    # best-conditioned), then recover the GLOBAL sign from w, which still
    # carries the direction for θ slightly below π; at exactly π both
    # directions are the same rotation and the anchor's +1 is canonical.
    # M = R + Rᵀ − 2cosθ·I = 2(1−cosθ)·aaᵀ: every entry (diagonal included)
    # carries sign(a_i·a_j). (R + Rᵀ alone does NOT — its diagonal is
    # 2cosθ + 2(1−cosθ)a_k², negative near π whenever |a_k| < ~0.707.)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    M = R + jnp.swapaxes(R, -1, -2) - 2.0 * cos_theta[..., None, None] * eye
    k = jnp.argmax(axis_mag, axis=-1)
    row_k = jnp.take_along_axis(M, k[..., None, None], axis=-2)[..., 0, :]
    rel_sign = jnp.where(row_k >= 0.0, 1.0, -1.0)
    axis = rel_sign * axis_mag
    axis = axis / jnp.sqrt(jnp.sum(axis * axis, axis=-1, keepdims=True) + 1e-24)
    flip = jnp.where(jnp.sum(w * axis, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    # Magnitude from |w| = 2 sin(π − θ): conditioning O(1) where the
    # arccos-of-trace estimate degrades as 1/sinθ.
    theta_pi = jnp.pi - jnp.arcsin(jnp.clip(sin_theta, 0.0, 1.0 - 1e-7))
    pi_branch = flip * axis * theta_pi[..., None]
    return jnp.where(near_pi[..., None], pi_branch, generic)


def _left_jacobian(rvec: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V(φ) = I + B·K + C·K² (for SE(3) exp)."""
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    _, B, C = _sinc_coeffs(theta2)
    K = hat(rvec)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + B[..., None, None] * K + C[..., None, None] * (K @ K)


def _left_jacobian_inv(rvec: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    K = hat(rvec)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    small = theta2 < 1e-8
    safe = jnp.sqrt(jnp.where(small, jnp.ones_like(theta2), theta2))
    half = safe * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / (safe * safe),
    )
    return eye - 0.5 * K + cot_term[..., None, None] * (K @ K)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) tangent [rho, phi] → 4x4 homogeneous transform (batched)."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    R = so3_exp(phi)
    t = (_left_jacobian(phi) @ rho[..., None])[..., 0]
    return se3_matrix(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """4x4 transform → SE(3) tangent [rho, phi]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    rho = (_left_jacobian_inv(phi) @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_matrix(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble 4x4 transforms from rotations and translations (batched)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_matrix(Rt, -(Rt @ t[..., None])[..., 0])


def se3_relative(T_i: jnp.ndarray, T_j: jnp.ndarray) -> jnp.ndarray:
    """inv(T_i) @ T_j — the between-factor measurement model."""
    return se3_inverse(T_i) @ T_j


# ---------------------------------------------------------------------------
# SE(2)
# ---------------------------------------------------------------------------


def se2_matrix(params: jnp.ndarray) -> jnp.ndarray:
    """[x, y, theta] → 3x3 homogeneous transform (batched)."""
    x, y, th = params[..., 0], params[..., 1], params[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            jnp.stack([c, -s, x], axis=-1),
            jnp.stack([s, c, y], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def se2_params(T: jnp.ndarray) -> jnp.ndarray:
    """3x3 transform → [x, y, theta]."""
    return jnp.stack(
        [T[..., 0, 2], T[..., 1, 2], jnp.arctan2(T[..., 1, 0], T[..., 0, 0])],
        axis=-1,
    )


def wrap_angle(theta: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


# ---------------------------------------------------------------------------
# Sim(3) — 7-dof [rho, phi, log_scale]
# ---------------------------------------------------------------------------


def sim3_matrix(params: jnp.ndarray) -> jnp.ndarray:
    """[t(3), rvec(3), log_s] → 4x4 similarity transform [[sR, t],[0,1]]."""
    t, rvec, log_s = params[..., :3], params[..., 3:6], params[..., 6]
    R = so3_exp(rvec)
    sR = jnp.exp(log_s)[..., None, None] * R
    return se3_matrix(sR, t)


def sim3_params(S: jnp.ndarray) -> jnp.ndarray:
    """4x4 similarity → [t, rvec, log_s] (scale from row norms)."""
    A = S[..., :3, :3]
    scale = jnp.exp(jnp.log(jnp.linalg.det(A)) / 3.0)
    R = A / scale[..., None, None]
    return jnp.concatenate(
        [S[..., :3, 3], so3_log(R), jnp.log(scale)[..., None]], axis=-1
    )


def sim3_inverse(S: jnp.ndarray) -> jnp.ndarray:
    A = S[..., :3, :3]
    t = S[..., :3, 3]
    A_inv = jnp.linalg.inv(A)
    return se3_matrix(A_inv, -(A_inv @ t[..., None])[..., 0])


def rotation_angle_deg(R: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation angle of R in degrees (batched)."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos_theta))
