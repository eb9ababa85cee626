"""Host (numpy) evaluation of the Lie-group ops in :mod:`geometry.lie`.

The pose-graph assembly and other host-side bookkeeping call these
per-node/per-edge in Python loops. Evaluating the jax versions eagerly
there dispatches dozens of tiny ops PER CALL to the device — milliseconds
on CPU, but ~40 ms/op over a tunneled TPU, which turned every loop-closure
graph build into minutes (observed live, r4). The device solver keeps the
jax versions; the host keeps these.

One source of truth: rather than reimplementing the (numerically subtle —
see so3_log's near-π handling) math, each function below is the SAME code
object as its jax twin, re-evaluated with ``jnp`` rebound to numpy. The
functions use only the jnp API surface that numpy implements identically
(stack/where/clip/trace/sqrt/arctan2/take_along_axis/...), which the unit
tests assert by comparing against the jax outputs to f64 roundoff (XLA's
fusion may reorder float ops by an ulp; the MATH is the same code object).
"""

from __future__ import annotations

import types

import numpy as np

from mvslam_tpu.geometry import lie as _jax_lie

_PORTED = [
    "hat",
    "_sinc_coeffs",
    "so3_exp",
    "so3_log",
    "se3_matrix",
    "se3_inverse",
    "se2_matrix",
    "se2_params",
    "wrap_angle",
    "sim3_matrix",
    "sim3_params",
    "sim3_inverse",
]

# Shared globals: ported functions must resolve each other (so3_exp → hat)
# to the numpy versions, and jnp → numpy.
_G = dict(_jax_lie.__dict__)
_G["jnp"] = np
_G["jax"] = None  # any accidental jax.* use should fail loudly, not dispatch


def _port(name: str):
    fn = getattr(_jax_lie, name)
    ported = types.FunctionType(fn.__code__, _G, name, fn.__defaults__, fn.__closure__)
    ported.__doc__ = (fn.__doc__ or "") + "\n\n(numpy host port of geometry.lie.%s)" % name
    _G[name] = ported
    return ported


hat = _port("hat")
_sinc_coeffs = _port("_sinc_coeffs")
so3_exp = _port("so3_exp")
so3_log = _port("so3_log")
se3_matrix = _port("se3_matrix")
se3_inverse = _port("se3_inverse")
se2_matrix = _port("se2_matrix")
wrap_angle = _port("wrap_angle")
se2_params = _port("se2_params")
sim3_matrix = _port("sim3_matrix")
sim3_params = _port("sim3_params")
sim3_inverse = _port("sim3_inverse")


def se3_params_to_matrix(x: np.ndarray) -> np.ndarray:
    """[t(3), rvec(3)] → (4, 4); host twin of SE3Model.params_to_matrix."""
    x = np.asarray(x, dtype=np.float64)
    return se3_matrix(so3_exp(x[..., 3:6]), x[..., :3])


def se3_matrix_to_params(T: np.ndarray) -> np.ndarray:
    """(4, 4) → [t(3), rvec(3)]; host twin of SE3Model.matrix_to_params."""
    T = np.asarray(T, dtype=np.float64)
    return np.concatenate([T[..., :3, 3], so3_log(T[..., :3, :3])], axis=-1)
