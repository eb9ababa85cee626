"""Deterministic factor graphs with exact autodiff Jacobians.

Parity: reference ``factor_graph.py`` — variables + anchored ids +
deterministically ordered factors, between-factors for SE(2)/SE(3)/Sim(3),
and a ``build_problem`` that yields residual/linearize callables.

TPU-first redesign: factors are *stacked into arrays* (edges (E,2) int32,
measurements (E,·)) and residuals/Jacobians evaluate for ALL factors at
once via ``vmap``/``jacfwd`` — replacing both the reference's per-factor
Python loops and its central-difference numeric Jacobians
(``factor_graph.py:302-312``) with machine-precision derivatives computed
by the compiler. Anchoring is an exact projection (masked updates), not a
soft prior.

Group models expose ``dim``, ``residual(xi, xj, meas)`` and
``compose/retract`` so the same solver drives SE(2), SE(3) and Sim(3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.core.integrity import stable_hash
from mvslam_tpu.geometry.lie import (
    se2_matrix,
    se2_params,
    se3_exp,
    se3_inverse,
    se3_log,
    se3_matrix,
    sim3_inverse,
    sim3_matrix,
    sim3_params,
    so3_exp,
    so3_log,
    wrap_angle,
)


class GroupModel:
    """Interface: parameter-vector Lie-ish group for between-factor graphs."""

    name: str = "base"
    dim: int = 0

    def residual(self, xi: jnp.ndarray, xj: jnp.ndarray, meas: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def compose(self, xi: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
        """xj = xi ∘ delta (used by pose-graph chain building)."""
        raise NotImplementedError

    def retract(self, x: jnp.ndarray, step: jnp.ndarray) -> jnp.ndarray:
        """Apply a solver step in parameter space (default: additive)."""
        return x + step


class SE2Model(GroupModel):
    """[x, y, theta]. Parity: SE2BetweenFactor (``factor_graph.py:177-222``)."""

    name = "se2"
    dim = 3

    def residual(self, xi, xj, meas):
        Ti = se2_matrix(xi)
        Tj = se2_matrix(xj)
        R = Ti[:2, :2]
        dt = R.T @ (Tj[:2, 2] - Ti[:2, 2])
        dth = xj[2] - xi[2]
        pred = jnp.concatenate([dt, wrap_angle(dth)[None]])
        err = pred - meas
        return err.at[2].set(wrap_angle(err[2]))

    def compose(self, xi, delta):
        Ti = se2_matrix(xi)
        Td = se2_matrix(delta)
        return se2_params(Ti @ Td)

    def retract(self, x, step):
        out = x + step
        return out.at[..., 2].set(wrap_angle(out[..., 2]))


class SE3Model(GroupModel):
    """[t(3), rvec(3)]. Parity: SE3BetweenFactor (``factor_graph.py:225-250``)
    but with a proper right-invariant log residual and autodiff Jacobians."""

    name = "se3"
    dim = 6

    @staticmethod
    def params_to_matrix(x: jnp.ndarray) -> jnp.ndarray:
        return se3_matrix(so3_exp(x[..., 3:6]), x[..., :3])

    @staticmethod
    def matrix_to_params(T: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([T[..., :3, 3], so3_log(T[..., :3, :3])], axis=-1)

    def residual(self, xi, xj, meas):
        Ti = self.params_to_matrix(xi)
        Tj = self.params_to_matrix(xj)
        Tm = self.params_to_matrix(meas)
        err = se3_inverse(Tm) @ (se3_inverse(Ti) @ Tj)
        return se3_log(err)

    def compose(self, xi, delta):
        return self.matrix_to_params(self.params_to_matrix(xi) @ self.params_to_matrix(delta))


class Sim3Model(GroupModel):
    """[t(3), rvec(3), log_s]. Parity: Sim3BetweenFactor (``factor_graph.py:253-284``)."""

    name = "sim3"
    dim = 7

    def residual(self, xi, xj, meas):
        Si = sim3_matrix(xi)
        Sj = sim3_matrix(xj)
        Sm = sim3_matrix(meas)
        err = sim3_inverse(Sm) @ (sim3_inverse(Si) @ Sj)
        return sim3_params(err)

    def compose(self, xi, delta):
        return sim3_params(sim3_matrix(xi) @ sim3_matrix(delta))


MODELS: Dict[str, GroupModel] = {"se2": SE2Model(), "se3": SE3Model(), "sim3": Sim3Model()}


class GraphProblem(NamedTuple):
    """Array-form factor graph, ready for the batched solvers."""

    x0: jnp.ndarray  # (N, d) initial variable values
    edges: jnp.ndarray  # (E, 2) int32
    measurements: jnp.ndarray  # (E, d)
    weights: jnp.ndarray  # (E,) per-factor scalar weights (1/sigma)
    anchor_mask: jnp.ndarray  # (N,) bool — True = variable fixed
    model_name: str

    @property
    def num_variables(self) -> int:
        return self.x0.shape[0]

    @property
    def num_factors(self) -> int:
        return self.edges.shape[0]


def make_residual_fn(model: GroupModel):
    """(x (N,d)) → (E, d) stacked residuals, weights applied."""

    def residual_all(x: jnp.ndarray, edges: jnp.ndarray, meas: jnp.ndarray, weights: jnp.ndarray):
        xi = x[edges[:, 0]]
        xj = x[edges[:, 1]]
        res = jax.vmap(model.residual)(xi, xj, meas)
        return res * weights[:, None]

    return residual_all


def make_linearize_fn(model: GroupModel):
    """(x, edges, meas, w) → (res (E,d), Ji (E,d,d), Jj (E,d,d)) via jacfwd."""

    def single(xi, xj, meas, w):
        res = model.residual(xi, xj, meas) * w
        Ji = jax.jacfwd(lambda a: model.residual(a, xj, meas) * w)(xi)
        Jj = jax.jacfwd(lambda b: model.residual(xi, b, meas) * w)(xj)
        return res, Ji, Jj

    def linearize_all(x, edges, meas, weights):
        xi = x[edges[:, 0]]
        xj = x[edges[:, 1]]
        return jax.vmap(single)(xi, xj, meas, weights)

    return linearize_all


@dataclass
class FactorGraph:
    """Host-side builder with deterministic ordering + stable digests.

    Parity: ``factor_graph.py:71-174``.
    """

    model_name: str = "se3"
    variables: Dict[int, np.ndarray] = field(default_factory=dict)
    anchors: set = field(default_factory=set)
    factors: List[Tuple[int, int, np.ndarray, float]] = field(default_factory=list)

    @property
    def model(self) -> GroupModel:
        return MODELS[self.model_name]

    def add_variable(self, vid: int, value: np.ndarray) -> None:
        value = np.asarray(value, dtype=np.float64).reshape(self.model.dim)
        self.variables[int(vid)] = value

    def anchor(self, vid: int) -> None:
        if vid not in self.variables:
            raise KeyError(f"cannot anchor unknown variable {vid}")
        self.anchors.add(int(vid))

    def add_factor(self, i: int, j: int, measurement: np.ndarray, weight: float = 1.0) -> None:
        if i not in self.variables or j not in self.variables:
            raise KeyError(f"factor references unknown variables ({i}, {j})")
        meas = np.asarray(measurement, dtype=np.float64).reshape(self.model.dim)
        self.factors.append((int(i), int(j), meas, float(weight)))

    def ordered_ids(self) -> List[int]:
        return sorted(self.variables)

    def ordered_factors(self) -> List[Tuple[int, int, np.ndarray, float]]:
        """Deterministic sort incl. stable-hash tiebreaker (parity:
        ``pose_graph.py:491-503``)."""
        return sorted(
            self.factors,
            key=lambda f: (f[0], f[1], stable_hash({"m": f[2], "w": f[3]})),
        )

    def digest(self) -> str:
        return stable_hash(
            {
                "model": self.model_name,
                "variables": {str(k): self.variables[k] for k in self.ordered_ids()},
                "anchors": sorted(self.anchors),
                "factors": [
                    {"i": i, "j": j, "meas": m, "w": w} for i, j, m, w in self.ordered_factors()
                ],
            }
        )

    def build_problem(self, dtype=jnp.float32) -> GraphProblem:
        """Parity: ``factor_graph.py:102-174`` (array form instead of closures)."""
        ids = self.ordered_ids()
        index = {vid: k for k, vid in enumerate(ids)}
        x0 = np.stack([self.variables[v] for v in ids]) if ids else np.zeros((0, self.model.dim))
        factors = self.ordered_factors()
        if factors:
            edges = np.asarray([[index[i], index[j]] for i, j, _, _ in factors], dtype=np.int32)
            meas = np.stack([m for _, _, m, _ in factors])
            weights = np.asarray([w for _, _, _, w in factors])
        else:
            edges = np.zeros((0, 2), dtype=np.int32)
            meas = np.zeros((0, self.model.dim))
            weights = np.zeros((0,))
        anchor_mask = np.asarray([vid in self.anchors for vid in ids], dtype=bool)
        return GraphProblem(
            x0=jnp.asarray(x0, dtype=dtype),
            edges=jnp.asarray(edges),
            measurements=jnp.asarray(meas, dtype=dtype),
            weights=jnp.asarray(weights, dtype=dtype),
            anchor_mask=jnp.asarray(anchor_mask),
            model_name=self.model_name,
        )
