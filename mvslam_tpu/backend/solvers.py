"""Batched nonlinear least-squares solvers for factor graphs.

Parity: reference ``graph_optimization.py`` — robust losses (Huber /
Cauchy / Tukey) with per-factor IRLS weights (ref L227-273), a thread-safe
``SolverRegistry`` (ref L193-224) pre-registered with ``"scipy"`` (host
fallback) and ``"gauss_newton"`` (ref L560-654), block-sparse normal
equations with deterministic matvec (ref L326-387), block-diagonal-
preconditioned CG (ref L479-557), Levenberg damping, per-iteration
``IterationDiagnostics`` + ``ResidualHistogram`` (ref L81-113), and
conditioning diagnostics (ref L415-466).

TPU-first: the whole Gauss-Newton iteration — linearize all factors
(vmapped jacfwd), IRLS reweight, assemble, solve, retract — is ONE jitted
``lax.scan`` with static iteration count and convergence masking. Two
linear-solve paths: dense Cholesky (pose graphs comfortably fit: 6k×6k
f32 = 144 MB absolute worst case, typically ≪) and matrix-free block-CG
whose matvec is two ``segment_sum`` scatters (deterministic on TPU).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.backend.factor_graph import (
    MODELS,
    GraphProblem,
    make_linearize_fn,
    make_residual_fn,
)

# ---------------------------------------------------------------------------
# Robust losses
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RobustLoss:
    """ρ(s) on squared residual norms + IRLS weight ρ'(s).

    Parity: ``graph_optimization.py:227-273``.
    """

    name: str = "trivial"
    scale: float = 1.0

    def rho(self, s: jnp.ndarray) -> jnp.ndarray:
        c2 = self.scale * self.scale
        z = s / c2
        if self.name == "trivial":
            return s
        if self.name == "huber":
            return c2 * jnp.where(z <= 1.0, z, 2.0 * jnp.sqrt(jnp.maximum(z, 1.0)) - 1.0)
        if self.name == "cauchy":
            return c2 * jnp.log1p(z)
        if self.name == "tukey":
            return c2 / 3.0 * jnp.where(z <= 1.0, 1.0 - (1.0 - z) ** 3, 1.0)
        raise ValueError(f"unknown loss {self.name!r}")

    def weight(self, s: jnp.ndarray) -> jnp.ndarray:
        """IRLS weight = dρ/ds (parity: ``_robust_weight`` L267-273)."""
        c2 = self.scale * self.scale
        z = s / c2
        if self.name == "trivial":
            return jnp.ones_like(s)
        if self.name == "huber":
            return jnp.where(z <= 1.0, 1.0, 1.0 / jnp.sqrt(jnp.maximum(z, 1.0)))
        if self.name == "cauchy":
            return 1.0 / (1.0 + z)
        if self.name == "tukey":
            return jnp.where(z <= 1.0, (1.0 - z) ** 2, 0.0)
        raise ValueError(f"unknown loss {self.name!r}")


# ---------------------------------------------------------------------------
# Configs / results
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SolverConfig:
    """Parity: ``graph_optimization.py`` SolverConfig (L38-79)."""

    max_iterations: int = 20
    damping: float = 1e-6
    loss: str = "huber"
    loss_scale: float = 1.0
    method: str = "cholesky"  # "cholesky" | "cg"
    cg_iterations: int = 50
    cg_tolerance: float = 1e-8
    step_tolerance: float = 1e-8
    gradient_tolerance: float = 1e-10
    histogram_bins: int = 10


@dataclass
class IterationDiagnostics:
    """Parity: ``graph_optimization.py:81-113``."""

    iteration: int
    cost: float
    gradient_norm: float
    step_norm: float


@dataclass
class ResidualHistogram:
    edges: List[float]
    counts: List[int]

    def to_dict(self) -> Dict:
        return {"edges": self.edges, "counts": self.counts}


@dataclass
class SolverResult:
    x: np.ndarray  # (N, d)
    initial_cost: float
    final_cost: float
    iterations: int
    converged: bool
    status: int  # 0 converged, 1 max-iter, -2 conditioning fallback
    diagnostics: List[IterationDiagnostics] = field(default_factory=list)
    residual_histogram: Optional[ResidualHistogram] = None


class _ScanOutputs(NamedTuple):
    cost: jnp.ndarray
    grad_norm: jnp.ndarray
    step_norm: jnp.ndarray
    active: jnp.ndarray


# ---------------------------------------------------------------------------
# Jitted Gauss-Newton core
# ---------------------------------------------------------------------------


def _scatter_dense(H, b, edges, Ji, Jj, res, w_irls, anchor_free, damping, d):
    """Assemble dense damped normal equations with anchors projected out."""
    A = Ji * w_irls[:, None, None]
    B = Jj * w_irls[:, None, None]
    HtAA = jnp.einsum("eri,erj->eij", Ji, A)
    HtAB = jnp.einsum("eri,erj->eij", Ji, B)
    HtBA = jnp.einsum("eri,erj->eij", Jj, A)
    HtBB = jnp.einsum("eri,erj->eij", Jj, B)
    gi = jnp.einsum("eri,er->ei", A, res)
    gj = jnp.einsum("eri,er->ei", B, res)

    idx = jnp.arange(d)
    def rows(e):
        return e[:, None, None] * d + idx[None, :, None]
    def cols(e):
        return e[:, None, None] * d + idx[None, None, :]

    ei, ej = edges[:, 0], edges[:, 1]
    H = H.at[rows(ei), cols(ei)].add(HtAA)
    H = H.at[rows(ei), cols(ej)].add(HtAB)
    H = H.at[rows(ej), cols(ei)].add(HtBA)
    H = H.at[rows(ej), cols(ej)].add(HtBB)
    b = b.at[ei[:, None] * d + idx[None, :]].add(-gi)
    b = b.at[ej[:, None] * d + idx[None, :]].add(-gj)

    free = anchor_free  # (N*d,) 1.0 where free, 0.0 where anchored
    H = H * free[:, None] * free[None, :]
    H = H + jnp.diag(jnp.where(free > 0.5, damping, 1.0))
    b = b * free
    return H, b


def _cg_solve(matvec, b, precond, iterations, tol):
    """Preconditioned CG (parity: ``graph_optimization.py:507-557``)."""
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0

    def body(carry, _):
        x, r, z, p, rz = carry
        Ap = matvec(p)
        pAp = jnp.vdot(p, Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30, pAp)
        x_new = x + alpha * p
        r_new = r - alpha * Ap
        z_new = precond(r_new)
        rz_new = jnp.vdot(r_new, z_new)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p_new = z_new + beta * p
        # Freeze once converged (fixed trip count keeps shapes static).
        stop = jnp.linalg.norm(r) < tol
        keep = lambda new, old: jnp.where(stop, old, new)
        return (
            keep(x_new, x),
            keep(r_new, r),
            keep(z_new, z),
            keep(p_new, p),
            keep(rz_new, rz),
        ), None

    (x, *_), _ = jax.lax.scan(body, (x0, r0, z0, p0, jnp.vdot(r0, z0)), None, length=iterations)
    return x


@partial(jax.jit, static_argnames=("model_name", "config"))
def gauss_newton_core_packed(
    x0: jnp.ndarray,
    edges: jnp.ndarray,
    measurements: jnp.ndarray,
    weights: jnp.ndarray,
    anchor_mask: jnp.ndarray,
    model_name: str,
    config: SolverConfig,
) -> jnp.ndarray:
    """:func:`gauss_newton_core` with every host-bound output in ONE flat
    f32 buffer — one launch + one fetch per solve.

    The host wrapper used to pull eight separate device values (x, final
    cost, per-iteration cost/grad/step/active, histogram edges/counts);
    on a network-tunneled chip at ~135 ms per fetch that made each
    loop-closure pose-graph solve ~1.5 s of pure transfer latency
    (10 accepted loops on the committed revisit scene ⇒ the full-system
    bottleneck after the BA/loop fusions). Layout:
    ``[final_cost, x(n·d), cost(I), grad(I), step(I), active(I),
    bin_edges(B+1), counts(B)]`` with I = max_iterations, B =
    histogram_bins — all static, so the host slices by arithmetic.
    """
    x_final, final_cost, outs, bin_edges, counts = gauss_newton_core(
        x0, edges, measurements, weights, anchor_mask, model_name, config
    )
    parts = [
        final_cost.reshape(1),
        x_final.reshape(-1),
        outs.cost,
        outs.grad_norm,
        outs.step_norm,
        outs.active.astype(jnp.float32),
        bin_edges,
        counts.astype(jnp.float32),
    ]
    return jnp.concatenate([p.astype(jnp.float32) for p in parts])


@partial(jax.jit, static_argnames=("model_name", "config"))
def gauss_newton_core(
    x0: jnp.ndarray,
    edges: jnp.ndarray,
    measurements: jnp.ndarray,
    weights: jnp.ndarray,
    anchor_mask: jnp.ndarray,
    model_name: str,
    config: SolverConfig,
):
    """Full GN/LM optimisation as one device program (lax.scan)."""
    model = MODELS[model_name]
    d = model.dim
    n = x0.shape[0]
    residual_all = make_residual_fn(model)
    linearize_all = make_linearize_fn(model)
    loss = RobustLoss(config.loss, config.loss_scale)

    anchor_free = jnp.where(
        jnp.repeat(anchor_mask, d), 0.0, 1.0
    ).astype(x0.dtype)

    def cost_of(x):
        res = residual_all(x, edges, measurements, weights)
        s = jnp.sum(res * res, axis=-1)
        return 0.5 * jnp.sum(loss.rho(s))

    def step(carry, _):
        x, done = carry
        res, Ji, Jj = linearize_all(x, edges, measurements, weights)
        s = jnp.sum(res * res, axis=-1)
        w_irls = loss.weight(s)
        cost = 0.5 * jnp.sum(loss.rho(s))

        if config.method == "cholesky":
            H = jnp.zeros((n * d, n * d), dtype=x.dtype)
            b = jnp.zeros((n * d,), dtype=x.dtype)
            H, b = _scatter_dense(
                H, b, edges, Ji, Jj, res, w_irls, anchor_free, config.damping, d
            )
            delta = jax.scipy.linalg.solve(H, b, assume_a="pos")
        else:
            A = Ji * w_irls[:, None, None]
            B = Jj * w_irls[:, None, None]
            ei, ej = edges[:, 0], edges[:, 1]
            # Block-diagonal preconditioner blocks.
            Dii = jax.ops.segment_sum(jnp.einsum("eri,erj->eij", Ji, A), ei, num_segments=n)
            Djj = jax.ops.segment_sum(jnp.einsum("eri,erj->eij", Jj, B), ej, num_segments=n)
            Dblocks = Dii + Djj + config.damping * jnp.eye(d, dtype=x.dtype)
            Dinv = jnp.linalg.inv(Dblocks)

            free_nd = anchor_free.reshape(n, d)

            def matvec(v_flat):
                v = (v_flat * anchor_free).reshape(n, d)
                vi = v[ei]
                vj = v[ej]
                Jv = jnp.einsum("erj,ej->er", Ji, vi) + jnp.einsum("erj,ej->er", Jj, vj)
                Jv = Jv * w_irls[:, None]
                yi = jnp.einsum("eri,er->ei", Ji, Jv)
                yj = jnp.einsum("eri,er->ei", Jj, Jv)
                y = jax.ops.segment_sum(yi, ei, num_segments=n) + jax.ops.segment_sum(
                    yj, ej, num_segments=n
                )
                y = y * free_nd + config.damping * v
                # Anchored coordinates act as identity.
                y = y + (v_flat.reshape(n, d) * (1.0 - free_nd))
                return y.reshape(-1)

            def precond(r_flat):
                r = r_flat.reshape(n, d)
                z = jnp.einsum("nij,nj->ni", Dinv, r)
                z = z * free_nd + r * (1.0 - free_nd)
                return z.reshape(-1)

            gi = jnp.einsum("eri,er->ei", A, res)
            gj = jnp.einsum("eri,er->ei", B, res)
            b = -(
                jax.ops.segment_sum(gi, ei, num_segments=n)
                + jax.ops.segment_sum(gj, ej, num_segments=n)
            )
            b = (b * free_nd).reshape(-1)
            delta = _cg_solve(matvec, b, precond, config.cg_iterations, config.cg_tolerance)

        grad_norm = jnp.linalg.norm(b)
        step_vec = (delta * anchor_free).reshape(n, d)
        x_new = jax.vmap(model.retract)(x, step_vec)
        # Accept only if cost improves (simple LM-style guard).
        new_cost = cost_of(x_new)
        improved = new_cost < cost
        x_next = jnp.where(improved & ~done, x_new, x)
        step_norm = jnp.linalg.norm(step_vec) * (improved & ~done)
        now_done = done | (step_norm < config.step_tolerance) | (grad_norm < config.gradient_tolerance)
        outs = _ScanOutputs(
            cost=cost, grad_norm=grad_norm, step_norm=step_norm, active=~done
        )
        return (x_next, now_done), outs

    (x_final, _), outs = jax.lax.scan(
        step, (x0, jnp.asarray(False)), None, length=config.max_iterations
    )
    final_cost = cost_of(x_final)

    res = residual_all(x_final, edges, measurements, weights)
    rn = jnp.linalg.norm(res, axis=-1)
    hist_max = jnp.maximum(jnp.max(rn), 1e-12)
    bin_edges = jnp.linspace(0.0, hist_max * (1.0 + 1e-6), config.histogram_bins + 1)
    bin_idx = jnp.clip(
        jnp.searchsorted(bin_edges, rn, side="right") - 1, 0, config.histogram_bins - 1
    )
    counts = jax.ops.segment_sum(
        jnp.ones_like(rn), bin_idx, num_segments=config.histogram_bins
    )
    return x_final, final_cost, outs, bin_edges, counts


# Bucket sizes for the jitted GN core: pose graphs GROW (every accepted
# loop closure re-optimises a graph with more nodes/edges), and a jit
# keyed on exact (N, E) recompiles on every size — measured live r4 as
# the dominant cost of the full offline pipeline (each tunnel compile is
# seconds, each loop acceptance a new size). Padding to the next
# power-of-two bucket makes sizes within a 2x band share ONE compiled
# program: padded variables are anchored (identity rows), padded edges
# carry weight 0 — and weights scale both residuals and Jacobians
# (factor_graph.make_*_fn), so padding contributes exactly zero to cost,
# gradient, and steps (agreement with the unpadded program is ULP-tight,
# not bitwise: the larger dense-solve/segment_sum shapes reduce in a
# different order — measured ≤2.4e-7 over 12 GN iterations, see
# tests/test_backend_solvers.py::TestBucketPadding). Same mechanism the
# sharded solvers already use (parallel/mesh.py zero-weight factor
# padding).
_BUCKET_MIN = 8


def _bucket(n: int) -> int:
    return max(_BUCKET_MIN, 1 << (int(n) - 1).bit_length())


def _pad_problem(problem: GraphProblem):
    """Pad (variables, edges) up to bucket sizes; returns (problem, e_pad)."""
    n, e = problem.num_variables, problem.num_factors
    n_pad = _bucket(n) - n
    e_pad = _bucket(e) - e
    if not (n_pad or e_pad):
        return problem, 0
    d = problem.x0.shape[1]
    x0 = jnp.concatenate([jnp.asarray(problem.x0), jnp.zeros((n_pad, d), jnp.asarray(problem.x0).dtype)])
    anchor = jnp.concatenate(
        [jnp.asarray(problem.anchor_mask, bool), jnp.ones((n_pad,), bool)]
    )
    edges = jnp.concatenate(
        [jnp.asarray(problem.edges, jnp.int32), jnp.zeros((e_pad, 2), jnp.int32)]
    )
    meas = jnp.concatenate(
        [jnp.asarray(problem.measurements), jnp.zeros((e_pad, d), jnp.asarray(problem.measurements).dtype)]
    )
    weights = jnp.concatenate(
        [jnp.asarray(problem.weights), jnp.zeros((e_pad,), jnp.asarray(problem.weights).dtype)]
    )
    return (
        GraphProblem(x0, edges, meas, weights, anchor, problem.model_name),
        e_pad,
    )


def solve_problem(problem: GraphProblem, config: SolverConfig) -> SolverResult:
    """Host wrapper: run the jitted core, package diagnostics."""
    if problem.num_factors == 0 or problem.num_variables == 0:
        x = np.asarray(problem.x0)
        return SolverResult(x, 0.0, 0.0, 0, True, 0)
    n_real = problem.num_variables
    padded, e_pad = _pad_problem(problem)
    buf = np.asarray(  # ONE fetch for the whole solve (gauss_newton_core_packed)
        gauss_newton_core_packed(
            padded.x0,
            padded.edges,
            padded.measurements,
            padded.weights,
            padded.anchor_mask,
            padded.model_name,
            config,
        )
    )
    d = MODELS[padded.model_name].dim
    n_pad = padded.x0.shape[0]
    I, B = config.max_iterations, config.histogram_bins
    final_cost = buf[0]
    off = 1
    x_final = buf[off : off + n_pad * d].reshape(n_pad, d)[:n_real]
    off += n_pad * d
    cost = buf[off : off + I]; off += I
    grad = buf[off : off + I]; off += I
    step = buf[off : off + I]; off += I
    active = buf[off : off + I] > 0.5; off += I
    bin_edges = buf[off : off + B + 1]; off += B + 1
    counts = buf[off : off + B]
    iters = int(active.sum())
    diagnostics = [
        IterationDiagnostics(i, float(cost[i]), float(grad[i]), float(step[i]))
        for i in range(len(cost))
        if active[i]
    ]
    converged = iters < config.max_iterations
    counts = np.asarray(counts).copy()
    if e_pad:
        # Padded zero-weight edges have residual 0 — they land in bin 0;
        # keep the histogram about REAL factors.
        counts[0] = max(0.0, counts[0] - e_pad)
    hist = ResidualHistogram(
        edges=[float(v) for v in np.asarray(bin_edges)],
        counts=[int(v) for v in counts],
    )
    return SolverResult(
        x=np.asarray(x_final),
        initial_cost=float(cost[0]) if len(cost) else 0.0,
        final_cost=float(final_cost),
        iterations=iters,
        converged=converged,
        status=0 if converged else 1,
        diagnostics=diagnostics,
        residual_histogram=hist,
    )


# ---------------------------------------------------------------------------
# Conditioning diagnostics (pre-solve gate support)
# ---------------------------------------------------------------------------


def conditioning_stats(problem: GraphProblem, damping: float = 0.0) -> Dict[str, float]:
    """Condition number + min diagonal of the Gauss-Newton Hessian at x0.

    Parity: ``graph_optimization.py:415-466`` /
    ``optimization_control_plane.py:597-646``.
    """
    model = MODELS[problem.model_name]
    d = model.dim
    n = problem.num_variables
    if problem.num_factors == 0 or n == 0:
        return {"condition_number": 1.0, "min_diagonal": 1.0}
    linearize_all = make_linearize_fn(model)
    res, Ji, Jj = linearize_all(problem.x0, problem.edges, problem.measurements, problem.weights)
    anchor_free = jnp.where(jnp.repeat(problem.anchor_mask, d), 0.0, 1.0).astype(problem.x0.dtype)
    H = jnp.zeros((n * d, n * d), dtype=problem.x0.dtype)
    b = jnp.zeros((n * d,), dtype=problem.x0.dtype)
    w = jnp.ones(problem.num_factors, dtype=problem.x0.dtype)
    H, _ = _scatter_dense(H, b, problem.edges, Ji, Jj, res, w, anchor_free, damping, d)
    Hn = np.asarray(H)
    diag = np.diag(Hn)
    try:
        cond = float(np.linalg.cond(Hn))
    except np.linalg.LinAlgError:
        cond = float("inf")
    return {"condition_number": cond, "min_diagonal": float(diag.min()) if diag.size else 0.0}


# ---------------------------------------------------------------------------
# Solver registry (+ SciPy host fallback)
# ---------------------------------------------------------------------------


class Solver:
    name = "base"

    def solve(self, problem: GraphProblem, config: SolverConfig) -> SolverResult:
        raise NotImplementedError


class GaussNewtonSolver(Solver):
    """TPU-native batched GN/LM. Parity: ``graph_optimization.py:560-654``."""

    name = "gauss_newton"

    def solve(self, problem: GraphProblem, config: SolverConfig) -> SolverResult:
        return solve_problem(problem, config)


class ScipyLeastSquaresSolver(Solver):
    """Host fallback via scipy.optimize.least_squares.

    Parity: ``graph_optimization.py:276-309``. Gated import: scipy is an
    optional host dependency.
    """

    name = "scipy"

    def solve(self, problem: GraphProblem, config: SolverConfig) -> SolverResult:
        from scipy.optimize import least_squares

        model = MODELS[problem.model_name]
        d = model.dim
        n = problem.num_variables
        residual_all = make_residual_fn(model)
        edges = problem.edges
        meas = problem.measurements
        weights = problem.weights
        anchor = np.asarray(problem.anchor_mask)
        x0 = np.asarray(problem.x0, dtype=np.float64)

        free_idx = np.where(~np.repeat(anchor, d))[0]

        def unpack(z):
            x = x0.reshape(-1).copy()
            x[free_idx] = z
            return x.reshape(n, d)

        def fun(z):
            res = residual_all(jnp.asarray(unpack(z), dtype=jnp.float32), edges, meas, weights)
            return np.asarray(res, dtype=np.float64).reshape(-1)

        z0 = x0.reshape(-1)[free_idx]
        initial = fun(z0)
        initial_cost = 0.5 * float(initial @ initial)
        out = least_squares(
            fun,
            z0,
            loss="huber" if config.loss == "huber" else "linear",
            f_scale=config.loss_scale,
            max_nfev=config.max_iterations * 10,
        )
        x_final = unpack(out.x)
        return SolverResult(
            x=x_final,
            initial_cost=initial_cost,
            final_cost=float(out.cost),
            iterations=int(out.nfev),
            converged=bool(out.success),
            status=0 if out.success else 1,
        )


class SolverRegistry:
    """Thread-safe name → solver registry.

    Parity: ``graph_optimization.py:193-224``.
    """

    def __init__(self) -> None:
        self._solvers: Dict[str, Solver] = {}
        self._lock = threading.Lock()

    def register(self, solver: Solver, name: Optional[str] = None) -> None:
        with self._lock:
            self._solvers[name or solver.name] = solver

    def get(self, name: str) -> Solver:
        with self._lock:
            if name not in self._solvers:
                raise KeyError(f"unknown solver {name!r}; known: {sorted(self._solvers)}")
            return self._solvers[name]

    def names(self) -> List[str]:
        with self._lock:
            return sorted(self._solvers)


DEFAULT_REGISTRY = SolverRegistry()
DEFAULT_REGISTRY.register(GaussNewtonSolver())
DEFAULT_REGISTRY.register(ScipyLeastSquaresSolver())
