"""User-facing API: fit / predict / model object.

Mirrors the reference product surface — the R S3 class `mvtv`
(rcpp-code/MultivarTV/R/MultivarTV.R:7-175) over the C++ CV driver
mbs_impl (rcpp-code .../solvers.cpp:305-376) — as a Python dataclass with
methods.  Output fields use the reference's names and flat vector layout
(axis-0-fastest linearization) so users of the reference can map results
1:1; lattice-shaped arrays are also exposed for TPU-native workflows.

All device compute routes through module-level jitted cores (static args =
the frozen config dataclasses + lattice dims): on TPU, eager op-by-op
dispatch costs a compilation round-trip per primitive, so the whole fit —
operator build, lambda grid, CV folds, final path — executes as a handful
of fused XLA programs, cached across calls with the same static shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multivartv_tpu.config import (
    CVConfig,
    MeshConfig,
    PathConfig,
    SolverConfig,
    DEFAULT_CV,
    DEFAULT_MESH,
    DEFAULT_PATH,
    DEFAULT_SOLVER,
)
from multivartv_tpu import mesh as mesh_lib
from multivartv_tpu.mesh import MeshSpec
from multivartv_tpu.ops import interp as interp_ops
from multivartv_tpu.solver import cv as cv_lib
from multivartv_tpu.solver import path as path_lib
from multivartv_tpu.solver.admm import admm_solve, initial_state
from multivartv_tpu.solver.problem import Operators, Problem, build_operators, build_problem


@dataclasses.dataclass
class MVTVModel:
    """Fitted model.  Field names follow the reference output list
    (solvers.cpp:368-373 + R-side additions, MultivarTV.R:51-58)."""

    data: np.ndarray
    y: np.ndarray
    m: tuple
    mesh: np.ndarray              # (ntheta, p) knot coords, reference order
    theta_hat: np.ndarray         # (ntheta,) reference (axis-0-fastest) order
    theta_lattice: np.ndarray     # p-dim lattice array
    fitted: np.ndarray            # (n,) fitted values at best lambda
    residuals: np.ndarray         # y - fitted
    lambdas: np.ndarray           # (n_lambda,) descending
    models: List[dict]            # per-lambda {lambda, mse, theta_hat, fitted}
    lambda_minmse_ind: int        # 0-based index into lambdas
    lambda_minmse: float
    lambda_1se: float
    cv_mses: np.ndarray           # (n_lambda,) mean CV MSE (or path MSE, folds=1)
    mesh_spec: MeshSpec = dataclasses.field(repr=False, default=None)
    solver_config: SolverConfig = dataclasses.field(repr=False, default=DEFAULT_SOLVER)

    def predict(self, data=None, mesh=None) -> np.ndarray:
        """Fitted values for new data (predict.mvtv, MultivarTV.R:172-175;
        mbspredict, MultivarTV.cpp:55-71).  data=None returns stored
        fitted values.  mesh: optional explicit (ntheta, p) knot-point
        matrix overriding the stored mesh for the nearest-knot assignment
        (reference mesh argument, MultivarTV.cpp:61-66) — rows index
        theta_hat (reference flat order) directly."""
        if data is None:
            return self.fitted
        data = np.asarray(data, np.float64)
        if data.ndim == 1:
            data = data[:, None]
        if mesh is not None:
            pts = np.asarray(mesh, np.float64)
            if pts.ndim == 1:
                pts = pts[:, None]
            theta_hat = jnp.asarray(self.theta_hat)
            idx = interp_ops.nearest_pointcloud_indices(
                jnp.asarray(data, theta_hat.dtype),
                jnp.asarray(pts, theta_hat.dtype))
            return np.asarray(theta_hat[idx])
        theta = jnp.asarray(self.theta_lattice)
        fits = _jit_predict(self.mesh_spec, theta, jnp.asarray(data, theta.dtype))
        return np.asarray(fits)

    def plot(self, **kwargs):
        from multivartv_tpu import plotting
        return plotting.plot_model(self, **kwargs)

    def plot_residuals(self, **kwargs):
        from multivartv_tpu import plotting
        return plotting.plot_residuals(self, **kwargs)


# ---------------------------------------------------------------------------
# Jitted compute cores.  Static args: frozen config dataclasses (hashable)
# and fold counts.  Pytree args: MeshSpec / Operators / Problem.
# ---------------------------------------------------------------------------

@jax.jit
def _jit_predict(spec: MeshSpec, theta: jax.Array, data: jax.Array):
    idx = interp_ops.flat_knot_indices(spec, data)
    return interp_ops.gather_fitted(theta, idx)


@partial(jax.jit, static_argnames=("cfg",))
def _jit_setup(spec: MeshSpec, data: jax.Array, y: jax.Array, cfg: SolverConfig):
    ops = build_operators(spec.m, spec.deltas.astype(y.dtype), cfg, y.dtype)
    problem = build_problem(spec, data, y, dtype=y.dtype)
    return ops, problem


@partial(jax.jit, static_argnames=("cfg", "pcfg"))
def _jit_lambda_grid(ops: Operators, problem: Problem, deltas: jax.Array,
                     cfg: SolverConfig, pcfg: PathConfig):
    lmax = path_lib.lam_max(ops, problem, pcfg, deltas)
    return lmax, path_lib.create_lambdas(lmax, pcfg)


@partial(jax.jit, static_argnames=("cfg", "pcfg", "progress"))
def _jit_final_path(ops: Operators, problem: Problem, lambdas: jax.Array,
                    ftrue: jax.Array, cfg: SolverConfig, pcfg: PathConfig,
                    progress: bool = False):
    res = path_lib.solve_path(ops, problem, lambdas, cfg, pcfg, ftrue=ftrue,
                              progress=progress)
    return res


@partial(jax.jit, static_argnames=("cfg", "pcfg", "cvcfg"))
def _jit_cv(ops: Operators, spec: MeshSpec, data: jax.Array, y: jax.Array,
            lambdas: jax.Array, cfg: SolverConfig, pcfg: PathConfig,
            cvcfg: CVConfig):
    labels = cv_lib.kfold_indices(y.shape[0], cvcfg.folds, cvcfg.seed)
    problems = cv_lib.fold_problems(spec, data, y, labels, cvcfg.folds, y.dtype)
    res = cv_lib.cross_validate(ops, problems, lambdas, cfg, pcfg, cvcfg)
    return res.mean_mse, res.fold_test_mse


@partial(jax.jit, static_argnames=("cfg",))
def _jit_fresh_solve(ops: Operators, problem: Problem, lam: jax.Array,
                     rho0: jax.Array, cfg: SolverConfig):
    """Cold solve at one lambda with path-style inits (mbs_fit_optimal,
    solvers.cpp:261-274: theta=mean(y), u=0, rho=lambdas[0]/5)."""
    state = initial_state(ops, problem, rho0)
    state = admm_solve(ops, problem, lam, state, cfg)
    fitted = interp_ops.gather_fitted(state.theta, problem.flat_idx)
    return state.theta, fitted


@partial(jax.jit, static_argnames=("cfg",))
def _jit_single(ops: Operators, problem: Problem, lam: jax.Array,
                rho0: jax.Array, cfg: SolverConfig):
    state = initial_state(ops, problem, rho0)
    state = admm_solve(ops, problem, lam, state, cfg)
    fitted = interp_ops.gather_fitted(state.theta, problem.flat_idx)
    return state.theta, fitted, state.counter


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

def _default_m(n: int, p: int) -> tuple:
    """floor(sqrt(N)) knots per axis (mvtv.default, MultivarTV.R:44-48)."""
    return tuple([int(np.floor(np.sqrt(n)))] * p)


def _resolve_mesh(data, y, m, mesh, mesh_cfg: MeshConfig, dtype) -> MeshSpec:
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    n, p = data.shape
    if m is None:
        m = _default_m(n, p)
    else:
        m = tuple(int(v) for v in np.ravel(m))
    if mesh is not None:
        try:
            return mesh_lib.mesh_spec_from_points(mesh, m)
        except ValueError:
            # Arbitrary point-cloud mesh (reference gen_mesh pass-through,
            # solvers.cpp:233-244): rows are lattice nodes by *index*;
            # deltas come from the data ranges (create_deltas,
            # utils.cpp:256-263).
            eps = mesh_cfg.eps
            deltas = []
            for j in range(p):
                rng = data[:, j].max() - data[:, j].min() + 2 * eps
                deltas.append(rng / m[j] if mesh_cfg.delta_mode == "cpp"
                              else rng / max(m[j] - 1, 1))
            return mesh_lib.PointCloudMeshSpec(
                points=jnp.asarray(np.asarray(mesh), dtype),
                deltas=jnp.asarray(deltas, dtype),
                m=m,
            )
    # Host-side mesh build (cheap: p linspaces) keeps knots concrete for
    # reporting; float64 on host, cast at the jit boundary.
    eps = mesh_cfg.eps
    knots = []
    deltas = []
    for j in range(p):
        lo, hi = data[:, j].min() - eps, data[:, j].max() + eps
        knots.append(jnp.asarray(np.linspace(lo, hi, m[j]), dtype))
        rng = hi - lo
        deltas.append(rng / m[j] if mesh_cfg.delta_mode == "cpp"
                      else rng / max(m[j] - 1, 1))
    return MeshSpec(knots=tuple(knots), deltas=jnp.asarray(deltas, dtype),
                    m=m, regular=True)


def _mesh_points_np(spec) -> np.ndarray:
    if isinstance(spec, mesh_lib.PointCloudMeshSpec):
        return np.asarray(spec.points)
    return np.asarray(mesh_lib.lattice_points(spec.knots, spec.m))


def mvtv(data, y, m=None, mesh=None, n_lambda: int = 100, ftrue=None,
         lambdas=None, folds: int = 5, verbose: bool = False,
         solver_config: SolverConfig = DEFAULT_SOLVER,
         path_config: Optional[PathConfig] = None,
         cv_config: Optional[CVConfig] = None,
         mesh_config: MeshConfig = DEFAULT_MESH,
         dtype=jnp.float32) -> MVTVModel:
    """Cross-validated multivariate TV denoising fit.

    Follows mbs_impl (solvers.cpp:305-376): build mesh/operators once,
    compute the lambda grid from the full data, run the warm-started path
    per fold (batched here), pick the mean-CV-MSE-minimizing lambda, refit
    on the full data.
    """
    data_np = np.asarray(data, np.float64)
    if data_np.ndim == 1:
        data_np = data_np[:, None]
    y_np = np.asarray(y, np.float64).reshape(-1)
    n = y_np.shape[0]

    if path_config is None:
        path_config = PathConfig(n_lambda=n_lambda)
    elif path_config.n_lambda != n_lambda and n_lambda != 100:
        path_config = dataclasses.replace(path_config, n_lambda=n_lambda)
    if cv_config is None:
        cv_config = CVConfig(folds=folds)
    elif cv_config.folds != folds and folds != 5:
        cv_config = dataclasses.replace(cv_config, folds=folds)
    folds = cv_config.folds

    spec = _resolve_mesh(data_np, y_np, m, mesh, mesh_config, dtype)
    data_j = jnp.asarray(data_np, dtype)
    y_j = jnp.asarray(y_np, dtype)

    ops, problem = _jit_setup(spec, data_j, y_j, solver_config)

    if lambdas is None:
        lmax, lambda_grid = _jit_lambda_grid(
            ops, problem, spec.deltas.astype(dtype), solver_config, path_config)
        if verbose:
            print(f"Lambda_max = {float(lmax):.6g}")
    else:
        lambda_grid = jnp.asarray(lambdas, dtype).reshape(-1)
        path_config = dataclasses.replace(
            path_config, n_lambda=int(lambda_grid.shape[0]))

    ftrue_j = y_j if ftrue is None else jnp.asarray(ftrue, dtype).reshape(-1)

    if folds == 1:
        # folds==1 bypass (solvers.cpp:328-335): path on the full data,
        # per-lambda MSE vs y, argmin, then a *fresh* solve at the best
        # lambda (mbs_fit_optimal, solvers.cpp:261-274).
        final_path = _jit_final_path(
            ops, problem, lambda_grid, ftrue_j, solver_config, path_config,
            progress=verbose)
        mse_vs_y = _per_lambda_mse_vs_y(final_path, problem)
        cv_mses = np.asarray(mse_vs_y)
        best_ind = int(np.argmin(cv_mses))
        best_theta, best_fitted = _jit_fresh_solve(
            ops, problem, lambda_grid[best_ind], lambda_grid[0] / 5.0,
            solver_config)
    else:
        cv_mean, _cv_mat = _jit_cv(
            ops, spec, data_j, y_j, lambda_grid, solver_config, path_config,
            cv_config)
        cv_mses = np.asarray(cv_mean)
        best_ind = int(np.argmin(cv_mses))
        final_path = _jit_final_path(
            ops, problem, lambda_grid, ftrue_j, solver_config, path_config,
            progress=verbose)
        if final_path.thetas is not None:
            best_theta = final_path.thetas[best_ind]
            best_fitted = final_path.fitted[best_ind]
        else:
            best_theta, best_fitted = _jit_fresh_solve(
                ops, problem, lambda_grid[best_ind], lambda_grid[0] / 5.0,
                solver_config)

    if verbose:
        print(f"Best lambda = {float(lambda_grid[best_ind]):.6g}")

    return _assemble_model(
        data_np, y_np, spec, problem, final_path, lambda_grid,
        best_ind, best_theta, best_fitted, cv_mses, solver_config)


def _per_lambda_mse_vs_y(path_res: path_lib.PathResult, problem: Problem):
    if path_res.fitted is not None:
        diffs = path_res.fitted - problem.y[None, :]
        return jnp.mean(jnp.square(diffs), axis=1)
    return path_res.train_mse


def _assemble_model(data_np, y_np, spec, problem, final_path,
                    lambda_grid, best_ind, best_theta, best_fitted, cv_mses,
                    solver_config) -> MVTVModel:
    theta_lattice = np.asarray(best_theta)
    theta_flat_ref = np.asarray(mesh_lib.flatten_ref_order(jnp.asarray(best_theta)))
    fitted = np.asarray(best_fitted)
    residuals = y_np - fitted
    lambdas_np = np.asarray(lambda_grid)

    models = []
    n_lambda = lambdas_np.shape[0]
    path_mses = np.asarray(final_path.train_mse)
    path_thetas = (None if final_path.thetas is None
                   else np.asarray(jax.vmap(mesh_lib.flatten_ref_order)(final_path.thetas)))
    path_fitted = (None if final_path.fitted is None
                   else np.asarray(final_path.fitted))
    path_iters = np.asarray(final_path.iters)
    for i in range(n_lambda):
        entry = {
            "lambda": float(lambdas_np[i]),
            "mse": float(path_mses[i]),
            "iters": int(path_iters[i]),
        }
        if path_thetas is not None:
            entry["theta_hat"] = path_thetas[i]
            entry["fitted"] = path_fitted[i]
        models.append(entry)

    # lambda.1se (mvtv.default, MultivarTV.R:55-58): sd over the CV curve /
    # sqrt(n_lambda); the *last* candidate with cv <= min + se wins (the
    # smallest lambda on the descending grid — reference behavior).
    se1 = float(np.std(cv_mses, ddof=1) / np.sqrt(n_lambda)) if n_lambda > 1 else 0.0
    right = cv_mses[best_ind] + se1
    cands = np.nonzero(cv_mses <= right)[0]
    lambda_1se = float(lambdas_np[cands[-1]]) if cands.size else float(lambdas_np[best_ind])

    return MVTVModel(
        data=data_np,
        y=y_np,
        m=spec.m,
        mesh=_mesh_points_np(spec),
        theta_hat=theta_flat_ref,
        theta_lattice=theta_lattice,
        fitted=fitted,
        residuals=residuals,
        lambdas=lambdas_np,
        models=models,
        lambda_minmse_ind=best_ind,
        lambda_minmse=float(lambdas_np[best_ind]),
        lambda_1se=lambda_1se,
        cv_mses=cv_mses,
        mesh_spec=spec,
        solver_config=solver_config,
    )


def mvtv_one(data, y, m=None, mesh=None, lam=None,
             solver_config: SolverConfig = DEFAULT_SOLVER,
             path_config: PathConfig = DEFAULT_PATH,
             mesh_config: MeshConfig = DEFAULT_MESH,
             dtype=jnp.float32):
    """Single-lambda solve (reference mbs_one, code/solvers.py:15-78).

    With lam=None, uses the lambda_max estimate — the reference Python
    default, where theta collapses to mean(y) (code/test_solvers.py:24-29).
    Returns a dict {mesh, theta_hat, theta_lattice, fitted, counter}.
    """
    data_np = np.asarray(data, np.float64)
    if data_np.ndim == 1:
        data_np = data_np[:, None]
    y_np = np.asarray(y, np.float64).reshape(-1)
    spec = _resolve_mesh(data_np, y_np, m, mesh, mesh_config, dtype)
    data_j = jnp.asarray(data_np, dtype)
    y_j = jnp.asarray(y_np, dtype)
    ops, problem = _jit_setup(spec, data_j, y_j, solver_config)
    if lam is None:
        lam, _ = _jit_lambda_grid(
            ops, problem, spec.deltas.astype(dtype), solver_config, path_config)
    lam = jnp.asarray(lam, dtype)
    theta, fitted, counter = _jit_single(ops, problem, lam, lam, solver_config)
    return {
        "mesh": _mesh_points_np(spec),
        "mesh_spec": spec,
        "theta_hat": np.asarray(mesh_lib.flatten_ref_order(theta)),
        "theta_lattice": np.asarray(theta),
        "fitted": np.asarray(fitted),
        "counter": int(counter),
        "lambda": float(lam),
        "m": spec.m,
        "y": y_np,
        "data": data_np,
    }


def predict_mvtv(model, data=None):
    """Functional prediction entry point (predict_mvtv, MultivarTV.cpp:54-71)."""
    if isinstance(model, MVTVModel):
        return model.predict(data)
    if data is None:
        return model["fitted"]
    spec = model["mesh_spec"]
    theta = jnp.asarray(model["theta_lattice"])
    data = np.asarray(data, np.float64)
    if data.ndim == 1:
        data = data[:, None]
    return np.asarray(_jit_predict(spec, theta, jnp.asarray(data, theta.dtype)))
