"""ADMM solver tests: reference behavioral invariants + golden parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import golden
from multivartv_tpu import mesh as mesh_lib
from multivartv_tpu.config import PathConfig, SolverConfig
from multivartv_tpu.ops import interp
from multivartv_tpu.solver import path as path_lib
from multivartv_tpu.solver.admm import admm_solve, initial_state
from multivartv_tpu.solver.problem import build_operators, build_problem


def make_2d_problem(n=400, m=(6, 6), seed=117, noise=1.0):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(-1, 1, n)
    x2 = rng.uniform(-1, 1, n)
    data = np.stack([x1, x2], 1)
    ytrue = golden.myexp2(x1, x2)
    y = ytrue + rng.normal(0, noise, n)
    spec = mesh_lib.make_mesh_spec(jnp.asarray(data), m)
    return data, y, ytrue, spec


def test_theta_collapses_to_mean_at_lam_max():
    """The reference's key solver invariant (code/test_solvers.py:13-29):
    at lambda = lambda_max, theta_hat collapses to mean(y)."""
    rng = np.random.RandomState(117)
    n = 10000
    x1 = rng.uniform(-1, 1, n)
    x2 = rng.uniform(-1, 1, n)
    data = np.stack([x1, x2], 1)
    y = golden.myexp2(x1, x2) + rng.normal(0, 1, n)

    from multivartv_tpu.api import mvtv_one
    out = mvtv_one(data, y, m=(10, 10))
    a = round(float(np.mean(out["theta_hat"])), 3)
    b = round(float(np.mean(out["fitted"])), 3)
    c = round(float(np.mean(y)), 3)
    assert a == b == c


def test_admm_matches_golden_objective():
    data, y, _, spec = make_2d_problem(n=300, m=(5, 5))
    cfg = SolverConfig()
    ops = build_operators(spec.m, spec.deltas, cfg)
    problem = build_problem(spec, jnp.asarray(data, jnp.float32),
                            jnp.asarray(y, jnp.float32))
    flat_idx = np.asarray(problem.flat_idx)

    lam = 0.05 * golden.lam_max_golden(flat_idx, y, spec.m, np.asarray(spec.deltas))
    rho0 = lam / 5.0

    state = initial_state(ops, problem, rho0=jnp.asarray(rho0))
    state = admm_solve(ops, problem, jnp.asarray(lam), state, cfg)
    ours = np.asarray(state.theta).reshape(-1)

    gold = golden.admm_golden(flat_idx, y, spec.m, np.asarray(spec.deltas),
                              lam, rho0=rho0)
    deltas = np.asarray(spec.deltas)
    obj_ours = golden.objective(flat_idx, y, spec.m, deltas, ours, lam)
    obj_gold = golden.objective(flat_idx, y, spec.m, deltas, gold["theta"], lam)
    # Matched objective within ADMM tolerance.
    assert obj_ours <= obj_gold * (1 + 5e-3) + 1e-6
    assert np.abs(ours - gold["theta"]).max() < 0.05 * max(1.0, np.abs(gold["theta"]).max())
    # Converged within the cap.
    assert int(state.counter) < cfg.max_iters


def test_reference_python_variant_matches_golden():
    """The reference *Python prototype* solver semantics
    (code/solvers.py:15-78): fixed rho = lambda, u0 = 1/lambda, elementwise
    |theta - theta_old| <= tol stopping, no all-ones D block.  Selectable
    via SolverConfig(stop_rule="theta_inf", adapt_rho=False, ...)."""
    data, y, _, spec = make_2d_problem(n=300, m=(5, 5))
    cfg = SolverConfig(stop_rule="theta_inf", adapt_rho=False, tol=1e-3,
                       include_full_mixed=False, max_iters=5000,
                       cg_tol=1e-8, cg_max_iters=400)
    ops = build_operators(spec.m, spec.deltas, cfg)
    problem = build_problem(spec, jnp.asarray(data, jnp.float32),
                            jnp.asarray(y, jnp.float32))
    flat_idx = np.asarray(problem.flat_idx)
    deltas = np.asarray(spec.deltas)

    lam = 0.05 * golden.lam_max_golden(flat_idx, y, spec.m, deltas,
                                       include_full_mixed=False)
    state = initial_state(ops, problem, rho0=jnp.asarray(lam),
                          u_fill=1.0 / lam)
    state = admm_solve(ops, problem, jnp.asarray(lam), state, cfg)
    ours = np.asarray(state.theta).reshape(-1)

    gold = golden.admm_golden_py(flat_idx, y, spec.m, deltas, lam)
    obj_ours = golden.objective(flat_idx, y, spec.m, deltas, ours, lam,
                                include_full_mixed=False)
    obj_gold = golden.objective(flat_idx, y, spec.m, deltas, gold["theta"],
                                lam, include_full_mixed=False)
    assert obj_ours <= obj_gold * (1 + 5e-3) + 1e-6
    assert np.abs(ours - gold["theta"]).max() < 0.05 * max(
        1.0, np.abs(gold["theta"]).max())
    # Same stopping rule => comparable iteration counts (f32 CG vs exact
    # float64 LU makes them near, not exact).
    assert abs(int(state.counter) - gold["counter"]) <= max(
        5, int(0.2 * gold["counter"]))
    assert int(state.counter) < cfg.max_iters


@pytest.mark.parametrize("x_solver", ["jacobi_pcg", "cg"])
def test_x_solver_variants_agree(x_solver):
    data, y, _, spec = make_2d_problem(n=200, m=(5, 4))
    base = SolverConfig()
    alt = SolverConfig(x_solver=x_solver, cg_max_iters=300)
    lam = jnp.asarray(0.1)

    thetas = {}
    for cfg in (base, alt):
        ops = build_operators(spec.m, spec.deltas, cfg)
        problem = build_problem(spec, jnp.asarray(data, jnp.float32),
                                jnp.asarray(y, jnp.float32))
        state = initial_state(ops, problem, rho0=lam / 5.0)
        state = admm_solve(ops, problem, lam, state, cfg)
        thetas[cfg.x_solver] = np.asarray(state.theta)
    assert np.allclose(thetas[base.x_solver], thetas[alt.x_solver], atol=2e-3)


def test_admm_vmaps_over_problems():
    """Batched solve equals per-problem solves (basis of fold batching)."""
    data, y, _, spec = make_2d_problem(n=250, m=(4, 4))
    cfg = SolverConfig()
    ops = build_operators(spec.m, spec.deltas, cfg)

    mask_a = (np.arange(250) % 5 != 0).astype(np.float32)
    mask_b = (np.arange(250) % 5 != 1).astype(np.float32)
    probs = [
        build_problem(spec, jnp.asarray(data, jnp.float32),
                      jnp.asarray(y, jnp.float32), train_mask=jnp.asarray(mk))
        for mk in (mask_a, mask_b)
    ]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    lam = jnp.asarray([0.08, 0.08])

    def solve(problem, lam_i):
        state = initial_state(ops, problem, rho0=lam_i / 5.0)
        return admm_solve(ops, problem, lam_i, state, cfg).theta

    thetas_b = jax.vmap(solve)(batched, lam)
    for i, problem in enumerate(probs):
        t = solve(problem, lam[i])
        # Batched elements may run extra (converged, stable) iterations.
        assert np.allclose(np.asarray(thetas_b[i]), np.asarray(t), atol=5e-3)


def test_lam_max_matches_golden():
    data, y, _, spec = make_2d_problem(n=200, m=(5, 5))
    cfg = SolverConfig()
    pcfg = PathConfig()
    ops = build_operators(spec.m, spec.deltas, cfg)
    problem = build_problem(spec, jnp.asarray(data, jnp.float32),
                            jnp.asarray(y, jnp.float32))
    ours = float(path_lib.lam_max(ops, problem, pcfg, spec.deltas))
    gold = golden.lam_max_golden(np.asarray(problem.flat_idx), y, spec.m,
                                 np.asarray(spec.deltas))
    assert np.isclose(ours, gold, rtol=1e-3)


def test_lambda_grid_matches_reference_shape():
    pcfg = PathConfig(n_lambda=10)
    grid = np.asarray(path_lib.create_lambdas(jnp.asarray(2.0), pcfg))
    assert grid.shape == (10,)
    assert np.isclose(grid[0], 2.0, rtol=1e-5)
    assert np.isclose(grid[-1], 2e-4, rtol=1e-4)
    assert (np.diff(grid) < 0).all()
    # log-spacing
    ratios = grid[:-1] / grid[1:]
    assert np.allclose(ratios, ratios[0], rtol=1e-4)
