"""Scenario batching (parallel lambda sweeps) and 3-D solver tests."""

import jax
import jax.numpy as jnp
import numpy as np

import golden
from multivartv_tpu import mesh as mesh_lib
from multivartv_tpu.config import PathConfig, SolverConfig
from multivartv_tpu.solver import batch as batch_lib
from multivartv_tpu.solver import path as path_lib
from multivartv_tpu.solver.admm import admm_solve, initial_state
from multivartv_tpu.solver.problem import build_operators, build_problem
from test_admm import make_2d_problem


def test_lambda_sweep_matches_individual_solves():
    data, y, _, spec = make_2d_problem(n=300, m=(5, 5))
    cfg = SolverConfig()
    ops = build_operators(spec.m, spec.deltas, cfg)
    problem = build_problem(spec, jnp.asarray(data, jnp.float32),
                            jnp.asarray(y, jnp.float32))
    lambdas = jnp.asarray([0.5, 0.1, 0.02], jnp.float32)
    res = batch_lib.solve_lambda_sweep(ops, problem, lambdas, cfg)
    assert res.thetas.shape == (3, 5, 5)
    rho0 = jnp.max(lambdas) / 5.0
    for i in range(3):
        st = admm_solve(ops, problem, lambdas[i],
                        initial_state(ops, problem, rho0), cfg)
        assert np.allclose(np.asarray(res.thetas[i]), np.asarray(st.theta),
                           atol=5e-3)


def test_problem_batch():
    data, y, _, spec = make_2d_problem(n=200, m=(4, 4))
    cfg = SolverConfig()
    ops = build_operators(spec.m, spec.deltas, cfg)
    masks = [jnp.asarray((np.arange(200) % 3 != k).astype(np.float32))
             for k in range(3)]
    probs = [build_problem(spec, jnp.asarray(data, jnp.float32),
                           jnp.asarray(y, jnp.float32), train_mask=mk)
             for mk in masks]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    lambdas = jnp.asarray([0.1, 0.1, 0.05], jnp.float32)
    res = batch_lib.solve_problem_batch(ops, batched, lambdas, cfg)
    assert res.thetas.shape == (3, 4, 4)
    assert np.isfinite(np.asarray(res.mses)).all()


def test_3d_solver_matches_golden():
    """BASELINE config 4 (scaled down): 3-D multivariate TV with the
    DCT-diagonalized x-update."""
    rng = np.random.RandomState(117)
    n = 600
    data = rng.uniform(-1, 1, (n, 3))
    y = (np.sign(data[:, 0]) + np.sign(data[:, 1] * data[:, 2])
         + rng.normal(0, 0.5, n))
    spec = mesh_lib.make_mesh_spec(jnp.asarray(data), (5, 4, 4))
    cfg = SolverConfig()
    ops = build_operators(spec.m, spec.deltas, cfg)
    problem = build_problem(spec, jnp.asarray(data, jnp.float32),
                            jnp.asarray(y, jnp.float32))
    flat_idx = np.asarray(problem.flat_idx)
    deltas = np.asarray(spec.deltas)
    lam = 0.05 * golden.lam_max_golden(flat_idx, y, spec.m, deltas)
    st = admm_solve(ops, problem, jnp.asarray(lam),
                    initial_state(ops, problem, jnp.asarray(lam / 5.0)), cfg)
    gold = golden.admm_golden(flat_idx, y, spec.m, deltas, lam, rho0=lam / 5.0)
    ours = np.asarray(st.theta).reshape(-1)
    obj_ours = golden.objective(flat_idx, y, spec.m, deltas, ours, lam)
    obj_gold = golden.objective(flat_idx, y, spec.m, deltas, gold["theta"], lam)
    assert obj_ours <= obj_gold * (1 + 5e-3) + 1e-6
    # 3-D block count: 2^3 - 1 = 7 difference blocks.
    assert len(ops.binaries) == 7


def test_1d_fused_lasso_equivalence():
    """Vignette equivalence (MultivarTV-intro.Rmd:111-118): with m = n and
    mesh = x, MVTV reduces to the 1-D fused lasso.  Check the solution is
    piecewise constant with small TV at moderate lambda."""
    rng = np.random.RandomState(123)
    n = 40
    x = np.sort(rng.uniform(0, 1, n))
    y = np.where(x < 0.5, 0.0, 3.0) + rng.normal(0, 0.2, n)
    spec = mesh_lib.mesh_spec_from_points(x[:, None], (n,))
    cfg = SolverConfig()
    ops = build_operators(spec.m, spec.deltas, cfg)
    problem = build_problem(spec, jnp.asarray(x[:, None], jnp.float32),
                            jnp.asarray(y, jnp.float32))
    # every sample maps to its own knot
    assert int(jnp.max(problem.counts)) == 1
    lam = jnp.asarray(0.5, jnp.float32)  # ~ sigma*sqrt(log n) fusion regime
    st = admm_solve(ops, problem, lam,
                    initial_state(ops, problem, lam / 5.0), cfg)
    theta = np.asarray(st.theta)
    # two plateaus: most consecutive diffs ~ 0 (up to the Boyd TOL=1e-4
    # solve accuracy, which leaves O(1e-2) ripple on plateaus)
    d = np.abs(np.diff(theta))
    assert (d < 5e-2).sum() >= n - 6
    assert theta[-1] - theta[0] > 2.0
    # golden cross-check at this lambda
    gold = golden.admm_golden(np.asarray(problem.flat_idx), y, spec.m,
                              np.asarray(spec.deltas), float(lam),
                              rho0=float(lam) / 5.0)
    o1 = golden.objective(np.asarray(problem.flat_idx), y, spec.m,
                          np.asarray(spec.deltas), theta, float(lam))
    o2 = golden.objective(np.asarray(problem.flat_idx), y, spec.m,
                          np.asarray(spec.deltas), gold["theta"], float(lam))
    assert o1 <= o2 * 1.01 + 1e-6
