"""Parity fixtures mined from the FOURTH reference sibling — the
standalone Armadillo port at /root/reference/cpp-code/ (surveyed in round
5; SURVEY.md section 0) — and behavioral coverage of its distinct solver
profile.

Distinct fixtures (cpp-code/utils_test.cpp:79-127):
  * vector2tensor on a NON-CUBIC (3,2,3) mesh (the rcpp/python fixtures
    only pin cubic (3,3,3) corners);
  * get_col_inds(2, {2,3}, direction=1) — the direction-1 difference
    matrix's column structure on a (2,3) mesh.

Distinct solver profile (cpp-code/solvers.cpp, solvers.hpp:14):
  * elementwise theta stopping at TOL=1e-3, cap 2000;
  * ASYMMETRIC adaptive rho: grow x20 / shrink /10 at band 20
    (cpp-code/solvers.cpp:71-88) — vs the production rcpp symmetric
    tau=2/band=10;
  * unscaled lambda_max (cpp-code/utils.cpp lam_max_pinv), grid ratio
    1e-5 (cpp-code/solvers.cpp:187);
  * u0 = 1/lambda, rho0 = lambda (like the python prototype).
Exposed as config.sibling_profile("cpp_standalone").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multivartv_tpu import mesh as mesh_lib
from multivartv_tpu.config import SolverConfig, sibling_profile
from multivartv_tpu.solver import admm
from multivartv_tpu.solver.problem import build_operators, build_problem

import golden


def test_vector2tensor_noncubic_323():
    """cpp-code/utils_test.cpp:79-88: vector2tensor on a (3,2,3) mesh for
    flat indices 0..2 walks axis 0 fastest: (0,0,0), (1,0,0), (2,0,0)."""
    m = (3, 2, 3)
    expected = [(0, 0, 0), (1, 0, 0), (2, 0, 0)]
    for flat, multi in enumerate(expected):
        got = tuple(int(v) for v in mesh_lib.ref_flat_to_multi(
            np.asarray([flat]), m)[0])
        assert got == multi
        # Round trip through the forward map.
        back = int(np.asarray(mesh_lib.flat_index_ref(
            jnp.asarray([multi]), m))[0])
        assert back == flat


def test_direction1_diffmat_on_2x3():
    """cpp-code/utils_test.cpp:110-127 inspects get_col_inds(2,{2,3},1) —
    the direction-1 (second-axis) first-difference structure on a (2,3)
    mesh.  Pin the OBSERVABLE: our matrix-free block (0,1) on a (2,3)
    lattice equals the explicit sparse builder's rows."""
    m = (2, 3)
    deltas = np.asarray([0.5, 0.25])
    D = golden.build_D(m, deltas).toarray()
    # fd_binaries(2) stack order: (1,1), (0,1), (1,0); block (0,1) has
    # m0*(m1-1) = 4 rows scaled by deltas[0].
    rows_mix = (m[0] - 1) * (m[1] - 1)
    block_ax1 = D[rows_mix:rows_mix + m[0] * (m[1] - 1), :]
    theta = np.arange(6, dtype=np.float64).reshape(m)  # golden is C-order
    # Matrix-free: forward diff along axis 1 scaled by deltas[0].
    diff = (theta[:, 1:] - theta[:, :-1]) * deltas[0]
    np.testing.assert_allclose(
        block_ax1 @ theta.reshape(-1), diff.reshape(-1), rtol=1e-12)


def _toy(seed=11, n=400):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0, 1, (n, 2))
    y = rng.uniform(0, 1, n)   # uniform noise, like solvers_test.cpp:16-17
    return x, y


def test_cpp_standalone_profile_solve():
    """The cpp_standalone profile (asymmetric adaptive rho, theta_inf
    stopping, u0=1/lambda, rho0=lambda) converges on the sibling's own
    workload shape (uniform random data, solvers_test.cpp:16-36)."""
    scfg, pcfg, mcfg = sibling_profile("cpp_standalone")
    assert scfg.adapt_tau == 20.0 and scfg.adapt_tau_shrink == 10.0
    assert scfg.adapt_band == 20.0 and scfg.max_iters == 2000
    assert pcfg.lam_max_scale == 1.0 and pcfg.lambda_min_ratio == 1e-5
    x, y = _toy()
    spec = mesh_lib.make_mesh_spec(x, (8, 8), config=mcfg)
    ops = build_operators(spec.m, spec.deltas, scfg, jnp.float32)
    problem = build_problem(spec, x, y)
    lam = 0.05
    s0 = admm.initial_state(ops, problem, rho0=jnp.float32(lam),
                            u_fill=1.0 / lam)
    out = admm.admm_solve(ops, problem, jnp.float32(lam), s0, scfg)
    assert int(out.counter) < scfg.max_iters
    assert np.all(np.isfinite(np.asarray(out.theta)))
    # The fit beats the trivial constant predictor on training MSE.
    from multivartv_tpu.ops.interp import gather_fitted
    fits = np.asarray(gather_fitted(out.theta, problem.flat_idx))
    assert np.mean((fits - y) ** 2) <= np.var(y)


def test_asymmetric_tau_jnp_matches_reference_rule():
    """One adaptive step with tau_grow=20/tau_shrink=10/band=20
    reproduces the sibling's adapt_step table (cpp-code/solvers.cpp:71-88):
    rho x20 with u x0.05 on primal-dominant, rho /10 with u x10 on
    dual-dominant."""
    x, y = _toy(seed=3, n=200)
    scfg = SolverConfig(adapt_tau=20.0, adapt_tau_shrink=10.0,
                        adapt_band=20.0)
    spec = mesh_lib.make_mesh_spec(x, (6, 6))
    ops = build_operators(spec.m, spec.deltas, scfg, jnp.float32)
    problem = build_problem(spec, x, y)
    body = admm.make_admm_iteration(ops, problem, jnp.float32(0.3), scfg)
    s = admm.initial_state(ops, problem, rho0=jnp.float32(1e-4))
    s1 = body(s)
    pn, dn = float(s1.primal_norm), float(s1.dual_norm)
    rho_factor = float(s1.rho) / 1e-4
    if pn > 20.0 * dn:
        assert rho_factor == pytest.approx(20.0, rel=1e-5)
        assert float(s1.u_scale) == pytest.approx(0.05, rel=1e-5)
    elif dn > 20.0 * pn:
        assert rho_factor == pytest.approx(0.1, rel=1e-5)
        assert float(s1.u_scale) == pytest.approx(10.0, rel=1e-5)
    else:
        assert rho_factor == pytest.approx(1.0, rel=1e-5)
        assert float(s1.u_scale) == pytest.approx(1.0, rel=1e-5)


def test_asymmetric_tau_fused_matches_jnp(monkeypatch):
    """The fused-kernel chunk applies the same asymmetric factors as the
    jnp path (tau_shrink threads through _admm_chain)."""
    monkeypatch.setattr(admm, "FORCE_FUSED_INTERPRET", True)
    x, y = _toy(seed=5, n=500)
    scfg = SolverConfig(adapt_tau=20.0, adapt_tau_shrink=10.0,
                        adapt_band=20.0, cg_fixed_iters=3, chunk_iters=2)
    spec = mesh_lib.make_mesh_spec(x, (8, 128))   # aligned: fused path
    ops = build_operators(spec.m, spec.deltas, scfg, jnp.float32)
    problem = build_problem(spec, x, y)
    lam = jnp.float32(0.05)
    s0 = admm.initial_state(ops, problem, rho0=lam / 5.0)
    assert admm.fused_iterations_available(ops, problem, scfg, False)
    out_f = admm.admm_fixed_iterations(ops, problem, lam, s0, scfg, 6)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(admm, "FORCE_FUSED_INTERPRET", False)
        scfg1 = SolverConfig(adapt_tau=20.0, adapt_tau_shrink=10.0,
                             adapt_band=20.0, cg_fixed_iters=3,
                             chunk_iters=1, use_pallas=False)
        out_j = admm.admm_fixed_iterations(ops, problem, lam, s0, scfg1, 6)
    # The two arms are different numerics families (bf16 vs f32
    # preconditioner transforms), so compare the rho/u_scale trajectory —
    # the asymmetric-factor observable — and the objective, never
    # elementwise theta (CLAUDE.md r3 lesson).
    np.testing.assert_allclose(float(out_f.rho), float(out_j.rho),
                               rtol=1e-5)
    np.testing.assert_allclose(float(out_f.u_scale), float(out_j.u_scale),
                               rtol=1e-5)
    lam_f = float(lam)
    of, pf = admm.objective(ops, problem, out_f.theta)
    oj, pj = admm.objective(ops, problem, out_j.theta)
    obj_f = float(of + lam_f * pf)
    obj_j = float(oj + lam_f * pj)
    # 6 unconverged iterations of two numerics families: ~1.6e-4
    # relative drift measured; converged solves agree far tighter.
    assert abs(obj_f - obj_j) <= 1e-3 * abs(obj_j)
