"""The fused multi-iteration (chunked) convergent path: admm_solve with
chunk cadence > 1 must match the per-iteration path's fixed point, respect
the reference's hard iteration cap (solvers.cpp:103) exactly, and
admm_fixed_iterations must honor the configured cadence.

Runs the Pallas kernel in interpret mode via admm.FORCE_FUSED_INTERPRET so
the chunked semantics are testable on the CPU harness.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from multivartv_tpu.config import SolverConfig
from multivartv_tpu.solver import admm
from multivartv_tpu.solver.problem import Problem, build_operators


@pytest.fixture()
def force_fused(monkeypatch):
    monkeypatch.setattr(admm, "FORCE_FUSED_INTERPRET", True)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(29)
    # DMA-aligned so the r4 unbatched pad route stays out of the picture:
    # this module tests CADENCE semantics (chunked vs per-iteration) on
    # identical problems; the chunked-vs-per-iteration counter bound only
    # holds within one numerics family, and padding (tested for objective
    # parity in test_pad_single.py) would otherwise put the two arms on
    # the padded problem where near-threshold adaptive-rho decisions
    # diverge their trajectories.
    m = (16, 128)
    deltas = jnp.asarray([0.4, 0.9], jnp.float32)
    counts = jnp.asarray(rng.poisson(3, m).astype(np.float32))
    oty = jnp.asarray(rng.randn(*m).astype(np.float32)) * counts
    problem = Problem(counts=counts, oty=oty,
                      ybar=jnp.sum(oty) / jnp.sum(counts),
                      flat_idx=jnp.zeros((1,), jnp.int32),
                      y=jnp.zeros((1,), jnp.float32))
    return m, deltas, problem


def _objective(ops, problem, theta, lam):
    fid, pen = admm.objective(ops, problem, theta)
    return float(fid + lam * pen)


def test_chunked_solve_matches_per_iteration(setup, force_fused):
    """Same fixed point whether convergence is checked every iteration
    (jnp path) or every 4/16 iterations (fused kernel path)."""
    m, deltas, problem = setup
    lam = jnp.asarray(0.08, jnp.float32)

    cfg1 = SolverConfig(cg_fixed_iters=3, chunk_iters=1)
    ops = build_operators(m, deltas, cfg1, jnp.float32)
    s0 = admm.initial_state(ops, problem, rho0=lam / 5.0)
    ref = admm.admm_solve(ops, problem, lam, s0, cfg1)
    obj_ref = _objective(ops, problem, ref.theta, float(lam))

    for k in (4, 16):
        cfg = SolverConfig(cg_fixed_iters=3, chunk_iters=k)
        assert admm.fused_iterations_available(ops, problem, cfg, False)
        out = admm.admm_solve(ops, problem, lam, s0, cfg)
        obj = _objective(ops, problem, out.theta, float(lam))
        assert np.isfinite(obj)
        assert abs(obj - obj_ref) <= 1e-3 * abs(obj_ref)
        # Converged by the Boyd criterion it last evaluated.
        assert float(out.primal_norm) <= float(out.eps_primal)
        assert float(out.dual_norm) <= float(out.eps_dual)
        # Overshoot is bounded by the cadence (plus warm-start tail).
        assert int(out.counter) <= int(ref.counter) + k


def test_chunked_cap_is_exact(setup, force_fused):
    """max_iters is a HARD cap: the chunked path must stop at exactly
    max_iters, never max_iters + chunk - 1."""
    m, deltas, problem = setup
    lam = jnp.asarray(0.08, jnp.float32)
    cfg = SolverConfig(cg_fixed_iters=3, chunk_iters=4, max_iters=10,
                       tol=1e-12)  # unreachable tolerance
    ops = build_operators(m, deltas, cfg, jnp.float32)
    s0 = admm.initial_state(ops, problem, rho0=lam / 5.0)
    out = admm.admm_solve(ops, problem, lam, s0, cfg)
    assert int(out.counter) == 10


def test_fixed_iterations_honor_chunk(setup, force_fused):
    """admm_fixed_iterations with cadence 4 over 7 iterations == one fused
    7-iteration chunk (identical math; only HBM round-trips differ)."""
    m, deltas, problem = setup
    lam = jnp.asarray(0.08, jnp.float32)
    cfg4 = SolverConfig(cg_fixed_iters=3, chunk_iters=4)
    cfg7 = SolverConfig(cg_fixed_iters=3, chunk_iters=7)
    ops = build_operators(m, deltas, cfg4, jnp.float32)
    s0 = admm.initial_state(ops, problem, rho0=lam / 5.0)
    out4 = admm.admm_fixed_iterations(ops, problem, lam, s0, cfg4, 7)
    out7 = admm.admm_fixed_iterations(ops, problem, lam, s0, cfg7, 7)
    assert int(out4.counter) == 7 and int(out7.counter) == 7
    np.testing.assert_allclose(np.asarray(out4.theta),
                               np.asarray(out7.theta), atol=1e-5)
    np.testing.assert_allclose(float(out4.rho), float(out7.rho), rtol=1e-6)


def test_auto_chunk_default():
    cfg = SolverConfig()
    assert cfg.chunk_iters is None
    assert admm.resolve_chunk(cfg) == admm.AUTO_CHUNK > 1
    assert admm.resolve_chunk(SolverConfig(chunk_iters=1)) == 1
    assert admm.resolve_chunk(SolverConfig(chunk_iters=9)) == 9


def test_fused_chunk_poisons_theta_on_divergence(setup, force_fused):
    """A non-finite CG residual inside a fused chunk must poison theta
    itself, not just the norms (ADMM state contract)."""
    m, deltas, problem = setup
    bad_problem = dataclasses.replace(
        problem, oty=problem.oty.at[0, 0].set(jnp.nan))
    lam = jnp.asarray(0.08, jnp.float32)
    cfg = SolverConfig(cg_fixed_iters=3, chunk_iters=4)
    ops = build_operators(m, deltas, cfg, jnp.float32)
    s0 = admm.initial_state(ops, bad_problem, rho0=lam / 5.0)
    out = admm.admm_fused_chunk(ops, bad_problem, lam, s0, cfg, 4)
    assert not bool(jnp.all(jnp.isfinite(out.theta)))
    assert not bool(jnp.isfinite(out.primal_norm))
    diag = admm.solver_diagnostics(out)
    assert diag["diverged"]
