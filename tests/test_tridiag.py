"""p = 1 exact cyclic-reduction x-update (solver/tridiag.py): the m = N
fused-lasso regime (vignette MultivarTV-intro.Rmd:111-118) at any n, no
transform gate, no padding (VERDICT r4 missing #2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import golden
from multivartv_tpu import mesh as mesh_lib
from multivartv_tpu.config import SolverConfig
from multivartv_tpu.solver import admm
from multivartv_tpu.solver.problem import build_operators, build_problem
from multivartv_tpu.solver.tridiag import (cr_solve, tridiag_applies,
                                           xupdate_tridiag)


def _dense_system(counts, rho, s):
    n = len(counts)
    g = rho * s * s
    A = np.diag(np.asarray(counts, np.float64))
    for i in range(n):
        A[i, i] += g * (2.0 - (i == 0) - (i == n - 1))
        if i > 0:
            A[i, i - 1] -= g
        if i < n - 1:
            A[i, i + 1] -= g
    return A


@pytest.mark.parametrize("n", [1, 2, 3, 7, 16, 100, 257])
def test_cr_solve_matches_dense(n):
    rng = np.random.RandomState(n)
    counts = rng.poisson(2, n).astype(np.float32)
    rho, s = 0.7, 1.3
    A = _dense_system(counts, rho, s)
    b = rng.randn(n).astype(np.float32)
    x = np.asarray(xupdate_tridiag(jnp.asarray(counts), jnp.asarray(b),
                                   jnp.float32(rho), jnp.float32(s)))
    x_ref = np.linalg.solve(A, b.astype(np.float64))
    scale = max(1.0, np.max(np.abs(x_ref)))
    assert np.max(np.abs(x - x_ref)) / scale < 5e-6


def test_cr_solve_vmappable():
    """Batched CV folds for p=1 ride the same solver under vmap."""
    rng = np.random.RandomState(5)
    B, n = 3, 64
    counts = rng.poisson(2, (B, n)).astype(np.float32)
    b = rng.randn(B, n).astype(np.float32)
    out = jax.vmap(
        lambda c, d: xupdate_tridiag(c, d, jnp.float32(0.5),
                                     jnp.float32(1.0)))(
        jnp.asarray(counts), jnp.asarray(b))
    for i in range(B):
        A = _dense_system(counts[i], 0.5, 1.0)
        x_ref = np.linalg.solve(A, b[i].astype(np.float64))
        scale = max(1.0, np.max(np.abs(x_ref)))
        assert np.max(np.abs(np.asarray(out[i]) - x_ref)) / scale < 5e-6


def test_tridiag_gate():
    cfg = SolverConfig()
    ops1 = build_operators((37,), jnp.asarray([0.1]), cfg, jnp.float32)
    assert tridiag_applies(ops1, cfg)
    # Never built: p=1 skips the folded-DCT operand sets entirely.
    assert ops1.dct_halves is None
    ops2 = build_operators((8, 8), jnp.asarray([0.1, 0.1]), cfg, jnp.float32)
    assert not tridiag_applies(ops2, cfg)
    assert not tridiag_applies(ops1, SolverConfig(x_solver="jacobi_pcg"))


def test_p1_fused_lasso_objective_vs_golden():
    """m = N fused lasso (mesh = data): converged objective matches the
    float64 golden ADMM."""
    rng = np.random.RandomState(117)
    n = 200
    x = np.sort(rng.uniform(0, 1, n))
    y = (x > 0.5).astype(float) + rng.randn(n) * 0.1
    spec = mesh_lib.make_mesh_spec(x[:, None], (n,))
    cfg = SolverConfig()
    ops = build_operators(spec.m, spec.deltas, cfg, jnp.float32)
    pr = build_problem(spec, x[:, None], y)
    lam = 0.05
    s0 = admm.initial_state(ops, pr, rho0=jnp.float32(lam / 5))
    out = admm.admm_solve(ops, pr, jnp.float32(lam), s0, cfg)
    assert int(out.counter) < cfg.max_iters
    fid, pen = admm.objective(ops, pr, out.theta)
    obj = float(fid + lam * pen)
    g = golden.admm_golden(np.asarray(pr.flat_idx), y, spec.m,
                           np.asarray(spec.deltas, np.float64), lam)
    gobj = float(golden.objective(np.asarray(pr.flat_idx), y, spec.m,
                                  np.asarray(spec.deltas, np.float64),
                                  g["theta"], lam))
    assert abs(obj - gobj) <= 1e-4 * abs(gobj)
    # Exact x-update: zero CG iterations recorded.
    assert int(out.cg_iters) == 0


def test_transposed_layout_matches_flat(monkeypatch):
    """The TPU-friendly transposed-layout CR (sublane even/odd splits)
    is bit-compatible with the flat reference path."""
    import multivartv_tpu.solver.tridiag as tri
    rng = np.random.RandomState(2)
    for n in (4096, 5000, 1 << 14):
        counts = rng.poisson(2, n).astype(np.float32)
        b = rng.randn(n).astype(np.float32)
        assert (1 << (n - 1).bit_length()) >= tri._TRANSPOSED_MIN
        x_t = np.asarray(xupdate_tridiag(
            jnp.asarray(counts), jnp.asarray(b), jnp.float32(0.7),
            jnp.float32(1.3)))
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(tri, "_TRANSPOSED_MIN", 1 << 30)
            x_f = np.asarray(xupdate_tridiag(
                jnp.asarray(counts), jnp.asarray(b), jnp.float32(0.7),
                jnp.float32(1.3)))
        scale = max(1.0, np.max(np.abs(x_f)))
        assert np.max(np.abs(x_t - x_f)) / scale < 1e-6


def test_p1_large_n_solves():
    """2^15 knots (past every transform gate) solve without padding."""
    rng = np.random.RandomState(7)
    n = 1 << 15
    x = np.linspace(0, 1, n)
    y = np.where(x > 0.3, 1.0, 0.0) + rng.randn(n) * 0.05
    spec = mesh_lib.make_mesh_spec(x[:, None], (n,))
    cfg = SolverConfig()
    ops = build_operators(spec.m, spec.deltas, cfg, jnp.float32)
    assert ops.dct_halves is None and ops.dct_mats is None
    pr = build_problem(spec, x[:, None], y)
    s0 = admm.initial_state(ops, pr, rho0=jnp.float32(0.01))
    out = admm.admm_fixed_iterations(ops, pr, jnp.float32(0.02), s0, cfg, 10)
    assert out.theta.shape == (n,)
    assert bool(np.all(np.isfinite(np.asarray(out.theta))))
