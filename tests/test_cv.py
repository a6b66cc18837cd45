"""Cross-validation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from multivartv_tpu.config import CVConfig, PathConfig, SolverConfig
from multivartv_tpu.solver import cv as cv_lib
from multivartv_tpu.solver import path as path_lib
from multivartv_tpu.solver.problem import build_operators, build_problem
from test_admm import make_2d_problem


def test_kfold_indices_balanced():
    labels = np.asarray(cv_lib.kfold_indices(103, 5, seed=123))
    counts = np.bincount(labels, minlength=5)
    # i mod k distribution: sizes differ by at most 1 (kfoldinds semantics).
    assert counts.max() - counts.min() <= 1
    assert counts.sum() == 103
    # Shuffled: not simply 0,1,2,...
    assert not (labels[:5] == np.arange(5)).all()


def test_fold_problems_masks():
    data, y, _, spec = make_2d_problem(n=100, m=(4, 4))
    labels = cv_lib.kfold_indices(100, 4, seed=7)
    probs = cv_lib.fold_problems(spec, jnp.asarray(data, jnp.float32),
                                 jnp.asarray(y, jnp.float32), labels, 4)
    counts = np.asarray(probs.counts)
    assert counts.shape == (4, 4, 4)
    # Each fold's train count = n - fold size.
    sizes = np.bincount(np.asarray(labels), minlength=4)
    for f in range(4):
        assert np.isclose(counts[f].sum(), 100 - sizes[f])


def test_cross_validate_selects_reasonable_lambda():
    data, y, ytrue, spec = make_2d_problem(n=500, m=(6, 6), noise=1.0)
    cfg = SolverConfig()
    pcfg = PathConfig(n_lambda=12, store="mse")
    cvcfg = CVConfig(folds=4)
    ops = build_operators(spec.m, spec.deltas, cfg)
    problem = build_problem(spec, jnp.asarray(data, jnp.float32),
                            jnp.asarray(y, jnp.float32))
    lmax = path_lib.lam_max(ops, problem, pcfg, spec.deltas)
    lambdas = path_lib.create_lambdas(lmax, pcfg)
    labels = cv_lib.kfold_indices(500, 4, seed=123)
    probs = cv_lib.fold_problems(spec, jnp.asarray(data, jnp.float32),
                                 jnp.asarray(y, jnp.float32), labels, 4)
    res = cv_lib.cross_validate(ops, probs, lambdas, cfg, pcfg, cvcfg)
    assert res.fold_test_mse.shape == (4, 12)
    assert res.mean_mse.shape == (12,)
    best = int(np.argmin(np.asarray(res.mean_mse)))
    # CV should not pick the unregularized extreme on noisy data, nor the
    # fully-collapsed lambda_max fit.
    assert 0 < best < 11
    # Held-out MSE at the best lambda beats the lambda_max (mean-only) fit.
    assert float(res.mean_mse[best]) < float(res.mean_mse[0])


def test_vmap_and_loop_folds_agree():
    data, y, _, spec = make_2d_problem(n=200, m=(5, 5))
    cfg = SolverConfig()
    pcfg = PathConfig(n_lambda=5, store="mse")
    ops = build_operators(spec.m, spec.deltas, cfg)
    problem = build_problem(spec, jnp.asarray(data, jnp.float32),
                            jnp.asarray(y, jnp.float32))
    lambdas = path_lib.create_lambdas(
        path_lib.lam_max(ops, problem, pcfg, spec.deltas), pcfg)
    labels = cv_lib.kfold_indices(200, 3, seed=5)
    probs = cv_lib.fold_problems(spec, jnp.asarray(data, jnp.float32),
                                 jnp.asarray(y, jnp.float32), labels, 3)
    r_vmap = cv_lib.cross_validate(ops, probs, lambdas, cfg, pcfg,
                                   CVConfig(folds=3, vmap_folds=True))
    r_loop = cv_lib.cross_validate(ops, probs, lambdas, cfg, pcfg,
                                   CVConfig(folds=3, vmap_folds=False))
    assert np.allclose(np.asarray(r_vmap.mean_mse),
                       np.asarray(r_loop.mean_mse), rtol=2e-2, atol=1e-3)
