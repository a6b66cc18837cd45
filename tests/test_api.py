"""End-to-end API tests mirroring the reference's roxygen examples and
R-side post-processing (MultivarTV.R:29-58, 156-170)."""

import numpy as np
import pytest

import golden
from multivartv_tpu import mvtv, mvtv_one, predict_mvtv, gen_mesh
from multivartv_tpu.api import MVTVModel


def _example_data(seed=117, n=50):
    # The reference roxygen example (MultivarTV.R:30-40): uniform x (n x 2),
    # uniform y, m = 3x3.
    rng = np.random.RandomState(seed)
    x = rng.uniform(size=(n, 2))
    y = rng.uniform(size=n)
    return x, y


def test_mvtv_folds1_example():
    x, y = _example_data()
    model = mvtv(x, y, m=(3, 3), n_lambda=20, folds=1)
    assert isinstance(model, MVTVModel)
    assert model.theta_hat.shape == (9,)
    assert model.fitted.shape == (50,)
    assert model.residuals.shape == (50,)
    assert model.lambdas.shape == (20,)
    assert len(model.models) == 20
    assert 0 <= model.lambda_minmse_ind < 20
    assert model.mesh.shape == (9, 2)
    assert np.allclose(model.residuals, model.y - model.fitted)


def test_mvtv_folds5_example():
    x, y = _example_data()
    model = mvtv(x, y, m=(3, 3), n_lambda=15, folds=5)
    assert model.cv_mses.shape == (15,)
    # lambda.1se is one of the grid values and <= lambda_minmse per the
    # last-candidate rule on a descending grid.
    assert model.lambda_1se in set(model.lambdas.tolist())
    assert model.lambda_1se <= model.lambda_minmse + 1e-12


def test_default_m_rule():
    # floor(sqrt(N)) knots per axis (MultivarTV.R:44-48).
    x, y = _example_data(n=50)
    model = mvtv(x, y, n_lambda=5, folds=1)
    assert model.m == (7, 7)


def test_predict_roundtrip():
    x, y = _example_data()
    model = mvtv(x, y, m=(3, 3), n_lambda=10, folds=1)
    # predict() with no data returns stored fitted (MultivarTV.cpp:57).
    assert np.allclose(model.predict(), model.fitted)
    # predicting the training data reproduces fitted values.
    assert np.allclose(model.predict(x), model.fitted, atol=1e-6)
    # new data maps to nearest-knot values of theta.
    newx = np.random.RandomState(1).uniform(size=(20, 2))
    preds = model.predict(newx)
    assert preds.shape == (20,)
    assert set(np.round(preds, 5)).issubset(set(np.round(model.theta_hat, 5)))
    # functional entry point
    assert np.allclose(predict_mvtv(model, newx), preds)


def test_mvtv_one_dict_surface():
    x, y = _example_data()
    out = mvtv_one(x, y, m=(3, 3))
    for key in ("mesh", "theta_hat", "fitted", "counter", "lambda", "m"):
        assert key in out
    assert out["theta_hat"].shape == (9,)
    out2 = predict_mvtv(out, x)
    assert np.allclose(out2, out["fitted"], atol=1e-6)


def test_gen_mesh_entry_point():
    x, y = _example_data()
    mesh = np.asarray(gen_mesh(x, (3, 3)))
    assert mesh.shape == (9, 2)
    # axis-0-fastest: first three rows share the x2 coordinate.
    assert np.allclose(mesh[:3, 1], mesh[0, 1])
    # pass-through of a user mesh
    mesh2 = np.asarray(gen_mesh(x, (3, 3), mesh=mesh))
    assert np.allclose(mesh, mesh2)


def test_user_lambdas_respected():
    x, y = _example_data()
    lams = np.asarray([0.5, 0.1, 0.02])
    model = mvtv(x, y, m=(3, 3), lambdas=lams, folds=1)
    assert np.allclose(model.lambdas, lams, rtol=1e-6)
    assert len(model.models) == 3


def test_univariate_fit():
    # 1-D piecewise-constant signal (vignette workload,
    # MultivarTV-intro.Rmd:84-110).
    rng = np.random.RandomState(117)
    n = 120
    x = np.sort(rng.uniform(0, 1, n))
    truth = np.where(x < 0.35, 0.0, np.where(x < 0.7, 2.0, -1.0))
    y = truth + rng.normal(0, 0.3, n)
    model = mvtv(x[:, None], y, m=(11,), n_lambda=25, folds=5)
    mse_best = float(np.mean((model.predict(x[:, None]) - truth) ** 2))
    mse_null = float(np.var(truth))
    assert mse_best < 0.25 * mse_null


def test_pointcloud_mesh_support():
    """Arbitrary (non-lattice) user mesh: reference gen_mesh pass-through
    semantics — nearest assignment by geometry, D by lattice index."""
    rng = np.random.RandomState(7)
    x, y = _example_data()
    base = np.asarray(gen_mesh(x, (3, 3)))
    jitter = base + rng.normal(0, 0.02, base.shape)  # not a lattice
    model = mvtv(x, y, m=(3, 3), mesh=jitter, n_lambda=8, folds=1)
    assert np.allclose(model.mesh, jitter)
    assert model.theta_hat.shape == (9,)
    # predictions snap to nearest jittered knots
    preds = model.predict(x)
    assert np.allclose(preds, model.fitted, atol=1e-6)
    # golden cross-check of the O assignment (brute force over rows)
    d = ((x[:, None, :] - jitter[None, :, :]) ** 2).sum(-1)
    want_ref_idx = d.argmin(1)
    got = model.fitted
    theta = model.theta_hat
    assert np.allclose(got, theta[want_ref_idx], atol=1e-5)


def test_ftrue_argument():
    x, y = _example_data()
    ftrue = np.zeros_like(y)
    model = mvtv(x, y, m=(3, 3), n_lambda=8, folds=1, ftrue=ftrue)
    # path MSEs recorded vs ftrue
    assert len(model.models) == 8
    assert all(np.isfinite(m["mse"]) for m in model.models)


def test_mvtv_3d_smoke():
    """End-to-end p=3 fit + predict, mirroring the reference dev script's
    p in {1,2,3} smoke runs (rcpp-code/test_mbs_cpp2r.R:51-56)."""
    rng = np.random.RandomState(117)
    n = 60
    x = rng.uniform(size=(n, 3))
    y = rng.uniform(size=n)
    model = mvtv(x, y, m=(3, 3, 3), n_lambda=8, folds=5)
    assert model.m == (3, 3, 3)
    assert model.theta_hat.shape == (27,)
    assert model.mesh.shape == (27, 3)
    assert model.fitted.shape == (n,)
    assert np.all(np.isfinite(model.fitted))
    assert model.cv_mses.shape == (8,)
    preds = model.predict(rng.uniform(size=(10, 3)))
    assert preds.shape == (10,)
    assert np.all(np.isfinite(preds))


def test_path_store_auto_degrades(caplog):
    """store='fitted' silently blowing up HBM at scale is auto-degraded to
    'mse' with a logged notice (solver/path.py::_effective_store)."""
    import jax.numpy as jnp
    from multivartv_tpu.config import PathConfig, SolverConfig
    from multivartv_tpu.solver import path as path_lib
    from multivartv_tpu.solver.problem import build_operators, build_problem
    from multivartv_tpu import mesh as mesh_lib

    x, y = _example_data()
    spec = mesh_lib.make_mesh_spec(jnp.asarray(x), (3, 3))
    cfg = SolverConfig(max_iters=5)
    ops = build_operators(spec.m, spec.deltas, cfg)
    problem = build_problem(spec, jnp.asarray(x, jnp.float32),
                            jnp.asarray(y, jnp.float32))
    lambdas = jnp.asarray([0.5, 0.1], jnp.float32)
    old_budget = path_lib.STORE_BUDGET_ELEMS
    try:
        path_lib.STORE_BUDGET_ELEMS = 10   # force the degrade
        import logging
        with caplog.at_level(logging.WARNING, logger="multivartv_tpu"):
            res = path_lib.solve_path(ops, problem, lambdas, cfg,
                                      PathConfig(store="fitted"))
    finally:
        path_lib.STORE_BUDGET_ELEMS = old_budget
    assert res.thetas is None and res.fitted is None
    assert any("auto-degrading" in r.message for r in caplog.records)
    # Under the real budget the tiny path stores as asked.
    res2 = path_lib.solve_path(ops, problem, lambdas, cfg,
                               PathConfig(store="fitted"))
    assert res2.thetas is not None
