"""Smoke tests for the plotting layer (headless Agg backend)."""

import numpy as np
import pytest

from multivartv_tpu import mvtv
from multivartv_tpu import plotting


@pytest.fixture(scope="module")
def model_2d():
    rng = np.random.RandomState(117)
    x = rng.uniform(size=(60, 2))
    y = rng.uniform(size=60)
    return mvtv(x, y, m=(3, 3), n_lambda=6, folds=1)


@pytest.fixture(scope="module")
def model_1d():
    rng = np.random.RandomState(7)
    x = rng.uniform(size=(50, 1))
    y = np.where(x[:, 0] > 0.5, 1.0, 0.0) + rng.normal(0, 0.2, 50)
    return mvtv(x, y, m=(6,), n_lambda=6, folds=1)


def test_plot_2d(model_2d, tmp_path):
    fig = plotting.plot_model(model_2d, save=str(tmp_path / "s.png"))
    assert (tmp_path / "s.png").exists()


def test_plot_1d(model_1d, tmp_path):
    fig = plotting.plot_model(model_1d, addmesh=True, save=str(tmp_path / "l.png"))
    assert (tmp_path / "l.png").exists()


def test_plot_at_lambda(model_2d):
    lam = float(np.sqrt(model_2d.lambdas[2] * model_2d.lambdas[3]))
    plotting.plot_model(model_2d, lam=lam)
    plotting.plot_model(model_2d, lam=float(model_2d.lambdas[0]) * 2)
    plotting.plot_model(model_2d, lam=float(model_2d.lambdas[-1]) / 2)


def test_plot_residuals(model_2d, tmp_path):
    plotting.plot_residuals(model_2d, save=str(tmp_path / "r.png"))
    assert (tmp_path / "r.png").exists()


def test_plot_cv_curve(model_2d):
    plotting.plot_cv_curve(model_2d)


def test_plot_3d_raises(model_2d):
    import dataclasses
    bad = dataclasses.replace(model_2d, data=np.zeros((10, 3)))
    with pytest.raises(ValueError):
        plotting.plot_model(bad)


def test_loess_exact_on_quadratic():
    """degree-2 LOESS reproduces a noiseless quadratic exactly (local
    quadratic fits are unbiased for polynomials of degree <= 2) — the
    reference's smoother semantics (R loess defaults, MultivarTV.R:74)."""
    from multivartv_tpu.plotting import _loess_smooth
    x = np.linspace(-2.0, 3.0, 80)
    y = 1.5 - 0.7 * x + 0.3 * x ** 2
    sm = _loess_smooth(x, y)
    np.testing.assert_allclose(sm, y, atol=1e-8)


def test_loess_smooths_noise():
    from multivartv_tpu.plotting import _loess_smooth
    rng = np.random.RandomState(0)
    x = np.sort(rng.uniform(0, 1, 200))
    y = np.sin(2 * np.pi * x)
    noisy = y + rng.randn(200) * 0.3
    sm = _loess_smooth(x, noisy, frac=0.4)
    # trend error well under the noise scale
    assert np.sqrt(np.mean((sm - y) ** 2)) < 0.15
