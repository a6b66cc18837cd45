"""Demo: bivariate TV denoising surface fit.

The reference's demo workload (code/demo_plottv.py:7-22): the bivariate
exponential test function on n=10,000 uniform samples with unit Gaussian
noise, m = 20x20 mesh, seed 117; fits the lambda path, plots the fitted
surface and the truth side by side.

Run from the repo root:  python examples/demo_surface.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def myexp2(x1, x2):
    z = 2 * np.maximum(0, x1 + x2)
    return np.exp(z) - (z + z ** 2 / 2 + z ** 3 / 6)


def main():
    from multivartv_tpu import mvtv

    rng = np.random.RandomState(117)
    n = 10_000
    x1 = rng.uniform(-1, 1, n)
    x2 = rng.uniform(-1, 1, n)
    data = np.stack([x1, x2], 1)
    ytrue = myexp2(x1, x2)
    y = ytrue + rng.normal(0, 1, n)

    t0 = time.time()
    model = mvtv(data, y, m=(20, 20), n_lambda=50, folds=5, verbose=True)
    print(f"fit: {time.time() - t0:.2f}s  "
          f"lambda.minmse={model.lambda_minmse:.4g}  "
          f"lambda.1se={model.lambda_1se:.4g}")
    print(f"MSE vs truth: {np.mean((model.fitted - ytrue) ** 2):.4f} "
          f"(noise var 1.0)")

    model.plot(save="demo_surface.png")
    model.plot_residuals(save="demo_residuals.png")
    from multivartv_tpu.plotting import plot_cv_curve
    plot_cv_curve(model, save="demo_cv.png")
    print("wrote demo_surface.png demo_residuals.png demo_cv.png")


if __name__ == "__main__":
    sys.exit(main())
