"""Demo: univariate piecewise-constant fit and the fused-lasso limit.

Mirrors the reference vignette's 1-D workloads
(rcpp-code/.../vignettes/MultivarTV-intro.Rmd:84-118): a piecewise-constant
signal fit with a coarse mesh, and the m = n, mesh = x configuration that
makes MVTV the 1-D fused lasso exactly.

Run from the repo root:  python examples/demo_1d_fused_lasso.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from multivartv_tpu import mvtv

    rng = np.random.RandomState(117)
    n = 300
    x = np.sort(rng.uniform(0, 1, n))
    truth = np.where(x < 0.3, 1.0, np.where(x < 0.6, -1.0, 2.0))
    y = truth + rng.normal(0, 0.35, n)

    # Coarse-mesh MVTV fit (default m = floor(sqrt(n)))
    model = mvtv(x[:, None], y, n_lambda=60, folds=5)
    mse = np.mean((model.predict(x[:, None]) - truth) ** 2)
    print(f"mesh m={model.m}: MSE vs truth {mse:.4f} "
          f"(signal var {np.var(truth):.3f})")
    model.plot(addmesh=True, save="demo_1d.png")

    # Fused-lasso limit: one knot per sample.
    fl = mvtv(x[:, None], y, m=(n,), mesh=x[:, None], n_lambda=40, folds=5)
    mse_fl = np.mean((fl.predict(x[:, None]) - truth) ** 2)
    print(f"fused lasso (m=n): MSE vs truth {mse_fl:.4f}")
    fl.plot(save="demo_1d_fused.png")
    print("wrote demo_1d.png demo_1d_fused.png")


if __name__ == "__main__":
    main()
