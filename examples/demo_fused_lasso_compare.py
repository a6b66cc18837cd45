"""1-D piecewise-constant fit + fused-lasso equivalence — the reference
vignette's univariate workloads (MultivarTV-intro.Rmd:84-118, figures 1-3).

Reproduces:
  * the m=20 mesh-based TV fit of the piecewise-constant function
    (vignette pcwise, MultivarTV-intro.Rmd:44-52; seed 123, N=100,
    sigma=0.1);
  * the fused-lasso equivalence: with m=N and mesh=x the mesh-based
    solution IS the 1-D fused lasso (vignette fig 3 vs genlasso).  Here
    the genlasso comparator is replaced by an EXACT solve: with one
    sample per knot, O'O = I, so the DCT-diagonalized direct x-update is
    exact and ADMM converges to the fused-lasso solution; the Jacobi-PCG
    path must agree.

Run: python examples/demo_fused_lasso_compare.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from multivartv_tpu.api import mvtv, mvtv_one
from multivartv_tpu.config import SolverConfig


def pcwise(x):
    """Vignette pcf (MultivarTV-intro.Rmd:44-52)."""
    return np.where(x < 0.1, 0.5,
                    np.where(x < 0.6, 3.0, np.where(x < 0.8, 0.5, 2.0)))


def main():
    rng = np.random.RandomState(123)          # vignette seed 123
    n = 100
    x = np.sort(rng.uniform(size=n))
    f = pcwise(x)
    y = f + rng.randn(n) * 0.1

    # --- Figure 1 analog: m=20 mesh fit, 5-fold CV --------------------
    t0 = time.time()
    fit20 = mvtv(x, y, m=(20,), folds=5)
    mse20 = float(np.mean((fit20.fitted - f) ** 2))
    print(f"m=20 TV fit: truth MSE {mse20:.4f} (noise var 0.01), best "
          f"lambda {fit20.lambda_minmse:.4g}, {time.time()-t0:.1f}s")

    # --- Figure 3 analog: fused lasso via m=N, mesh=x ------------------
    # One sample per knot => exact problem; solve with two independent
    # x-update backends and cross-check (the vignette compares against
    # genlasso::fusedlasso1d).
    lam = 0.2
    flA = mvtv_one(x, y, m=(n,), mesh=x[:, None], lam=lam,
                   solver_config=SolverConfig(x_solver="dct_direct"))
    flB = mvtv_one(x, y, m=(n,), mesh=x[:, None], lam=lam,
                   solver_config=SolverConfig(x_solver="jacobi_pcg",
                                              use_pallas=False))
    gap = float(np.max(np.abs(flA["theta_hat"] - flB["theta_hat"])))
    print(f"fused lasso (m=N, mesh=x) at lambda={lam}: "
          f"dct_direct vs jacobi_pcg max gap {gap:.2e}")

    # Fused-lasso KKT certificate.  The solver's implicit objective is
    # 0.5 ||y - theta||^2 + lam ||D theta||_1 (solver/admm.py::objective),
    # whose stationarity condition makes eta = cumsum(theta - y) a dual
    # vector with |eta_j| <= lam everywhere and |eta_j| = lam exactly at
    # every jump of theta — the same certificate genlasso's path solver
    # maintains.
    theta = flA["theta_hat"]
    eta = np.cumsum(theta - y)[:-1]
    kkt_max = float(np.max(np.abs(eta)))
    mse_fl = float(np.mean((theta - f) ** 2))
    print(f"KKT: max |cumsum(resid)| = {kkt_max:.4g} vs lambda = {lam} "
          f"(dual feasible: {kkt_max <= lam * 1.01}); truth MSE {mse_fl:.4f}")

    jumps = np.abs(np.diff(theta)) > 1e-2
    print(f"fused-lasso solution: {int(jumps.sum())} material jumps / "
          f"{n - 1} boundaries (piecewise constant)")
    assert kkt_max <= lam * 1.02, "fused-lasso dual certificate violated"
    assert mse_fl < 0.02

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        xs = np.linspace(0, 1, 400)
        axes[0].scatter(x, y, s=8, c="gray", label="data")
        axes[0].plot(xs, pcwise(xs), "k--", lw=1, label="truth")
        axes[0].step(np.sort(x), fit20.predict(np.sort(x)), "r",
                     where="mid", label="TV m=20")
        axes[0].legend()
        axes[0].set_title("mesh-based TV fit (vignette fig 1)")
        axes[1].scatter(x, y, s=8, c="gray")
        axes[1].step(x, theta, "b", where="mid", label="fused lasso m=N")
        axes[1].legend()
        axes[1].set_title("fused-lasso equivalence (vignette fig 3)")
        out = os.path.join(os.path.dirname(__file__), "fused_lasso.png")
        fig.savefig(out, dpi=110)
        print(f"saved {out}")
    except Exception as e:
        print(f"(plotting skipped: {e})")

    # m=20 knots quantize the jump locations (cell width 0.05 x jump^2
    # ~6), putting the truth-MSE floor near 0.1 regardless of lambda.
    assert mse20 < 0.2
    assert gap < 1e-2
    print("demo_fused_lasso_compare OK")


if __name__ == "__main__":
    main()
