"""Towers workload — the reference vignette's flagship 2-D example
(MultivarTV-intro.Rmd:84-208, figures 4-8): N=100 noisy draws from the
four-towers function, 5-fold cross-validated TV fit, compared against a
thin-plate spline smoother at two noise levels.

Reproduces the vignette's qualitative result: the TV solution recovers
flat-topped towers on a flat plain (piecewise-constant), while the TPS
rounds them into hills; at higher noise the TV fit regularizes harder.

Run: python examples/demo_towers.py  (TPU or CPU; saves PNGs + prints an
MSE table).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from multivartv_tpu.api import mvtv


def towers(x1, x2):
    """Four towers on a plain (vignette MultivarTV-intro.Rmd:29-37):
    heights 1 and 0.5 on the corner squares [<0.2 / >0.8]^2."""
    return (
        1.0 * (x1 > 0.8) * (x2 > 0.8)
        + 0.5 * (x1 > 0.8) * (x2 < 0.2)
        + 1.0 * (x1 < 0.2) * (x2 < 0.2)
        + 0.5 * (x1 < 0.2) * (x2 > 0.8)
    )


def tps_fit(data, y, grid):
    """Thin-plate-spline smoother (the vignette's fields::Tps comparator,
    MultivarTV-intro.Rmd:176-181) via scipy's RBF interpolator."""
    from scipy.interpolate import RBFInterpolator
    rbf = RBFInterpolator(data, y, kernel="thin_plate_spline", smoothing=10.0)
    return rbf(grid)


def main():
    rng = np.random.RandomState(117)         # vignette seed 117
    n = 100
    z1 = rng.uniform(size=n)
    z2 = rng.uniform(size=n)
    f = towers(z1, z2)
    data = np.column_stack([z1, z2])
    m = (10, 10)                              # floor(sqrt(N)) default rule

    g = np.linspace(0.01, 0.99, 40)
    gx, gy = np.meshgrid(g, g, indexing="ij")
    grid = np.column_stack([gx.ravel(), gy.ravel()])
    truth_grid = towers(grid[:, 0], grid[:, 1])

    rows = []
    fits = {}
    for sigma in (0.5, 1.0):
        ynoisy = f + rng.randn(n) * sigma
        t0 = time.time()
        tv = mvtv(data, ynoisy, m, folds=5)
        tv_grid = tv.predict(grid)
        tv_mse = float(np.mean((tv_grid - truth_grid) ** 2))
        wall = time.time() - t0
        try:
            tps_grid = tps_fit(data, ynoisy, grid)
            tps_mse = float(np.mean((tps_grid - truth_grid) ** 2))
        except Exception as e:  # scipy absent: TV-only table
            tps_grid, tps_mse = None, float("nan")
            print(f"(TPS comparator unavailable: {e})")
        rows.append((sigma, tv_mse, tps_mse, tv.lambda_minmse, wall))
        fits[sigma] = (tv, tv_grid, tps_grid)

    print("\nTowers function, N=100 (truth-grid MSE, 40x40 eval grid)")
    print(f"{'sigma':>6} {'TV mse':>10} {'TPS mse':>10} {'best lambda':>12} "
          f"{'fit wall s':>10}")
    for sigma, tv_mse, tps_mse, lam, wall in rows:
        print(f"{sigma:6.1f} {tv_mse:10.4f} {tps_mse:10.4f} {lam:12.4g} "
              f"{wall:10.1f}")

    # Qualitative invariant (vignette figures 5 vs 6): the TV fit is
    # piecewise constant — few distinct levels — while the TPS is smooth.
    tv, tv_grid, _ = fits[0.5]
    levels = np.unique(np.round(tv_grid, 3)).size
    print(f"\nTV fit distinct levels (sigma=0.5): {levels} "
          f"(piecewise-constant towers; TPS would have ~1600)")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure(figsize=(12, 5))
        for i, sigma in enumerate((0.5, 1.0)):
            _, tvg, tpsg = fits[sigma]
            ax = fig.add_subplot(1, 2, i + 1, projection="3d")
            ax.plot_surface(gx, gy, tvg.reshape(40, 40), cmap="viridis",
                            alpha=0.9)
            ax.scatter(z1, z2, f, c="r", s=6)
            ax.set_title(f"TV solution, sigma={sigma}")
        out = os.path.join(os.path.dirname(__file__), "towers_tv.png")
        fig.savefig(out, dpi=110)
        print(f"saved {out}")
    except Exception as e:
        print(f"(plotting skipped: {e})")

    # Vignette-parity invariants: the TV fit recovers the towers (MSE well
    # under the sigma=0.5 noise variance 0.25) and is at least competitive
    # with the TPS smoother on this piecewise-constant truth.
    tv_mse, tps_mse = rows[0][1], rows[0][2]
    assert tv_mse < 0.15, f"TV fit should recover the towers: {tv_mse}"
    if np.isfinite(tps_mse):
        assert tv_mse <= 1.1 * tps_mse, (tv_mse, tps_mse)
    print("demo_towers OK")


if __name__ == "__main__":
    main()
