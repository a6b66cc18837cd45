"""Headline benchmark: ADMM iterations/s per chip on a 512x512 mesh.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "extras": {...}}

Workload (BASELINE.json config 2): 2-D TV denoising on a 512^2 lattice,
n = 2^20 samples, matrix-free stencil D, one-kernel folded-DCT-
preconditioned CG x-update, full reference ADMM semantics (Boyd residual
norms + adaptive rho each iteration).  The headline runs at the PRODUCTION
convergence-check cadence (SolverConfig chunk auto = solver/admm.py::
AUTO_CHUNK) — the exact configuration admm_solve uses — with the
single-kernel upper bound reported in extras.

Resilience (the round-2 lesson, BENCH_r02.json rc=1): the axon tunnel can
drop mid-run, surfacing as FAILED_PRECONDITION / backend errors on any
device call.  Every measurement here therefore
  (a) passes ops/problem/state into jit as ARGUMENTS — never closure
      constants, so tracing never needs to fetch a device array back
      through the tunnel for MLIR constant embedding (the exact crash of
      round 2), and
  (b) runs under _with_retry: on ANY exception all device arrays are
      rebuilt from host data and the measurement re-attempted with
      backoff.
A global deadline bounds total runtime so the driver never times out:
extras are skipped (recorded as "skipped: deadline") once past it.

extras (each guarded; a failure records a string instead of a number):
  chunk_iters               cadence the headline was measured at
  kernel_resident_iters_per_s  all BENCH iterations in ONE kernel launch
  batched_iters_per_s_b5    5 simultaneous problems (the CV-fold regime,
                            grid=(B,) kernel): total problem-iterations/s
  objective_rel_gap_512     |obj_fused - obj_xla| / obj_xla, both solved
                            to Boyd convergence at 512^2 on TPU (matched-
                            objective gate: BASELINE "at matched objective")
  iters_per_s_1024          one-kernel path at the raised 1024^2 gate
  iters_per_s_2048, _4096   packed-spectral XLA path above the VMEM
                            kernel gate (bf16 MXU folded-DCT transforms,
                            spectral-correction CG — solver/xupdate.py)
  iters_per_s_128cube       3-D 128^3 packed-spectral path (BASELINE
                            config 4)
  iters_per_s_256cube       3-D 16.8M-knot scale point (blocked layout +
                            p=3 tiled dual/gram kernels)
  iters_per_s_8192          67M-knot single-chip throughput (quartered
                            layout, bf16 CG vectors)
  iters_per_s_1d_1m         p=1 fused-lasso regime at 2^20 knots (exact
                            transposed-layout cyclic-reduction x-update,
                            solver/tridiag.py)
  sharded_config_iters_per_s_2048/_4096  the sharded-regime program's
                            per-chip floor, measured in the regime
                            sharding serves
  mvtv_e2e                  full mvtv(folds=5, n_lambda=20) product fit
                            at n=10^5 (default 316^2 mesh, padded
                            batched kernel route), compile-cached seconds
  converged_8192            one Boyd solve at 67M knots: iterations,
                            objective, convergence diagnostics
  roofline                  achieved fraction of the analytic HBM/MXU
                            bounds (utils/roofline.py, docs/MATH.md 5)

Baseline: the reference C++ performs a SuperLU factorize+solve of the
262144-unknown sparse system (O'O + rho D'D) inside *every* ADMM iteration
(rcpp-code/MultivarTV/src/solvers.cpp:113,126) plus the sparse matvecs.
R/Armadillo are not installed here, so the baseline is measured with
scipy's SuperLU on the same matrices — the same factorization library the
reference links against (Makevars:16), timed as factorize + solve + the
per-iteration sparse matvecs, single-core.  A measured fallback constant
is used if scipy is unavailable.
"""

import json
import os
import sys
import time

import numpy as np

M = (512, 512)
N_SAMPLES = 1 << 20
# Slope method: the axon tunnel imposes a fixed ~30 ms sync latency on
# every block_until_ready, independent of device work (measured: five
# chained 400-iteration calls complete in the same ~31 ms as one).  Timing
# a single call therefore massively overstates per-iteration cost.  The
# honest estimate is the *slope*: run N1 and N2 iterations of the exact
# same jitted program and divide the wall-clock difference by N2 - N1 —
# the fixed latency cancels exactly.
BENCH_ITERS_LO = 400
BENCH_ITERS_HI = 4400
LAM = 0.05
# scipy SuperLU at 512^2 measured at 2.5-3.5 s/iteration on this class of
# hardware; used only if the live measurement below fails.
FALLBACK_BASELINE_ITERS_PER_S = 0.4
# Total wall-clock budget; past it, remaining extras are skipped.
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "2400"))
_T_START = time.time()

RETRY_ATTEMPTS = 3
RETRY_BACKOFF_S = 15.0


def _remaining() -> float:
    return DEADLINE_S - (time.time() - _T_START)


def _with_retry(name, fn, attempts=RETRY_ATTEMPTS):
    """Run fn(); on any exception rebuild-from-scratch and retry.

    fn must construct ALL device arrays itself (every measure_* below
    does), so a retry starts from fresh host data — nothing stale survives
    a backend loss."""
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:
            print(f"# {name}: attempt {a + 1}/{attempts} failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
            if a == attempts - 1 or _remaining() < 60:
                raise
            time.sleep(RETRY_BACKOFF_S * (a + 1))


def _slope_time(run, state0, lo, hi, repeats=3):
    """Best-of-repeats slope timing of run(state, n) over n in {lo, hi}."""
    import jax

    def timed(n):
        out = run(state0, n)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = run(state0, n)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_lo, _ = timed(lo)
    t_hi, out = timed(hi)
    dt = t_hi - t_lo
    return (hi - lo) / dt, dt, out


def _make(m, n_samples, cfg, seed=117, batch=None):
    import jax.numpy as jnp
    from multivartv_tpu.solver.problem import build_operators
    from __graft_entry__ import _make_problem

    spec, problem = _make_problem(tuple(m), n_samples, jnp.float32,
                                  seed=seed, batch=batch)
    ops = build_operators(tuple(m), spec.deltas, cfg, jnp.float32)
    return ops, problem


def measure_tpu_iters_per_s(cfg, m=M, n_samples=N_SAMPLES,
                            lo=BENCH_ITERS_LO, hi=BENCH_ITERS_HI,
                            repeats=3):
    import jax
    import jax.numpy as jnp
    from functools import partial
    from multivartv_tpu.solver.admm import (
        admm_fixed_iterations, initial_state)

    ops, problem = _make(m, n_samples, cfg)
    lam = jnp.asarray(LAM, jnp.float32)
    state0 = initial_state(ops, problem, rho0=lam / 5.0)

    # ops/problem/state ride as jit ARGUMENTS, not closure constants:
    # constant embedding would fetch every device array back through the
    # tunnel at trace time (the BENCH_r02 crash), and at 4096^2+ would
    # push hundreds of MB of HLO literals through the remote compiler.
    @partial(jax.jit, static_argnums=(3,))
    def run_args(o, pr, st, n):
        return admm_fixed_iterations(o, pr, lam, st, cfg, n).theta

    def run(st, n):
        return run_args(ops, problem, st, n)

    iters_per_s, dt, _ = _slope_time(run, state0, lo, hi, repeats=repeats)
    return iters_per_s, dt


def measure_batched_iters_per_s(cfg, B=5):
    """The CV-fold regime: B simultaneous 512^2 problems through the
    grid=(B,) kernel.  Returns total problem-iterations/s."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from multivartv_tpu.solver.admm import (
        admm_fixed_iterations_batched, fused_batched_available,
        initial_state)

    ops, problems = _make(M, N_SAMPLES, cfg, batch=B)
    if not fused_batched_available(ops, problems, cfg):
        raise RuntimeError("batched fused kernel unavailable")
    lams = jnp.full((B,), LAM, jnp.float32)
    state0 = jax.vmap(
        lambda pr, l: initial_state(ops, pr, rho0=l / 5.0))(problems, lams)

    @partial(jax.jit, static_argnums=(3,))
    def run_args(o, pr, st, n):
        return admm_fixed_iterations_batched(o, pr, lams, st, cfg, n).theta

    def run(st, n):
        return run_args(ops, problems, st, n)

    lo, hi = 100, 600
    iters_per_s, dt, _ = _slope_time(run, state0, lo, hi)
    return iters_per_s * B, dt


def measure_objective_gap(cfg):
    """Matched-objective gate at bench scale: solve the SAME 512^2 problem
    to Boyd convergence with (a) the fused kernel path and (b) the plain
    XLA f32 path, and report the relative objective gap."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from multivartv_tpu.solver.admm import admm_solve, initial_state, objective

    ops, problem = _make(M, N_SAMPLES, cfg)
    lam = jnp.asarray(LAM, jnp.float32)

    def converge(c):
        @jax.jit
        def run(o, pr):
            st = initial_state(o, pr, rho0=lam / 5.0)
            st = admm_solve(o, pr, lam, st, c)
            fid, pen = objective(o, pr, st.theta)
            return fid + lam * pen, st.counter
        obj, iters = run(ops, problem)
        return float(obj), int(iters)

    obj_fused, it_fused = converge(cfg)
    # The comparison arm: exact f32 tol-driven DCT-PCG, no Pallas, no
    # packed bf16 preconditioner — independent numerics.
    cfg_xla = dataclasses.replace(cfg, use_pallas=False, chunk_iters=1,
                                  xla_packed=False)
    obj_xla, it_xla = converge(cfg_xla)
    gap = abs(obj_fused - obj_xla) / max(abs(obj_xla), 1e-30)
    return gap, obj_fused, obj_xla, it_fused, it_xla


def measure_scale(cfg, m, n_samples, lo, hi):
    """iters/s at an arbitrary lattice (XLA fallback above kernel gates)."""
    return measure_tpu_iters_per_s(cfg, m=m, n_samples=n_samples,
                                   lo=lo, hi=hi, repeats=2)[0]


def measure_e2e_mvtv():
    """The reference's PRODUCT workload end-to-end: a full cross-validated
    mvtv(folds=5, n_lambda=20) fit at a product-realistic size
    (n = 10^5 -> default mesh floor(sqrt(N)) = 316^2, unaligned — served
    by the padded batched kernel).  The reference's only published number
    is exactly this shape of workload (MultivarTV-Ex.timings:3).
    Returns (seconds on the second call — compile-cached, the steady-state
    product cost — , which solve path served the CV folds)."""
    import jax
    import jax.numpy as jnp
    from multivartv_tpu.api import mvtv
    from multivartv_tpu.config import SolverConfig
    from multivartv_tpu.solver.admm import fused_batched_available
    from multivartv_tpu.solver.problem import build_operators, build_problem
    from multivartv_tpu.api import _resolve_mesh
    from multivartv_tpu.config import DEFAULT_MESH

    rng = np.random.RandomState(117)
    n = 100_000
    x = rng.uniform(-1, 1, (n, 2))
    f = np.exp(-(x[:, 0] ** 2 + x[:, 1] ** 2))
    y = f + rng.randn(n) * 0.3

    # Which path serves the CV folds at the default mesh?
    cfg = SolverConfig()
    spec = _resolve_mesh(x, y, None, None, DEFAULT_MESH, jnp.float32)
    ops = build_operators(spec.m, spec.deltas, cfg, jnp.float32)
    problem = build_problem(spec, jnp.asarray(x, jnp.float32),
                            jnp.asarray(y, jnp.float32))
    route = ("padded-batched-kernel" if fused_batched_available(
        ops, problem, cfg) else "vmapped-jnp")
    print(f"# e2e mvtv: default mesh {spec.m}, CV route = {route}",
          file=sys.stderr)

    def fit():
        t0 = time.perf_counter()
        model = mvtv(x, y, n_lambda=20, folds=5)
        np.asarray(model.theta_hat)   # materialize on host
        return time.perf_counter() - t0, model

    t_first, _ = fit()       # includes compile
    t_second, model = fit()  # compile-cached product cost
    print(f"# e2e mvtv: first {t_first:.1f}s (with compile), "
          f"second {t_second:.1f}s; best lambda ind "
          f"{model.lambda_minmse_ind}", file=sys.stderr)
    return round(t_second, 2), route


def measure_converged_8192():
    """One Boyd solve at 8192^2 (67M knots) — a problem size the
    reference's sparse direct factorization cannot represent at all
    (rcpp-code/README.md:9) — run to convergence or the reference's own
    3000-iteration cap (solvers.cpp:103), with solver diagnostics and the
    objective recorded (VERDICT r3 #7: capability claims at this size
    previously rested on a fixed-iteration slope only)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from multivartv_tpu.config import SolverConfig
    from multivartv_tpu.solver.admm import (admm_solve, initial_state,
                                            objective, solver_diagnostics)

    m = (8192, 8192)
    cfg = SolverConfig(max_iters=3000)
    ops, problem = _make(m, 1 << 24, cfg)
    lam = jnp.asarray(LAM, jnp.float32)

    @partial(jax.jit)
    def run(o, pr):
        st = initial_state(o, pr, rho0=lam / 5.0)
        st = admm_solve(o, pr, lam, st, cfg)
        fid, pen = objective(o, pr, st.theta)
        return st, fid + lam * pen

    t0 = time.perf_counter()
    st, obj = run(ops, problem)
    jax.block_until_ready(st.theta)
    dt = time.perf_counter() - t0
    diag = solver_diagnostics(st)
    return {
        "iterations": diag["iterations"],
        "converged": diag["converged"],
        "diverged": diag["diverged"],
        "objective": float(obj),
        "primal_norm": diag["primal_norm"],
        "eps_primal": diag["eps_primal"],
        "wall_s": round(dt, 1),
    }


def roofline_extra(measured: dict):
    """Analytic HBM/MXU roofline for the measured large-lattice points
    (multivartv_tpu/utils/roofline.py; the per-stage table lives in
    docs/MATH.md)."""
    from multivartv_tpu.utils.roofline import model_report
    out = {}
    for key, m, lay in (("2048", (2048, 2048), "quartered"),
                        ("4096", (4096, 4096), "quartered"),
                        ("8192", (8192, 8192), "quartered"),
                        ("256cube", (256, 256, 256), "blocked")):
        meas = measured.get(key)
        if not isinstance(meas, (int, float)):
            continue
        r = model_report(m, layout=lay, measured_iters_per_s=float(meas))
        out[key] = {
            "model_bound_iters_per_s": r["model_bound_iters_per_s"],
            "floor_bound_iters_per_s": r["floor_bound_iters_per_s"],
            "practical_bound_iters_per_s": r["practical_bound_iters_per_s"],
            "frac_of_model_bound": r["frac_of_model_bound"],
            "frac_of_floor_bound": r["frac_of_floor_bound"],
            "frac_of_practical_bound": r["frac_of_practical_bound"],
            "achieved_gbps": r["achieved_gbps"],
        }
        if "hbm_model_uninformative" in r:
            # On-chip residency makes the HBM model a lower bound here
            # (e.g. 2048^2) — carry the flag so BENCH_r*.json readers
            # don't misread a fraction > 1 as kernel efficiency.
            out[key]["hbm_model_uninformative"] = r[
                "hbm_model_uninformative"]
    meas1d = measured.get("1d_1m")
    if isinstance(meas1d, (int, float)):
        from multivartv_tpu.utils.roofline import model_report_1d
        r = model_report_1d(1 << 20, measured_iters_per_s=float(meas1d))
        out["1d_1m"] = {
            "model_bound_iters_per_s": r["model_bound_iters_per_s"],
            "frac_of_model_bound": r["frac_of_model_bound"],
            "achieved_gbps": r["achieved_gbps"],
        }
    return out


def measure_reference_baseline(budget_s: float = 120.0):
    """Single-core SuperLU factorize+solve per ADMM iteration at 512^2
    (the reference's per-iteration cost, solvers.cpp:110-126)."""
    try:
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla
        try:  # restrict BLAS threading to one core for a fair single-core ref
            from threadpoolctl import threadpool_limits
            ctx = threadpool_limits(limits=1)
        except Exception:
            ctx = None
        m1, m2 = M
        # O'O diag from the same sample distribution
        rng = np.random.RandomState(117)
        counts = np.bincount(
            rng.randint(0, m1 * m2, size=N_SAMPLES), minlength=m1 * m2
        ).astype(np.float64)
        d1 = sp.diags([[-1.0] * (m1 - 1), [1.0] * (m1 - 1)], [0, 1],
                      shape=(m1 - 1, m1))
        d2 = sp.diags([[-1.0] * (m2 - 1), [1.0] * (m2 - 1)], [0, 1],
                      shape=(m2 - 1, m2))
        I1, I2 = sp.identity(m1), sp.identity(m2)
        delta = 2.0 / m1
        blocks = [
            sp.kron(d1, d2),                 # mixed partial
            delta * sp.kron(I1, d2),         # d/dx2
            delta * sp.kron(d1, I2),         # d/dx1
        ]
        D = sp.vstack(blocks).tocsr()
        A = (sp.diags(counts) + 0.01 * (D.T @ D)).tocsc()
        b = rng.randn(m1 * m2)
        t0 = time.perf_counter()
        lu = spla.splu(A)          # per-iteration refactorization
        x = lu.solve(b)
        _ = D @ x                  # the per-iteration sparse matvecs
        _ = D.T @ (D @ x)
        dt = time.perf_counter() - t0
        return 1.0 / dt
    except Exception as e:
        print(f"# baseline measurement failed ({e}); using fallback",
              file=sys.stderr)
        return FALLBACK_BASELINE_ITERS_PER_S


def main():
    import dataclasses
    from multivartv_tpu.config import SolverConfig
    from multivartv_tpu.solver.admm import resolve_chunk

    cfg = SolverConfig()           # PRODUCTION config (chunk auto)
    extras = {"chunk_iters": resolve_chunk(cfg)}

    headline_err = None
    try:
        iters_per_s, dt = _with_retry(
            "headline", lambda: measure_tpu_iters_per_s(cfg))
        print(f"# tpu: {iters_per_s:.1f} ADMM iters/s at production cadence "
              f"chunk={extras['chunk_iters']} (slope over "
              f"{BENCH_ITERS_HI - BENCH_ITERS_LO} iters, {dt:.3f}s)",
              file=sys.stderr)
    except Exception as e:
        headline_err = f"{type(e).__name__}: {str(e)[:300]}"
        iters_per_s = 0.0
        print(f"# headline FAILED after retries: {headline_err}",
              file=sys.stderr)

    def guarded(name, fn):
        if _remaining() < 120:
            print(f"# {name} skipped: deadline", file=sys.stderr)
            return "skipped: deadline"
        try:
            t0 = time.perf_counter()
            val = _with_retry(name, fn, attempts=2)
            print(f"# {name} = {val} [{time.perf_counter()-t0:.1f}s]",
                  file=sys.stderr)
            return val
        except Exception as e:  # record, never kill the headline
            msg = f"failed: {type(e).__name__}: {str(e)[:200]}"
            print(f"# {name} {msg}", file=sys.stderr)
            return msg

    skip_extras = os.environ.get("BENCH_HEADLINE_ONLY", "") == "1"
    if not skip_extras:
        extras["kernel_resident_iters_per_s"] = guarded(
            "kernel_resident",
            lambda: round(measure_tpu_iters_per_s(
                dataclasses.replace(cfg, chunk_iters=BENCH_ITERS_HI))[0], 1))
        extras["batched_iters_per_s_b5"] = guarded(
            "batched_b5",
            lambda: round(measure_batched_iters_per_s(cfg, B=5)[0], 1))

        def _gap():
            gap, of, ox, itf, itx = measure_objective_gap(cfg)
            print(f"#   obj fused={of:.6g} ({itf} it) xla={ox:.6g} "
                  f"({itx} it)", file=sys.stderr)
            return round(gap, 8)
        extras["objective_rel_gap_512"] = guarded("objective_gap", _gap)
        extras["iters_per_s_1024"] = guarded(
            "1024^2", lambda: round(measure_scale(
                cfg, (1024, 1024), 1 << 21, 100, 1100), 1))
        extras["iters_per_s_2048"] = guarded(
            "2048^2", lambda: round(measure_scale(
                cfg, (2048, 2048), 1 << 22, 20, 120), 1))
        extras["iters_per_s_4096"] = guarded(
            "4096^2", lambda: round(measure_scale(
                cfg, (4096, 4096), 1 << 22, 5, 30), 1))
        extras["iters_per_s_128cube"] = guarded(
            "128^3", lambda: round(measure_scale(
                cfg, (128, 128, 128), 1 << 21, 20, 120), 1))
        extras["iters_per_s_256cube"] = guarded(
            "256^3", lambda: round(measure_scale(
                cfg, (256, 256, 256), 1 << 22, 10, 60), 1))
        # p = 1 long lattice (the m = N fused-lasso regime at scale):
        # EXACT transposed-layout cyclic-reduction x-update, any n, no
        # transform gate (solver/tridiag.py).
        extras["iters_per_s_1d_1m"] = guarded(
            "1d_2^20", lambda: round(measure_scale(
                cfg, (1 << 20,), 1 << 22, 50, 350), 1))

        # The sharded-regime program (no Pallas, distributed-DCT PCG
        # config) on one chip, measured IN THE REGIME SHARDING SERVES
        # (2048^2/4096^2 — VERDICT r3 weak #3: the old 512^2 number
        # compared against the Pallas path that sharding never uses).
        # Scaling efficiency on N chips = this per-chip floor held as
        # collectives overlap (the 8-device dryrun proves the collective
        # program + boundary-scaled halo bytes).
        from multivartv_tpu.parallel.fit import _sharded_solver_config
        sharded_cfg = _sharded_solver_config(cfg)
        extras["sharded_config_iters_per_s_2048"] = guarded(
            "sharded_config_2048", lambda: round(measure_scale(
                sharded_cfg, (2048, 2048), 1 << 22, 20, 120), 1))
        extras["sharded_config_iters_per_s_4096"] = guarded(
            "sharded_config_4096", lambda: round(measure_scale(
                sharded_cfg, (4096, 4096), 1 << 22, 5, 30), 1))

        extras["iters_per_s_8192"] = guarded(
            "8192^2", lambda: round(measure_scale(
                cfg, (8192, 8192), 1 << 24, 3, 18), 1))

        extras["mvtv_e2e"] = guarded("mvtv_e2e", lambda: dict(zip(
            ("seconds", "route"), measure_e2e_mvtv())))
        extras["converged_8192"] = guarded("converged_8192",
                                           measure_converged_8192)
        extras["roofline"] = guarded("roofline", lambda: roofline_extra({
            "2048": extras.get("iters_per_s_2048"),
            "4096": extras.get("iters_per_s_4096"),
            "8192": extras.get("iters_per_s_8192"),
            "256cube": extras.get("iters_per_s_256cube"),
            "1d_1m": extras.get("iters_per_s_1d_1m"),
        }))

    baseline = measure_reference_baseline()
    print(f"# reference proxy (SuperLU single-core): {baseline:.3f} iters/s",
          file=sys.stderr)
    result = {
        "metric": "admm_iterations_per_s_512x512_per_chip",
        "value": round(iters_per_s, 2),
        "unit": "iterations/s",
        "vs_baseline": round(iters_per_s / baseline, 2),
        "extras": extras,
    }
    if headline_err is not None:
        result["error"] = headline_err
    print(json.dumps(result))


if __name__ == "__main__":
    main()
