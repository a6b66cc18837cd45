"""Round-4 probe: spectral_vec_bf16 A/B at large lattices.

(a) iters/s with f32 vs bf16 CG block vectors at 4096^2 (and optionally
    2048^2 / 8192^2);
(b) convergence + objective parity: Boyd-converge the same 2048^2 problem
    both ways, compare objectives and iteration counts (hover check).

Usage: python scripts/probe_r4_bf16.py [speed|conv|both]
"""

import sys
import time
from functools import partial

import numpy as np

LAM = 0.05


def slope(run, state0, lo, hi, repeats=2):
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
        return best
    t_lo = timed(lo)
    t_hi = timed(hi)
    return (hi - lo) / (t_hi - t_lo)


def build(m, n_samples, cfg):
    import jax.numpy as jnp
    from multivartv_tpu.solver.problem import build_operators
    from __graft_entry__ import _make_problem
    spec, problem = _make_problem(m, n_samples, jnp.float32, seed=117)
    ops = build_operators(m, spec.deltas, cfg, jnp.float32)
    return ops, problem


def speed(m, lo, hi):
    import jax
    import jax.numpy as jnp
    import dataclasses
    from multivartv_tpu.config import SolverConfig
    from multivartv_tpu.solver.admm import (admm_fixed_iterations,
                                            initial_state)
    lam = jnp.asarray(LAM, jnp.float32)
    for bf16 in (False, True):
        cfg = SolverConfig(spectral_vec_bf16=bf16)
        ops, problem = build(m, 1 << 22, cfg)
        state0 = initial_state(ops, problem, rho0=lam / 5.0)

        @partial(jax.jit, static_argnums=(3,))
        def run_args(o, pr, st, n):
            return admm_fixed_iterations(o, pr, lam, st, cfg, n).theta

        r = slope(lambda st, n: run_args(ops, problem, st, n),
                  state0, lo, hi)
        print(f"m={m} spectral_vec_bf16={bf16}: {r:.1f} iters/s "
              f"({1e6/r:.0f} us)", flush=True)


def conv(m):
    import jax
    import jax.numpy as jnp
    from multivartv_tpu.config import SolverConfig
    from multivartv_tpu.solver.admm import (admm_solve, initial_state,
                                            objective)
    lam = jnp.asarray(LAM, jnp.float32)
    res = {}
    for bf16 in (False, True):
        cfg = SolverConfig(spectral_vec_bf16=bf16)
        ops, problem = build(m, 1 << 22, cfg)

        @jax.jit
        def run(o, pr):
            st = initial_state(o, pr, rho0=lam / 5.0)
            st = admm_solve(o, pr, lam, st, cfg)
            fid, pen = objective(o, pr, st.theta)
            return fid + lam * pen, st.counter, st.primal_norm, st.eps_primal
        t0 = time.perf_counter()
        obj, it, pn, ep = run(ops, problem)
        jax.block_until_ready(obj)
        dt = time.perf_counter() - t0
        res[bf16] = (float(obj), int(it))
        print(f"m={m} bf16={bf16}: obj={float(obj):.8g} iters={int(it)} "
              f"primal={float(pn):.3g} eps={float(ep):.3g} [{dt:.0f}s]",
              flush=True)
    o0, i0 = res[False]
    o1, i1 = res[True]
    print(f"rel obj gap = {abs(o1-o0)/abs(o0):.3g}; iters {i0} vs {i1}",
          flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("speed", "both"):
        speed((4096, 4096), 5, 55)
        speed((2048, 2048), 20, 220)
    if mode in ("conv", "both"):
        conv((2048, 2048))
