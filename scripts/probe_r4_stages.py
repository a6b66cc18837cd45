"""Round-4 probe: per-stage slope timings of the 4096^2 ADMM iteration.

Measures (slope method, CLAUDE.md) the full iteration and its stages in
isolation so the roofline model (utils/roofline.py) can be validated and
the fusion targets ranked.  One TPU process at a time.

Usage: python scripts/probe_r4_stages.py [m0 m1]
"""

import sys
import time
from functools import partial

import numpy as np

M = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (4096, 4096)
N_SAMPLES = 1 << 22
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


def main():
    import jax
    import jax.numpy as jnp
    from multivartv_tpu.config import SolverConfig
    from multivartv_tpu.ops import dct as dct_ops
    from multivartv_tpu.ops import pallas_kernels as pk
    from multivartv_tpu.solver.admm import (admm_fixed_iterations,
                                            initial_state,
                                            make_admm_iteration)
    from multivartv_tpu.solver import xupdate as xup
    from multivartv_tpu.solver.problem import build_operators
    from __graft_entry__ import _make_problem

    cfg = SolverConfig()
    spec, problem = _make_problem(M, N_SAMPLES, jnp.float32, seed=117)
    ops = build_operators(M, spec.deltas, cfg, jnp.float32)
    lam = jnp.asarray(LAM, jnp.float32)
    state0 = initial_state(ops, problem, rho0=lam / 5.0)
    lay = xup.spectral_layout(ops)
    print(f"m={M} layout={lay}")

    # --- full iteration ---
    @partial(jax.jit, static_argnums=(3,))
    def run_full(o, pr, st, n):
        return admm_fixed_iterations(o, pr, lam, st, cfg, n).theta

    full = slope(lambda st, n: run_full(ops, problem, st, n), state0, 5, 55)
    print(f"full_iteration: {full:.1f} iters/s  ({1e6/full:.0f} us)")

    # --- stages ---
    theta0 = state0.theta
    rho = jnp.asarray(LAM / 5.0, jnp.float32)

    @partial(jax.jit, static_argnums=(2,))
    def run_dual(o, th, n):
        def body(_, carry):
            th = carry
            alpha, u, stats = pk.dual_update_tiled_2d(
                th, state0.u, lam / rho, o.scales, u_scale=jnp.float32(1))
            return th + 1e-12 * alpha[0]
        return jax.lax.fori_loop(0, n, body, th)

    r = slope(lambda st, n: run_dual(ops, st, n), theta0, 20, 220)
    print(f"dual_kernel: {r:.1f} calls/s  ({1e6/r:.0f} us)")

    @partial(jax.jit, static_argnums=(2,))
    def run_rhs(o, th, n):
        def body(_, carry):
            b = pk.rhs_tiled_2d(state0.alpha, state0.u, carry, rho,
                                jnp.float32(1), o.scales)
            return b
        return jax.lax.fori_loop(0, n, body, th)

    r = slope(lambda st, n: run_rhs(ops, st, n), problem.oty, 20, 220)
    print(f"rhs_kernel: {r:.1f} calls/s  ({1e6/r:.0f} us)")

    @partial(jax.jit, static_argnums=(2,))
    def run_gram(o, th, n):
        def body(_, carry):
            return pk.gram_matvec_tiled_2d(carry, problem.counts, rho,
                                           o.scales)
        return jax.lax.fori_loop(0, n, body, th)

    r = slope(lambda st, n: run_gram(ops, st, n), theta0, 20, 220)
    print(f"gram_kernel: {r:.1f} calls/s  ({1e6/r:.0f} us)")

    # transforms (one fwd+inv pair per call, quartered/blocked per layout)
    p_dims = len(M)
    if lay == "quartered":
        to_b = lambda v: dct_ops.to_blocks4(v, p_dims)
        from_b = lambda v: dct_ops.from_blocks4(v, p_dims)
        fwd = lambda v: dct_ops.dctn_quartered(v, ops.dct_quarters_lp)
        inv = lambda v: dct_ops.idctn_quartered(v, ops.dct_quarters_lp)
    else:
        halves = ops.dct_halves_lp or ops.dct_halves
        to_b = lambda v: dct_ops.to_blocks(v, p_dims)
        from_b = lambda v: dct_ops.from_blocks(v, p_dims)
        fwd = lambda v: dct_ops.dctn_blocked(v, halves)
        inv = lambda v: dct_ops.idctn_blocked(v, halves)

    @partial(jax.jit, static_argnums=(1,))
    def run_tf(th, n):
        def body(_, carry):
            return from_b(inv(fwd(to_b(carry))))
        return jax.lax.fori_loop(0, n, body, th)

    r = slope(lambda st, n: run_tf(st, n), theta0, 20, 220)
    print(f"fwd+inv_pair (incl to/from_blocks): {r:.1f} calls/s  "
          f"({1e6/r:.0f} us)")

    # x-update in isolation
    cbar = jnp.sum(problem.counts) / ops.ntheta
    counts_b = xup.counts_to_layout(ops, problem.counts)

    @partial(jax.jit, static_argnums=(3,))
    def run_xup(o, pr, th, n):
        def body(_, carry):
            x, _ = xup.solve_x(o, pr.counts, cbar, pr.oty, rho, carry, cfg,
                               counts_blocked=counts_b, tiled_ok=True)
            return x
        return jax.lax.fori_loop(0, n, body, th)

    r = slope(lambda st, n: run_xup(ops, problem, st, n), theta0, 10, 110)
    print(f"x_update: {r:.1f} calls/s  ({1e6/r:.0f} us)")


if __name__ == "__main__":
    main()
