"""Round-4 probe: tiled-kernel panel-height sweep at 4096^2.

The r3 tiled kernels run at ~55-60% of HBM bandwidth at the default
~2 MB panel target (T=128 rows at m1=4096).  Larger panels amortize halo
DMA and per-tile overhead; VMEM bounds the sweep (~18 live panel temps).

Usage: python scripts/probe_r4_tiles.py
"""

import time
from functools import partial

import numpy as np

M = (4096, 4096)
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
    from multivartv_tpu.ops import pallas_kernels as pk
    from multivartv_tpu.solver.admm import initial_state
    from multivartv_tpu.solver.problem import build_operators
    from __graft_entry__ import _make_problem

    cfg = SolverConfig()
    spec, problem = _make_problem(M, 1 << 22, jnp.float32, seed=117)
    ops = build_operators(M, spec.deltas, cfg, jnp.float32)
    lam = jnp.asarray(LAM, jnp.float32)
    state0 = initial_state(ops, problem, rho0=lam / 5.0)
    rho = jnp.asarray(LAM / 5.0, jnp.float32)
    theta0 = state0.theta

    for T in (128, 160, 192, 256, 320):
        if M[0] % T:
            continue

        @partial(jax.jit, static_argnums=(2, 3))
        def run_dual(o, th, n, T):
            def body(_, carry):
                alpha, u, stats = pk.dual_update_tiled_2d(
                    carry, state0.u, lam / rho, o.scales,
                    u_scale=jnp.float32(1), tile_rows=T)
                return carry + 1e-12 * alpha[0]
            return jax.lax.fori_loop(0, n, body, th)

        @partial(jax.jit, static_argnums=(2, 3))
        def run_rhs(o, th, n, T):
            def body(_, carry):
                return pk.rhs_tiled_2d(state0.alpha, state0.u, carry, rho,
                                       jnp.float32(1), o.scales,
                                       tile_rows=T)
            return jax.lax.fori_loop(0, n, body, th)

        @partial(jax.jit, static_argnums=(2, 3))
        def run_gram(o, th, n, T):
            def body(_, carry):
                return pk.gram_matvec_tiled_2d(carry, problem.counts, rho,
                                               o.scales, tile_rows=T)
            return jax.lax.fori_loop(0, n, body, th)

        try:
            r = slope(lambda st, n: run_dual(ops, st, n, T), theta0, 20, 220)
            print(f"T={T:4d} dual: {1e6/r:7.0f} us", flush=True)
        except Exception as e:
            print(f"T={T:4d} dual FAILED: {str(e)[:120]}", flush=True)
        try:
            r = slope(lambda st, n: run_rhs(ops, st, n, T),
                      problem.oty, 20, 220)
            print(f"T={T:4d} rhs:  {1e6/r:7.0f} us", flush=True)
        except Exception as e:
            print(f"T={T:4d} rhs FAILED: {str(e)[:120]}", flush=True)
        try:
            r = slope(lambda st, n: run_gram(ops, st, n, T), theta0, 20, 220)
            print(f"T={T:4d} gram: {1e6/r:7.0f} us", flush=True)
        except Exception as e:
            print(f"T={T:4d} gram FAILED: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
