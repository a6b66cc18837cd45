"""Per-kernel slope-method timing of the 512^2 ADMM hot path on TPU.

Times each Pallas kernel in the per-iteration chain separately by running
N and 11N chained applications of the same jitted program and dividing the
wall-clock difference (cancels the fixed tunnel sync latency; see bench.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multivartv_tpu.config import SolverConfig
from multivartv_tpu.solver.problem import build_operators
from multivartv_tpu.ops import pallas_kernels as pk
from __graft_entry__ import _make_problem

M = (512, 512)
N_SAMPLES = 1 << 20
LO, HI = 200, 2200


def slope(fn, state0):
    """fn: (state) -> state, chained. Returns seconds per application."""

    def chain(n):
        def run(s):
            return jax.lax.fori_loop(0, n, lambda _, x: fn(x), s)
        return jax.jit(run)

    lo, hi = chain(LO), chain(HI)
    out = lo(state0)
    jax.block_until_ready(out)
    out = hi(state0)
    jax.block_until_ready(out)

    def best(f):
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(state0))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(hi) - best(lo)) / (HI - LO)


def main():
    dtype = jnp.float32
    cfg = SolverConfig()
    spec, problem = _make_problem(M, N_SAMPLES, dtype, seed=117)
    ops = build_operators(M, spec.deltas, cfg, dtype)
    lam = jnp.asarray(0.05, dtype)
    rho = lam / 5.0
    cbar = jnp.sum(problem.counts) / ops.ntheta
    theta0 = jnp.full(M, problem.ybar, dtype)
    u0 = tuple(jnp.zeros(M, dtype) for _ in range(3))
    a0 = ops.apply_D(theta0)

    # 1. rhs kernel: state = b-like array, feed it back as alpha[0]
    def rhs_fn(s):
        return pk.rhs_2d((s, a0[1], a0[2]), u0, problem.oty, rho,
                         jnp.ones((), dtype), ops.scales)
    t = slope(rhs_fn, a0[0])
    print(f"rhs_2d:            {t*1e6:8.2f} us")

    # 2. xupdate kernel (3 CG steps, as in the bench default)
    def xu_fn(s):
        x, _ = pk.xupdate_pcg_2d(problem.oty, s, problem.counts,
                                 ops.dct_mats, ops.gram_eigs, rho, cbar,
                                 ops.scales, 3)
        return x
    t = slope(xu_fn, theta0)
    print(f"xupdate_pcg_2d(3): {t*1e6:8.2f} us")

    # 2b. xupdate with 0 CG steps (isolates the init precond + matvec)
    def xu0_fn(s):
        x, _ = pk.xupdate_pcg_2d(problem.oty, s, problem.counts,
                                 ops.dct_mats, ops.gram_eigs, rho, cbar,
                                 ops.scales, 0)
        return x
    t = slope(xu0_fn, theta0)
    print(f"xupdate_pcg_2d(0): {t*1e6:8.2f} us")

    # 3. dual update kernel: feed theta back
    def du_fn(s):
        alpha, u, stats = pk.dual_update_2d(s, u0, lam / rho, ops.scales,
                                            u_scale=jnp.ones((), dtype))
        return alpha[0]
    t = slope(du_fn, theta0)
    print(f"dual_update_2d:    {t*1e6:8.2f} us")

    # 4. gram matvec kernel alone (the non-matmul inner op)
    def gm_fn(s):
        out, _ = pk.gram_matvec_2d(s, problem.counts, rho, ops.scales)
        return out
    t = slope(gm_fn, theta0)
    print(f"gram_matvec_2d:    {t*1e6:8.2f} us")


if __name__ == "__main__":
    main()
