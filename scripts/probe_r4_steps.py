"""Round-4 probe: spectral-correction CG step count (3 vs 2) at scale.

Fewer fixed CG steps cut 2 MXU transforms + 1 elementwise block per ADMM
iteration, but a weaker x-update may raise the ADMM iteration count —
the product iters_to_converge / iters_per_s decides.

Usage: python scripts/probe_r4_steps.py
"""

import time
from functools import partial

import numpy as np

LAM = 0.05


def build(m, cfg):
    import jax.numpy as jnp
    from multivartv_tpu.solver.problem import build_operators
    from __graft_entry__ import _make_problem
    spec, problem = _make_problem(m, 1 << 22, jnp.float32, seed=117)
    ops = build_operators(m, spec.deltas, cfg, jnp.float32)
    return ops, problem


def conv(m, n_steps, bf16):
    import jax
    import jax.numpy as jnp
    from multivartv_tpu.config import SolverConfig
    from multivartv_tpu.solver.admm import (admm_solve, initial_state,
                                            objective)
    lam = jnp.asarray(LAM, jnp.float32)
    cfg = SolverConfig(cg_fixed_iters=n_steps, spectral_vec_bf16=bf16)
    ops, problem = build(m, cfg)

    @jax.jit
    def run(o, pr):
        st = initial_state(o, pr, rho0=lam / 5.0)
        st = admm_solve(o, pr, lam, st, cfg)
        fid, pen = objective(o, pr, st.theta)
        return fid + lam * pen, st.counter
    t0 = time.perf_counter()
    obj, it = run(ops, problem)
    jax.block_until_ready(obj)
    print(f"m={m} steps={n_steps} bf16={bf16}: obj={float(obj):.8g} "
          f"iters={int(it)} [{time.perf_counter()-t0:.0f}s]", flush=True)
    return float(obj), int(it)


def speed(m, n_steps, lo, hi):
    import jax
    import jax.numpy as jnp
    from multivartv_tpu.config import SolverConfig
    from multivartv_tpu.solver.admm import (admm_fixed_iterations,
                                            initial_state)
    lam = jnp.asarray(LAM, jnp.float32)
    cfg = SolverConfig(cg_fixed_iters=n_steps)
    ops, problem = build(m, cfg)
    state0 = initial_state(ops, problem, rho0=lam / 5.0)

    @partial(jax.jit, static_argnums=(3,))
    def run_args(o, pr, st, n):
        return admm_fixed_iterations(o, pr, lam, st, cfg, n).theta

    def timed(n):
        out = run_args(ops, problem, state0, n)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run_args(ops, problem, state0, n)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best
    r = (hi - lo) / (timed(hi) - timed(lo))
    print(f"m={m} steps={n_steps}: {r:.1f} iters/s ({1e6/r:.0f} us)",
          flush=True)
    return r


if __name__ == "__main__":
    speed((4096, 4096), 2, 5, 55)
    for st in (3, 2):
        conv((2048, 2048), st, None)
    conv((2048, 2048), 2, True)
