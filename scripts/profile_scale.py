"""Component timing at large lattices: where does the ADMM iteration go?

Times (slope method, chained in one jitted fori_loop) at a given m:
  transform   one packed dct+idct round trip (bf16)
  gram        one stencil Gram matvec counts*v + rho*D'D v
  precond     one packed preconditioner application (dct, scale, idct)
  dualstage   apply_D + soft-threshold + dual update + norms
  full        one production ADMM iteration (admm_fixed_iterations)
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import _make, _slope_time
from multivartv_tpu.config import SolverConfig
from multivartv_tpu.ops import dct as dct_ops
from multivartv_tpu.ops import diff as diff_ops
from multivartv_tpu.ops.prox import soft_threshold_blocks
from multivartv_tpu.solver.admm import admm_fixed_iterations, initial_state

M = tuple(int(v) for v in sys.argv[1].split("x")) if len(sys.argv) > 1 \
    else (2048, 2048)
N = 1 << 22

cfg = SolverConfig()
ops, problem = _make(M, N, cfg)
lam = jnp.asarray(0.05, jnp.float32)
state0 = initial_state(ops, problem, rho0=lam / 5.0)
rho = jnp.asarray(0.01, jnp.float32)
cbar = jnp.sum(problem.counts) / ops.ntheta
w = cbar + rho * ops.gram_eigs_packed
halves = ops.dct_halves
counts = problem.counts


def timeit(name, step, x0, lo=20, hi=120):
    @partial(jax.jit, static_argnums=(1,))
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda _, v: step(v), x)
    per_s, dt, _ = _slope_time(run, x0, lo, hi, repeats=2)
    print(f"{name:>10}: {1e6/per_s:9.1f} us  ({per_s:.1f}/s)", flush=True)


v0 = state0.theta

timeit("transform", lambda v: dct_ops.idctn_packed(
    dct_ops.dctn_packed(v, halves, mat_dtype=jnp.bfloat16),
    halves, mat_dtype=jnp.bfloat16), v0)

timeit("gram", lambda v: counts * v + rho * ops.apply_gram(v), v0)


def rhsstage(v):
    au = tuple(a + 1e-9 * w_ for a, w_ in zip(ops.apply_D(v), ops.apply_D(v)))
    return problem.oty + rho * ops.apply_Dt(au) + 1e-12 * v

timeit("rhsstage", rhsstage, v0)


def dualstage(v):
    d_theta = ops.apply_D(v)
    alpha = soft_threshold_blocks(d_theta, lam / rho)
    primal = tuple(a - dt for a, dt in zip(alpha, d_theta))
    dual = rho * ops.apply_Dt(primal)
    return v + 1e-12 * dual + 1e-12 * diff_ops.blocks_norm_sq(primal)

timeit("dualstage", dualstage, v0)


@partial(jax.jit, static_argnums=(1,))
def full(st, n):
    return admm_fixed_iterations(ops, problem, lam, st, cfg, n).theta

t0 = time.perf_counter()
per_s, dt, _ = _slope_time(full, state0, 20, 120, repeats=2)
print(f"{'full':>10}: {1e6/per_s:9.1f} us  ({per_s:.1f}/s)", flush=True)
