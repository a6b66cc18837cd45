import sys
sys.path.insert(0, "/root/repo")
import dataclasses
import unittest.mock as mock
import jax, jax.numpy as jnp, numpy as np
from multivartv_tpu.config import SolverConfig
from multivartv_tpu.solver import admm
from multivartv_tpu.solver.problem import Problem, build_operators
from multivartv_tpu.ops import pallas_kernels as pk

m = (1024, 1024)
cfg = SolverConfig(use_pallas=True, cg_fixed_iters=3, chunk_iters=1,
                   max_iters=50, tol=1e-12, adapt_rho=False)
deltas = jnp.asarray([2.0 / m[0], 2.0 / m[1]], jnp.float32)
rng = np.random.RandomState(5)
counts = jnp.asarray(rng.poisson(2, m).astype(np.float32))
oty = jnp.asarray(rng.randn(*m).astype(np.float32)) * counts
problem = Problem(counts=counts, oty=oty,
                  ybar=jnp.sum(oty) / jnp.sum(counts),
                  flat_idx=jnp.zeros((1,), jnp.int32),
                  y=jnp.zeros((1,), jnp.float32))
lam = jnp.asarray(0.05, jnp.float32)
ops = build_operators(m, deltas, cfg, jnp.float32)

def steps(c, n):
    @jax.jit
    def run():
        s0 = admm.initial_state(ops, problem, rho0=lam / 5.0)
        body = admm.make_admm_iteration(ops, problem, lam, c)
        return jax.lax.fori_loop(0, n, lambda _, s: body(s), s0)
    return jax.block_until_ready(run())

for n in (1, 2, 4, 8):
    with mock.patch.object(pk, "supported", lambda *a: False), \
         mock.patch.object(pk, "xupdate_supported", lambda *a: False):
        out = steps(cfg, n)
    ref = steps(dataclasses.replace(cfg, use_pallas=False), n)
    d = jnp.abs(out.theta - ref.theta)
    rowmax = jnp.max(d, axis=1)
    top_rows = np.argsort(np.asarray(rowmax))[-5:]
    print(f"n={n}: max={float(jnp.max(d)):.3e} "
          f"rows(top5)={top_rows.tolist()} "
          f"rowmax={np.asarray(rowmax)[top_rows]}", flush=True)
