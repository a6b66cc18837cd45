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
                   max_iters=2, tol=1e-12)
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

def one_step(c):
    @jax.jit
    def run():
        s0 = admm.initial_state(ops, problem, rho0=lam / 5.0)
        body = admm.make_admm_iteration(ops, problem, lam, c)
        return body(s0)
    return jax.block_until_ready(run())

with mock.patch.object(pk, "supported", lambda *a: False), \
     mock.patch.object(pk, "xupdate_supported", lambda *a: False):
    out = one_step(cfg)
ref = one_step(dataclasses.replace(cfg, use_pallas=False))

for f in ("theta", "primal_norm", "dual_norm", "eps_primal", "eps_dual", "rho"):
    a, b = getattr(out, f), getattr(ref, f)
    na = int(jnp.sum(~jnp.isfinite(a))); nb = int(jnp.sum(~jnp.isfinite(b)))
    if a.ndim:
        d = float(jnp.max(jnp.abs(a - b)))
        print(f"{f}: nan(tiled)={na} nan(jnp)={nb} maxdiff={d:.3e}", flush=True)
    else:
        print(f"{f}: tiled={float(a):.6g} jnp={float(b):.6g} nan={na},{nb}", flush=True)
for i, (a, b) in enumerate(zip(out.alpha, ref.alpha)):
    print(f"alpha[{i}]: nan={int(jnp.sum(~jnp.isfinite(a)))} maxdiff={float(jnp.max(jnp.abs(a-b))):.3e}", flush=True)
for i, (a, b) in enumerate(zip(out.u, ref.u)):
    print(f"u[{i}]: nan={int(jnp.sum(~jnp.isfinite(a)))} maxdiff={float(jnp.max(jnp.abs(a-b))):.3e}", flush=True)
