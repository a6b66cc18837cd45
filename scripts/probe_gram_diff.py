import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from multivartv_tpu.config import SolverConfig
from multivartv_tpu.solver import admm
from multivartv_tpu.solver.problem import Problem, build_operators
from multivartv_tpu.ops import pallas_kernels as pk
from multivartv_tpu.ops import diff as diff_ops

m = (1024, 1024)
cfg = SolverConfig(use_pallas=False, cg_fixed_iters=3, chunk_iters=1,
                   max_iters=1, tol=1e-12, adapt_rho=False)
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

@jax.jit
def probe():
    s0 = admm.initial_state(ops, problem, rho0=lam / 5.0)
    body = admm.make_admm_iteration(ops, problem, lam, cfg)
    s1 = body(s0)
    v = s1.theta
    g_t = pk.gram_matvec_tiled_2d(v, counts, s1.rho, ops.scales)
    g_j = counts * v + s1.rho * diff_ops.apply_gram(v, ops.binaries,
                                                    ops.scales)
    d = jnp.abs(g_t - g_j)
    rowmax = jnp.max(d, axis=1)
    colmax = jnp.max(d, axis=0)
    return (jnp.max(d), jnp.argmax(rowmax), jnp.argmax(colmax),
            jnp.max(jnp.abs(v)), rowmax)

mx, r, c, vmax, rowmax = jax.block_until_ready(probe())
print(f"gram diff max={float(mx):.3e} at row {int(r)} col {int(c)} "
      f"(|v|max={float(vmax):.3f})")
rm = np.asarray(rowmax)
big = np.where(rm > float(mx) * 0.1)[0]
print("rows with big diffs:", big[:30].tolist())
