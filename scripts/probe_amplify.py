import sys
sys.path.insert(0, "/root/repo")
import dataclasses
import unittest.mock as mock
import jax, jax.numpy as jnp, numpy as np
from multivartv_tpu.config import SolverConfig
from multivartv_tpu.solver import admm, xupdate
from multivartv_tpu.solver.problem import Problem, build_operators
from multivartv_tpu.ops import pallas_kernels as pk

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
cbar = jnp.sum(counts) / ops.ntheta

@jax.jit
def amp():
    s0 = admm.initial_state(ops, problem, rho0=lam / 5.0)
    body = admm.make_admm_iteration(ops, problem, lam, cfg)
    s1 = body(s0)
    au = tuple(a + s1.u_scale * w for a, w in zip(s1.alpha, s1.u))
    from multivartv_tpu.ops import diff as diff_ops
    b = oty + s1.rho * diff_ops.apply_Dt(au, ops.binaries, ops.scales)
    th, _ = xupdate.solve_x(ops, counts, cbar, b, s1.rho, s1.theta, cfg)
    # perturb b by white noise of the gram-diff magnitude (1e-6)
    key = jax.random.PRNGKey(0)
    db = 1e-6 * jax.random.normal(key, b.shape, b.dtype)
    th2, _ = xupdate.solve_x(ops, counts, cbar, b + db, s1.rho, s1.theta,
                             cfg)
    return jnp.max(jnp.abs(th2 - th))

print(f"amplification of 1e-6 b-perturbation: {float(amp()):.3e}",
      flush=True)

# objective parity of the full 8-iteration tiled vs jnp solves
cfg8 = dataclasses.replace(cfg, max_iters=8, use_pallas=True)
def solve(c):
    @jax.jit
    def run():
        s0 = admm.initial_state(ops, problem, rho0=lam / 5.0)
        st = admm.admm_solve(ops, problem, lam, st0 := s0, c)
        fid, pen = admm.objective(ops, problem, st.theta)
        return fid + lam * pen, st.counter
    o, c_ = run()
    return float(o), int(c_)

with mock.patch.object(pk, "supported", lambda *a: False), \
     mock.patch.object(pk, "xupdate_supported", lambda *a: False):
    obj_t, it_t = solve(cfg8)
obj_j, it_j = solve(dataclasses.replace(cfg8, use_pallas=False))
print(f"objective tiled={obj_t:.8g} ({it_t} it)  jnp={obj_j:.8g} ({it_j} it)"
      f"  rel gap={abs(obj_t-obj_j)/abs(obj_j):.2e}", flush=True)
