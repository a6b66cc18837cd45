import sys
sys.path.insert(0, "/root/repo")
import dataclasses
import jax, jax.numpy as jnp, numpy as np
from multivartv_tpu.config import SolverConfig
from multivartv_tpu.solver import admm, xupdate
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
cbar = jnp.sum(counts) / ops.ntheta

@jax.jit
def stage_diffs():
    s0 = admm.initial_state(ops, problem, rho0=lam / 5.0)
    body = admm.make_admm_iteration(ops, problem, lam, cfg)  # jnp arm
    s1 = body(s0)
    # --- rhs stage ---
    b_t = pk.rhs_tiled_2d(s1.alpha, s1.u, oty, s1.rho, s1.u_scale,
                          ops.scales)
    au = tuple(a + s1.u_scale * w for a, w in zip(s1.alpha, s1.u))
    b_j = oty + s1.rho * diff_ops.apply_Dt(au, ops.binaries, ops.scales)
    # --- x-update from the SAME b ---
    th_t, _ = xupdate.solve_x(ops, counts, cbar, b_j, s1.rho, s1.theta,
                              cfg, tiled_ok=True)
    th_j, _ = xupdate.solve_x(ops, counts, cbar, b_j, s1.rho, s1.theta,
                              cfg, tiled_ok=False)
    # --- dual stage from the SAME theta ---
    a_t, un_t, st_t = pk.dual_update_tiled_2d(th_j, s1.u, lam / s1.rho,
                                              ops.scales,
                                              u_scale=s1.u_scale)
    from multivartv_tpu.ops.prox import soft_threshold_blocks
    d_theta = diff_ops.apply_D(th_j, ops.binaries, ops.scales)
    u_eff = tuple(s1.u_scale * w for w in s1.u)
    a_j = soft_threshold_blocks(
        tuple(dt - w for dt, w in zip(d_theta, u_eff)), lam / s1.rho)
    return (jnp.max(jnp.abs(b_t - b_j)),
            jnp.max(jnp.abs(th_t - th_j)),
            jnp.max(jnp.stack([jnp.max(jnp.abs(x - y))
                               for x, y in zip(a_t, a_j)])))

db, dth, da = jax.block_until_ready(stage_diffs())
print(f"rhs diff={float(db):.3e}  xupdate diff={float(dth):.3e}  "
      f"dual diff={float(da):.3e}")
