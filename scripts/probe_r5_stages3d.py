"""r5 probe: per-stage dependency-chained slope timings at 256^3 (host-sum barrier).
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r5_stages3d.py"""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from multivartv_tpu.config import SolverConfig
from multivartv_tpu.ops import pallas_kernels as pk
from multivartv_tpu.ops import diff as diff_ops
from multivartv_tpu.solver import xupdate as xup
from multivartv_tpu.solver.problem import build_operators

M = (256, 256, 256)
cfg = SolverConfig()
dt32 = jnp.float32

def slope(fn, args, lo, hi):
    # honest barrier: fn returns a SCALAR (in-jit sum); float() forces.
    float(fn(*args, lo))
    best_lo = min((lambda: (lambda t0: (float(fn(*args, lo)), time.perf_counter()-t0))(time.perf_counter()))()[1] for _ in range(3))
    float(fn(*args, hi))
    best_hi = min((lambda: (lambda t0: (float(fn(*args, hi)), time.perf_counter()-t0))(time.perf_counter()))()[1] for _ in range(3))
    return (best_hi - best_lo)/(hi-lo)

ops = jax.jit(lambda d: build_operators(M, d, cfg, dt32))(jnp.asarray([0.1,0.1,0.1], dt32))

@jax.jit
def mkstate(seed):
    k = jax.random.split(jax.random.PRNGKey(seed), 16)
    theta = jax.random.normal(k[0], M, dt32)
    a = tuple(jax.random.normal(k[1+i], M, dt32) * diff_ops.edge_mask(M, b, dt32)
              for i, b in enumerate(ops.binaries))
    u = tuple(jax.random.normal(k[8+i], M, dt32) * diff_ops.edge_mask(M, b, dt32)
              for i, b in enumerate(ops.binaries))
    counts = jnp.ones(M, dt32)
    oty = jax.random.normal(k[15], M, dt32)
    return theta, a, u, counts, oty

theta, alpha, u, counts, oty = mkstate(0)
kappa = jnp.float32(0.01)
rho = jnp.float32(0.3)
usc = jnp.float32(1.0)

@partial(jax.jit, static_argnums=(3,))
def chain_dual(o, th, uu, k):
    def body(i, carry):
        th_, w = carry
        a, un, st = pk.dual_update_tiled_3d(th_, w, kappa, o.scales)
        return th_ + 1e-12*a[0], un
    th_f, w_f = jax.lax.fori_loop(0, k, body, (th, uu))
    return jnp.sum(th_f) + sum(jnp.sum(x) for x in w_f)
print("dual_tiled3 ms:", slope(chain_dual, (ops, theta, u), 30, 230)*1e3); sys.stdout.flush()

@partial(jax.jit, static_argnums=(4,))
def chain_rhs_jnp(o, ot, uu, b0, k):
    def body(i, b):
        au = tuple(a + 1e-12*b for a in uu)
        return ot + rho * o.apply_Dt(au)
    return jnp.sum(jax.lax.fori_loop(0, k, body, b0))
print("rhs_jnp ms:", slope(chain_rhs_jnp, (ops, oty, u, theta), 30, 230)*1e3); sys.stdout.flush()

@partial(jax.jit, static_argnums=(5,))
def chain_rhs_k(o, a, uu, ot, b0, k):
    def body(i, b):
        a2 = tuple(x + 1e-12*b for x in a)
        return pk.rhs_tiled_3d(a2, uu, ot, rho, usc, o.scales)
    return jnp.sum(jax.lax.fori_loop(0, k, body, b0))
print("rhs_tiled3 ms:", slope(chain_rhs_k, (ops, alpha, u, oty, theta), 30, 230)*1e3); sys.stdout.flush()

@partial(jax.jit, static_argnums=(4,))
def chain_gres(o, ot, cc, v0, k):
    def body(i, v):
        return pk.gram_residual_tiled_3d(ot, v, cc, rho, o.scales)
    return jnp.sum(jax.lax.fori_loop(0, k, body, v0))
print("gram_res_tiled3 ms:", slope(chain_gres, (ops, oty, counts, theta), 30, 230)*1e3); sys.stdout.flush()

cbar = jnp.float32(1.0)
@partial(jax.jit, static_argnums=(4,))
def chain_x(o, cc, ot, x0, k):
    cb = xup.counts_to_layout(o, cc, cfg)
    def body(i, x):
        xn, _ = xup.solve_x(o, cc, cbar, ot, rho, x, cfg,
                            counts_blocked=cb, tiled3_ok=True)
        return xn
    return jnp.sum(jax.lax.fori_loop(0, k, body, x0))
print("xupdate_spectral ms:", slope(chain_x, (ops, counts, oty, theta), 30, 230)*1e3)
