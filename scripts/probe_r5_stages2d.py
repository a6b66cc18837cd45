"""r5 probe: per-stage dependency-chained slope timings at 4096^2 with the
CURRENT production path (tiled dual kernel with adjoint carries + fused
elementwise rhs).  Honest barrier = host materialization of an in-jit sum.

Run: python scripts/probe_r5_stages2d.py [m0 m1]
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from multivartv_tpu.config import SolverConfig
from multivartv_tpu.ops import diff as diff_ops
from multivartv_tpu.ops import pallas_kernels as pk
from multivartv_tpu.solver import xupdate as xup
from multivartv_tpu.solver.problem import build_operators

M = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (4096, 4096)
cfg = SolverConfig()
dt32 = jnp.float32


def slope(fn, args, lo, hi):
    float(fn(*args, lo))
    t_lo = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, lo))
        t_lo = min(t_lo, time.perf_counter() - t0)
    float(fn(*args, hi))
    t_hi = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, hi))
        t_hi = min(t_hi, time.perf_counter() - t0)
    return (t_hi - t_lo) / (hi - lo)


ops = jax.jit(lambda d: build_operators(M, d, cfg, dt32))(
    jnp.asarray([0.1, 0.1], dt32))


@jax.jit
def mkstate(seed):
    k = jax.random.split(jax.random.PRNGKey(seed), 8)
    theta = jax.random.normal(k[0], M, dt32)
    a = tuple(jax.random.normal(k[1 + i], M, dt32)
              * diff_ops.edge_mask(M, b, dt32)
              for i, b in enumerate(ops.binaries))
    u = tuple(jax.random.normal(k[4 + i], M, dt32)
              * diff_ops.edge_mask(M, b, dt32)
              for i, b in enumerate(ops.binaries))
    counts = jnp.ones(M, dt32)
    oty = jax.random.normal(k[7], M, dt32)
    return theta, a, u, counts, oty


theta, alpha, u, counts, oty = mkstate(0)
kappa = jnp.float32(0.01)
rho = jnp.float32(0.3)
usc = jnp.float32(1.0)
gb_dual = M[0] * M[1] * 4 * 12 / 1e9      # 4 in + 8 out (w/ adjoints)
gb_dual_noadj = M[0] * M[1] * 4 * 10 / 1e9


@partial(jax.jit, static_argnums=(3, 4))
def chain_dual(o, th, uu, k, adj):
    def body(i, carry):
        th_, w = carry
        if adj:
            a, un, st, dta, dtu = pk.dual_update_tiled_2d(
                th_, w, kappa, o.scales, want_adjoints=True)
            return th_ + 1e-12 * (a[0] + dta + dtu), un
        a, un, st = pk.dual_update_tiled_2d(th_, w, kappa, o.scales)
        return th_ + 1e-12 * a[0], un
    th_f, w_f = jax.lax.fori_loop(0, k, body, (th, uu))
    return jnp.sum(th_f) + sum(jnp.sum(x) for x in w_f)


for adj, gb in ((True, gb_dual), (False, gb_dual_noadj)):
    dt = slope(chain_dual, (ops, theta, u, ), 30, 230) if False else \
        slope(lambda o, th, uu, k: chain_dual(o, th, uu, k, adj),
              (ops, theta, u), 30, 230)
    print(f"dual_tiled2 adj={adj}: {dt*1e3:.3f} ms "
          f"-> {gb/dt:.0f} GB/s (of 660 practical)")
    sys.stdout.flush()


# fused elementwise rhs from the adjoint carries (4 reads + 1 write)
@partial(jax.jit, static_argnums=(4,))
def chain_rhs_carry(ot, dta, dtu, b0, k):
    def body(i, b):
        return ot + rho * (dta + usc * dtu) + 1e-12 * b
    return jnp.sum(jax.lax.fori_loop(0, k, body, b0))


dt = slope(chain_rhs_carry, (oty, alpha[0], u[0], theta), 50, 450)
print(f"rhs_carry_elementwise: {dt*1e3:.3f} ms "
      f"-> {M[0]*M[1]*4*4/1e9/dt:.0f} GB/s")
sys.stdout.flush()


# gram-residual tiled kernel (r0 = b - A v: 3 reads + 1 write)
@partial(jax.jit, static_argnums=(4,))
def chain_gres(o, ot, cc, v0, k):
    def body(i, v):
        return pk.gram_residual_tiled_2d(ot, v, cc, rho, o.scales)
    return jnp.sum(jax.lax.fori_loop(0, k, body, v0))


dt = slope(chain_gres, (ops, oty, counts, theta), 30, 230)
print(f"gram_res_tiled2: {dt*1e3:.3f} ms "
      f"-> {M[0]*M[1]*4*4/1e9/dt:.0f} GB/s")
sys.stdout.flush()


# x-update (spectral-correction CG, production config)
cbar = jnp.float32(1.0)


@partial(jax.jit, static_argnums=(4,))
def chain_x(o, cc, ot, x0, k):
    cb = xup.counts_to_layout(o, cc, cfg)
    def body(i, x):
        xn, _ = xup.solve_x(o, cc, cbar, ot + 1e-12 * x, rho, x, cfg,
                            counts_blocked=cb, tiled_ok=True)
        return xn
    return jnp.sum(jax.lax.fori_loop(0, k, body, x0))


dt = slope(chain_x, (ops, counts, oty, theta), 10, 110)
print(f"xupdate_spectral: {dt*1e3:.3f} ms")
