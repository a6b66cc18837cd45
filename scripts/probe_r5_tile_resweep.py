"""r5 probe: re-sweep dual-kernel panel heights now that want_alpha=False
freed 3 (2-D) / 7 (3-D) double-buffered output panels of VMEM — the r4
sweep that rejected larger panels predates the elision.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r5_tile_resweep.py
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from multivartv_tpu.config import SolverConfig
from multivartv_tpu.ops import diff as diff_ops
from multivartv_tpu.ops import pallas_kernels as pk
from multivartv_tpu.solver.problem import build_operators


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


cfg = SolverConfig()
dt32 = jnp.float32

# ---- 2-D at 4096^2 ----
M = (4096, 4096)
ops = jax.jit(lambda d: build_operators(M, d, cfg, dt32))(
    jnp.asarray([0.1, 0.1], dt32))


@jax.jit
def mkstate(seed):
    k = jax.random.split(jax.random.PRNGKey(seed), 8)
    theta = jax.random.normal(k[0], M, dt32)
    u = tuple(jax.random.normal(k[4 + i], M, dt32)
              * diff_ops.edge_mask(M, b, dt32)
              for i, b in enumerate(ops.binaries))
    return theta, u


theta, u = mkstate(0)
kappa = jnp.float32(0.01)


@partial(jax.jit, static_argnums=(3, 4))
def chain_dual(o, th, uu, k, T):
    def body(i, carry):
        th_, w = carry
        a, un, st, dta, dtu = pk.dual_update_tiled_2d(
            th_, w, kappa, o.scales, want_adjoints=True, want_alpha=False,
            tile_rows=T)
        return th_ + 1e-12 * (dta + dtu), un
    th_f, w_f = jax.lax.fori_loop(0, k, body, (th, uu))
    return jnp.sum(th_f) + sum(jnp.sum(x) for x in w_f)


for T in (128, 256, 512):
    try:
        dt = slope(lambda o, th, uu, k: chain_dual(o, th, uu, k, T),
                   (ops, theta, u), 30, 230)
        print(f"2d dual T={T}: {dt*1e3:.3f} ms")
    except Exception as e:
        print(f"2d dual T={T}: FAILED {type(e).__name__}: {str(e)[:120]}")
    sys.stdout.flush()

# ---- 3-D at 256^3 ----
M3 = (256, 256, 256)
ops3 = jax.jit(lambda d: build_operators(M3, d, cfg, dt32))(
    jnp.asarray([0.1, 0.1, 0.1], dt32))


@jax.jit
def mkstate3(seed):
    k = jax.random.split(jax.random.PRNGKey(seed), 16)
    theta = jax.random.normal(k[0], M3, dt32)
    u = tuple(jax.random.normal(k[8 + i], M3, dt32)
              * diff_ops.edge_mask(M3, b, dt32)
              for i, b in enumerate(ops3.binaries))
    return theta, u


theta3, u3 = mkstate3(0)


@partial(jax.jit, static_argnums=(3, 4))
def chain_dual3(o, th, uu, k, T):
    def body(i, carry):
        th_, w = carry
        a, un, st, dta, dtu = pk.dual_update_tiled_3d(
            th_, w, kappa, o.scales, want_adjoints=True, want_alpha=False,
            tile_rows=T)
        return th_ + 1e-12 * (dta + dtu), un
    th_f, w_f = jax.lax.fori_loop(0, k, body, (th, uu))
    return jnp.sum(th_f) + sum(jnp.sum(x) for x in w_f)


# default T for dual at 256^3: _tile_rows_3d -> 1MB target
print("3d default T:", pk._tile_rows_3d(M3))
for T in (pk._tile_rows_3d(M3), 1024, 2048):
    try:
        dt = slope(lambda o, th, uu, k: chain_dual3(o, th, uu, k, T),
                   (ops3, theta3, u3), 30, 230)
        print(f"3d dual T={T}: {dt*1e3:.3f} ms")
    except Exception as e:
        print(f"3d dual T={T}: FAILED {type(e).__name__}: {str(e)[:120]}")
    sys.stdout.flush()
