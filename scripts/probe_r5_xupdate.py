"""r5 probe: decompose the 4096^2 spectral-CG x-update (6.3 ms measured)
into transform and elementwise costs.  Honest barrier, opaque-feedback
chains where possible, traced-scalar multiplier where not.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r5_xupdate.py
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from multivartv_tpu.config import SolverConfig
from multivartv_tpu.ops import dct as dct_ops
from multivartv_tpu.solver import xupdate as xup
from multivartv_tpu.solver.problem import build_operators

M = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (4096, 4096)
cfg = SolverConfig()
dt32 = jnp.float32
p_dims = 2


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
lay = xup.spectral_layout(ops)
vd = xup.spectral_vec_dtype(ops, cfg) or dt32
print(f"m={M} layout={lay} vec_dtype={vd.__name__}")

x = jax.device_put(jax.random.normal(jax.random.PRNGKey(0), M, dt32))
quarters = ops.dct_quarters_lp
to_b = lambda v: dct_ops.to_blocks4(v, p_dims)
from_b = lambda v: dct_ops.from_blocks4(v, p_dims)
fwd = lambda v: dct_ops.dctn_quartered(v, quarters)
inv = lambda v: dct_ops.idctn_quartered(v, quarters)

xb = jax.jit(lambda v: tuple(b.astype(vd) for b in to_b(v)))(x)
nblk = len(xb)
print(f"nblk={nblk} block_shape={xb[0].shape}")

# --- single transform (fwd) chained: fwd is matmul-based, feed output back
@partial(jax.jit, static_argnums=(0,))
def chain_fwd(k, *bs):
    def body(i, t):
        o = fwd(t)
        return tuple(v.astype(vd) for v in o)
    out = jax.lax.fori_loop(0, k, body, tuple(bs))
    return sum(jnp.sum(v.astype(jnp.float32)) for v in out)

dt = slope(lambda k: chain_fwd(k, *xb), (), 20, 120)
print(f"fwd quartered transform: {dt*1e3:.3f} ms")
sys.stdout.flush()

# --- round trip inv->fwd (the per-CG-step transform pair)
@partial(jax.jit, static_argnums=(0,))
def chain_pair(k, *bs):
    def body(i, t):
        nat = inv(t)
        o = fwd(tuple(v.astype(vd) for v in nat))
        return tuple(v.astype(vd) for v in o)
    out = jax.lax.fori_loop(0, k, body, tuple(bs))
    return sum(jnp.sum(v.astype(jnp.float32)) for v in out)

dt = slope(lambda k: chain_pair(k, *xb), (), 20, 120)
print(f"inv+fwd pair: {dt*1e3:.3f} ms")
sys.stdout.flush()

# --- per-step matvec incl. counts multiply: fwd(counts * inv(p))
counts_b = jax.jit(
    lambda c: xup.counts_to_layout(ops, c, cfg))(jnp.ones(M, dt32))
@partial(jax.jit, static_argnums=(0,))
def chain_mv(k, *bs):
    def body(i, t):
        nat = inv(t)
        o = fwd(tuple((c * v.astype(c.dtype)).astype(vd)
                      for c, v in zip(counts_b, nat)))
        return tuple(v.astype(vd) for v in o)
    out = jax.lax.fori_loop(0, k, body, tuple(bs))
    return sum(jnp.sum(v.astype(jnp.float32)) for v in out)

dt = slope(lambda k: chain_mv(k, *xb), (), 20, 120)
print(f"inv+counts*+fwd (CG-step matvec): {dt*1e3:.3f} ms")
sys.stdout.flush()

# --- full x-update (production), for reference
oty = jax.device_put(jax.random.normal(jax.random.PRNGKey(1), M, dt32))
counts = jnp.ones(M, dt32)
rho = jnp.float32(0.3)
cbar = jnp.float32(1.0)

cb_pre = jax.jit(lambda c: xup.counts_to_layout(ops, c, cfg))(counts)


@partial(jax.jit, static_argnums=(2,))
def chain_x(ot, x0, k):
    cb = cb_pre
    def body(i, xx):
        xn, _ = xup.solve_x(ops, counts, cbar, ot + 1e-12 * xx, rho, xx,
                            cfg, counts_blocked=cb, tiled_ok=True)
        return xn
    return jnp.sum(jax.lax.fori_loop(0, k, body, x0))

dt = slope(chain_x, (oty, x), 10, 110)
print(f"full xupdate: {dt*1e3:.3f} ms")
sys.stdout.flush()

# --- elementwise-only CG skeleton (no transforms, no counts matvec):
# per step: ap = f + rho*E*p (f stands in as a given block), pap, xh, rh,
# rz, p-update — isolates the elementwise+reduction cost of 3 steps.
E = jax.jit(lambda es: tuple(e.astype(jnp.float32) for e in es))(
    ops.gram_eigs_quartered)

@partial(jax.jit, static_argnums=(0,))
def chain_elem(k, *bs):
    f32 = jnp.float32
    eps = jnp.asarray(1e-30, f32)

    def body(i, carry):
        rh, p, xh = carry
        rz = sum(jnp.sum(jnp.square(r.astype(f32)) / (cbar + rho * e))
                 for r, e in zip(rh, E))
        for step in range(3):
            ap = tuple((pp.astype(f32) * (1.0 + rho * e)).astype(vd)
                       for pp, e in zip(p, E))
            pap = sum(jnp.sum(pp.astype(f32) * a.astype(f32))
                      for pp, a in zip(p, ap))
            alpha_cg = rz / jnp.maximum(pap, eps)
            xh = tuple((x_.astype(f32) + alpha_cg * pp.astype(f32)).astype(vd)
                       for x_, pp in zip(xh, p))
            rh = tuple((r.astype(f32) - alpha_cg * a.astype(f32)).astype(vd)
                       for r, a in zip(rh, ap))
            rz_new = sum(jnp.sum(jnp.square(r.astype(f32))
                                 / (cbar + rho * e))
                         for r, e in zip(rh, E))
            if step < 2:
                beta = rz_new / jnp.maximum(rz, eps)
                p = tuple((r.astype(f32) / (cbar + rho * e)
                           + beta * pp.astype(f32)).astype(vd)
                          for r, e, pp in zip(rh, E, p))
            rz = rz_new
        return rh, p, xh

    rh, p, xh = jax.lax.fori_loop(
        0, k, body, (tuple(bs), tuple(bs), tuple(bs)))
    return (sum(jnp.sum(v.astype(jnp.float32)) for v in rh)
            + sum(jnp.sum(v.astype(jnp.float32)) for v in xh))

dt = slope(lambda k: chain_elem(k, *xb), (), 10, 110)
print(f"elementwise 3-step CG skeleton (no transforms): {dt*1e3:.3f} ms")
