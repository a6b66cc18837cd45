"""Blocked-path component timing at large lattices (round-3 follow-up to
profile_scale.py): isolates the blocked transforms, the spectral-CG
elementwise chain, the full x-update, and the dual stage so the next
bandwidth wall is named, not guessed."""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _make, _slope_time
from multivartv_tpu.config import SolverConfig
from multivartv_tpu.ops import dct as dct_ops
from multivartv_tpu.ops import diff as diff_ops
from multivartv_tpu.ops.prox import soft_threshold_blocks
from multivartv_tpu.solver.admm import admm_fixed_iterations, initial_state
from multivartv_tpu.solver import xupdate as xup

M = tuple(int(v) for v in sys.argv[1].split("x")) if len(sys.argv) > 1 \
    else (2048, 2048)
N = 1 << 22

cfg = SolverConfig()
ops, problem = _make(M, N, cfg)
lam = jnp.asarray(0.05, jnp.float32)
state0 = initial_state(ops, problem, rho0=lam / 5.0)
rho = jnp.asarray(0.01, jnp.float32)
cbar = jnp.sum(problem.counts) / ops.ntheta
p_dims = len(ops.m)
halves = ops.dct_halves_lp
counts = problem.counts
counts_b = jax.jit(lambda c: dct_ops.to_blocks(c, p_dims))(counts)
w_b = jax.jit(lambda e: tuple(cbar + rho * x for x in e))(
    ops.gram_eigs_blocked)


def timeit(name, step, x0, lo=20, hi=120):
    @partial(jax.jit, static_argnums=(1,))
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda _, v: step(v), x)
    per_s, dt, _ = _slope_time(run, x0, lo, hi, repeats=2)
    print(f"{name:>12}: {1e6/per_s:9.1f} us  ({per_s:.1f}/s)", flush=True)


v0 = state0.theta
b0 = jax.jit(lambda v: dct_ops.to_blocks(v, p_dims))(v0)

# One blocked fwd+inv round trip (the spectral CG pays 2 of these per step)
timeit("transformB", lambda v: dct_ops.idctn_blocked(
    dct_ops.dctn_blocked(v, halves), halves), b0)

# The CG elementwise chain per step (no transforms): ap-combine, dots,
# xh/rh/p updates on blocked f32 vectors
def cg_elem(v):
    ap = tuple(x * 1.0001 + w * y for x, w, y in zip(v, w_b, v))
    a = sum(jnp.sum(x * y) for x, y in zip(v, ap))
    xh = tuple(x + a * y for x, y in zip(v, ap))
    rh = tuple(x - a * y for x, y in zip(xh, ap))
    rz = sum(jnp.sum(x * x / w) for x, w in zip(rh, w_b))
    return tuple(x / w + rz * y for x, w, y in zip(rh, w_b, v))

timeit("cg_elem", cg_elem, b0)

# layout conversion pair
timeit("to/from", lambda v: dct_ops.to_blocks(
    dct_ops.from_blocks(v, p_dims) * 1.0000001, p_dims), b0)

# full x-update (solve_x through the production path)
def xstep(v):
    x, _ = xup.solve_x(ops, counts, cbar, v * 0.999 + problem.oty * 1e-3,
                       rho, v, cfg)
    return x

timeit("xupdate", xstep, v0)

# rhs + dual stage (stencil side)
def dualstage(v):
    d_theta = ops.apply_D(v)
    alpha = soft_threshold_blocks(d_theta, lam / rho)
    primal = tuple(a - dt for a, dt in zip(alpha, d_theta))
    dual = rho * ops.apply_Dt(primal)
    return v + 1e-12 * dual + 1e-12 * diff_ops.blocks_norm_sq(primal)

timeit("dualstage", dualstage, v0)


@partial(jax.jit, static_argnums=(2,))
def full(o, st, n):
    return admm_fixed_iterations(o, problem, lam, st, cfg, n).theta

per_s, dt, _ = _slope_time(lambda st, n: full(ops, st, n), state0, 20, 120,
                           repeats=2)
print(f"{'full':>12}: {1e6/per_s:9.1f} us  ({per_s:.1f}/s)", flush=True)

# --- round-3 additions: quartered transforms + r0 matvec -------------------
if ops.dct_quarters_lp is not None:
    b4 = jax.jit(lambda v: dct_ops.to_blocks4(v, p_dims))(v0)
    timeit("transformQ", lambda v: dct_ops.idctn_quartered(
        dct_ops.dctn_quartered(v, ops.dct_quarters_lp),
        ops.dct_quarters_lp), b4)
    # fwd only: spectral and M-layout blocks share shapes, so iterating
    # fwd on its own output is shape-valid (numerically meaningless, fine
    # for timing)
    timeit("fwdQ-only", lambda v: dct_ops.dctn_quartered(
        v, ops.dct_quarters_lp), b4)

timeit("matvec", lambda v: counts * v + rho * ops.apply_gram(v), v0)
