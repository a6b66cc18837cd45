"""Fused Pallas TPU kernels for the 2-D ADMM hot path.

The XLA path materializes each stencil/elementwise/reduction step through
HBM; these kernels keep the 512^2-class lattice resident in VMEM and fuse:

  gram_matvec_2d:   A v = counts * v + rho * D'D v  (+ the CG dot <v, Av>)
                    — the inner operator of every PCG step.
  dual_update_2d:   the entire ADMM z/dual stage: D theta, the
                    soft-threshold prox, the primal residual, the dual
                    ascent, plus ALL five scalar reductions the Boyd
                    stopping/adaptive-rho logic needs (||r||^2, ||D theta||^2,
                    ||alpha||^2, ||D'r||^2, ||D'u||^2) in one pass.

Padded-block convention (see ops/diff.py): every block is lattice-shaped
with zeroed trailing edges; forward diffs are circular shifts + masks,
adjoints are plain circular shifts (exact given edge zeros).

Kernels assume p == 2 and whole-lattice blocks in VMEM (fine through
1024x1024 f32); callers fall back to the jnp path otherwise.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Mosaic's default scoped-VMEM limit is 16 MB, but a v5e core physically
# has far more (measured: a 28 MB-resident kernel compiles and runs with a
# raised limit; the 1024^2 full-ADMM kernel's scoped demand is 120.7 MB).
# The limit is derived from the detected device generation so a
# smaller-VMEM part is never asked for more than it has — small lattices
# still compile there under the conservative limit, and the large-lattice
# gates (xupdate_supported) are sized against the v5e-class budget.
_VMEM_BY_KIND = (
    ("v5 lite", 110), ("v5e", 110), ("v5p", 110), ("v6", 110), ("v4", 110),
)
_DEFAULT_VMEM_MB = 96


def _vmem_limit_bytes() -> int:
    # Deliberately uncached (the lookup is trivial): caching on first call
    # froze the wrong limit for the whole process when a gate predicate
    # ran before platform selection (ADVICE r3), silently moving the
    # one-kernel gate between 512^2 and 1024^2.
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    mb = next((v for k, v in _VMEM_BY_KIND if k in kind), _DEFAULT_VMEM_MB)
    return mb * 1024 * 1024


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit_bytes())


def _shift_down(x, axis):
    # out[i] = x[i+1] (circular): pltpu.roll requires non-negative shifts,
    # so a -1 roll is expressed as size-1.
    return pltpu.roll(x, x.shape[axis] - 1, axis)


def _shift_up(x, axis):
    # out[i] = x[i-1] (circular)
    return pltpu.roll(x, 1, axis)


def _masks(shape, dtype):
    m0, m1 = shape
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    mask0 = (row < m0 - 1).astype(dtype)
    mask1 = (col < m1 - 1).astype(dtype)
    return mask0, mask1


def _wmasks2(shape, true_m, dtype):
    """Per-block TRUE-problem row masks for the exact padded-solve route
    (ops/diff.py::true_region_mask, solver/pad.py): (w_mix, w_ax1, w_ax0)
    in fd_binaries(2) order, or None when true_m is None (aligned lattice
    — the penalty covers every non-edge row already).  Soft-thresholding
    with threshold kappa * w keeps the penalty off rows that read pad
    knots while the x-update keeps the full uniform (exactly
    DCT-diagonalized) D."""
    if true_m is None:
        return None
    t0, t1 = int(true_m[0]), int(true_m[1])
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    rA = (row < t0 - 1).astype(dtype)   # differenced along axis 0
    rB = (row < t0).astype(dtype)
    cA = (col < t1 - 1).astype(dtype)   # differenced along axis 1
    cB = (col < t1).astype(dtype)
    return (rA * cA, rB * cA, rA * cB)


def _fwd0(v, mask0):
    return (_shift_down(v, 0) - v) * mask0


def _fwd1(v, mask1):
    return (_shift_down(v, 1) - v) * mask1


def _adj0(w):
    return _shift_up(w, 0) - w


def _adj1(w):
    return _shift_up(w, 1) - w


# ---------------------------------------------------------------------------
# Kernel 1: fused Gram matvec (+ <v, Av> partial for CG)
# ---------------------------------------------------------------------------

def _gram_matvec_kernel(v_ref, counts_ref, scal_ref, out_ref, dot_ref):
    """scal_ref (SMEM, (4,)): [rho, s_mix^2, s_ax1^2, s_ax0^2] where the
    scale order follows fd_binaries(2) = ((1,1), (0,1), (1,0))."""
    v = v_ref[:]
    dtype = v.dtype
    mask0, mask1 = _masks(v.shape, dtype)
    rho = scal_ref[0]
    s_mix = scal_ref[1]
    s_ax1 = scal_ref[2]
    s_ax0 = scal_ref[3]
    d1 = _fwd1(v, mask1)                      # diff along axis 1
    d0 = _fwd0(v, mask0)                      # diff along axis 0
    dm = _fwd1(d0, mask1)                     # mixed partial
    acc = s_ax1 * _adj1(d1) + s_ax0 * _adj0(d0) + s_mix * _adj0(_adj1(dm))
    out = counts_ref[:] * v + rho * acc
    out_ref[:] = out
    dot_ref[0] = jnp.sum(v * out)


def gram_matvec_2d(v: jax.Array, counts: jax.Array, rho: jax.Array,
                   scales: Tuple[jax.Array, ...],
                   interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """(counts + rho D'D) v and <v, Av>, fused.  `scales` in
    fd_binaries(2) order: (s_mixed, s_axis1diff, s_axis0diff)."""
    dtype = v.dtype
    scal = jnp.stack([
        jnp.asarray(rho, dtype),
        jnp.asarray(rho, dtype) * scales[0] * scales[0],
        jnp.asarray(rho, dtype) * scales[1] * scales[1],
        jnp.asarray(rho, dtype) * scales[2] * scales[2],
    ])
    # Fold rho into the block scales; rho slot then just 0-passthrough:
    # out = counts*v + sum_b (rho s_b^2) adj(fwd(v)) — set rho slot to 1.
    scal = scal.at[0].set(1.0)

    out, dot = pl.pallas_call(
        _gram_matvec_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(v.shape, dtype),
            jax.ShapeDtypeStruct((1,), dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
        compiler_params=_params(),
    )(v, counts, scal)
    return out, dot[0]


# ---------------------------------------------------------------------------
# Kernel 2: fused dual update + all stopping-rule reductions
# ---------------------------------------------------------------------------

def _dual_update_kernel(true_m, theta_ref, u0_ref, u1_ref, u2_ref, scal_ref,
                        a0_ref, a1_ref, a2_ref,
                        un0_ref, un1_ref, un2_ref,
                        stats_ref):
    """scal_ref (SMEM, (5,)): [kappa, s_mix, s_ax1, s_ax0, u_scale].
    stats_ref (SMEM, (5,)): [||r||^2, ||Dtheta||^2, ||alpha||^2,
                             ||D'r||^2, ||D'u||^2].

    u_scale folds the adaptive-rho dual rescaling (reference adapt_step,
    solvers.cpp:88-92) into the load: the effective dual is u_scale * u_ref,
    so the rescale never costs an HBM pass of its own.

    true_m: TRUE lattice dims for the exact padded-solve route (None =
    aligned): the prox threshold and the ||Dtheta||/||alpha|| reductions
    are masked to the true problem's rows (see _wmasks2)."""
    theta = theta_ref[:]
    dtype = theta.dtype
    mask0, mask1 = _masks(theta.shape, dtype)
    wm = _wmasks2(theta.shape, true_m, dtype)
    kappa = scal_ref[0]
    s_mix = scal_ref[1]
    s_ax1 = scal_ref[2]
    s_ax0 = scal_ref[3]
    uscale = scal_ref[4]

    d0 = _fwd0(theta, mask0)
    dt_mix = s_mix * _fwd1(d0, mask1)      # block (1,1)
    dt_ax1 = s_ax1 * _fwd1(theta, mask1)   # block (0,1)
    dt_ax0 = s_ax0 * d0                    # block (1,0)

    def soft(z, k):
        return jnp.sign(z) * jnp.maximum(jnp.abs(z) - k, 0.0)

    k0, k1, k2 = ((kappa, kappa, kappa) if wm is None
                  else (kappa * wm[0], kappa * wm[1], kappa * wm[2]))
    u0 = uscale * u0_ref[:]
    u1 = uscale * u1_ref[:]
    u2 = uscale * u2_ref[:]
    a0 = soft(dt_mix - u0, k0)
    a1 = soft(dt_ax1 - u1, k1)
    a2 = soft(dt_ax0 - u2, k2)
    r0 = a0 - dt_mix
    r1 = a1 - dt_ax1
    r2 = a2 - dt_ax0
    un0 = u0 + r0
    un1 = u1 + r1
    un2 = u2 + r2
    a0_ref[:] = a0
    a1_ref[:] = a1
    a2_ref[:] = a2
    un0_ref[:] = un0
    un1_ref[:] = un1
    un2_ref[:] = un2

    # Adjoint stencils for the dual residual and eps_dual (vectors stay in
    # VMEM; only their norms leave the kernel).
    dtr = s_mix * _adj0(_adj1(r0)) + s_ax1 * _adj1(r1) + s_ax0 * _adj0(r2)
    dtu = (s_mix * _adj0(_adj1(un0)) + s_ax1 * _adj1(un1)
           + s_ax0 * _adj0(un2))

    # The ||Dtheta|| / ||alpha|| reductions count TRUE rows only (masked
    # rows carry alpha = D theta - u, which the true problem has no row
    # for); r and u are identically zero on masked rows, so the other
    # reductions need no masking.
    if wm is not None:
        sd0, sd1, sd2 = dt_mix * wm[0], dt_ax1 * wm[1], dt_ax0 * wm[2]
        sa0, sa1, sa2 = a0 * wm[0], a1 * wm[1], a2 * wm[2]
    else:
        sd0, sd1, sd2 = dt_mix, dt_ax1, dt_ax0
        sa0, sa1, sa2 = a0, a1, a2
    stats_ref[0] = jnp.sum(r0 * r0) + jnp.sum(r1 * r1) + jnp.sum(r2 * r2)
    stats_ref[1] = (jnp.sum(sd0 * sd0) + jnp.sum(sd1 * sd1)
                    + jnp.sum(sd2 * sd2))
    stats_ref[2] = jnp.sum(sa0 * sa0) + jnp.sum(sa1 * sa1) + jnp.sum(sa2 * sa2)
    stats_ref[3] = jnp.sum(dtr * dtr)
    stats_ref[4] = jnp.sum(dtu * dtu)


def dual_update_2d(theta: jax.Array, u: Tuple[jax.Array, ...],
                   kappa: jax.Array, scales: Tuple[jax.Array, ...],
                   u_scale: jax.Array | None = None,
                   true_m: Tuple[int, int] | None = None,
                   interpret: bool = False):
    """Fused z/dual ADMM stage for p=2.

    The effective dual variable is u_scale * u (u_scale=None means 1) —
    see _dual_update_kernel.  Returns (alpha (3 blocks), u_new (3 blocks),
    stats (5,)) with stats = [||r||^2, ||D theta||^2, ||alpha||^2,
    ||D'r||^2, ||D'u_new||^2].
    """
    dtype = theta.dtype
    scal = jnp.stack([
        jnp.asarray(kappa, dtype),
        jnp.asarray(scales[0], dtype),
        jnp.asarray(scales[1], dtype),
        jnp.asarray(scales[2], dtype),
        (jnp.ones((), dtype) if u_scale is None
         else jnp.asarray(u_scale, dtype)),
    ])
    shapes = jax.ShapeDtypeStruct(theta.shape, dtype)
    outs = pl.pallas_call(
        functools.partial(_dual_update_kernel, true_m),
        out_shape=(
            shapes, shapes, shapes, shapes, shapes, shapes,
            jax.ShapeDtypeStruct((5,), dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
        compiler_params=_params(),
    )(theta, u[0], u[1], u[2], scal)
    alpha = outs[0:3]
    u_new = outs[3:6]
    stats = outs[6]
    return alpha, u_new, stats


# ---------------------------------------------------------------------------
# Kernel 3: the ENTIRE x-update — DCT-preconditioned CG in one kernel
# ---------------------------------------------------------------------------

def _xupdate_kernel(n_steps, b_ref, x_ref, counts_ref, t0_ref, t1_ref,
                    eigs_ref, scal_ref, xout_ref, rsq_ref):
    """Solve (diag(counts) + rho D'D) x = b with n_steps fixed PCG steps,
    preconditioned by the exact DCT solve of (cbar I + rho D'D) — the whole
    solve in one kernel: every CG vector stays VMEM-resident and the DCT
    forward/inverse transforms run as bf16 MXU matmuls (the same effective
    precision as XLA's DEFAULT f32 dot lowering on TPU).

    scal_ref (SMEM, (5,)): [rho, cbar, s_mix, s_ax1, s_ax0].
    t0/t1: bf16 orthonormal DCT-II matrices (rows = frequency index).
    Replaces the reference's per-iteration SuperLU factorize+solve
    (solvers.cpp:113,126)."""
    x = x_ref[:]
    b = b_ref[:]
    counts = counts_ref[:]
    eigs = eigs_ref[:]
    dtype = b.dtype
    mask0, mask1 = _masks(b.shape, dtype)
    rho = scal_ref[0]
    cbar = scal_ref[1]
    g_mix = rho * scal_ref[2] * scal_ref[2]
    g_ax1 = rho * scal_ref[3] * scal_ref[3]
    g_ax0 = rho * scal_ref[4] * scal_ref[4]
    w = cbar + rho * eigs
    eps = jnp.asarray(1e-30, dtype)
    t0 = t0_ref[:]
    t1 = t1_ref[:]

    def matvec(v):
        d1 = _fwd1(v, mask1)
        d0 = _fwd0(v, mask0)
        dm = _fwd1(d0, mask1)
        acc = g_ax1 * _adj1(d1) + g_ax0 * _adj0(d0) + g_mix * _adj0(_adj1(dm))
        return counts * v + acc

    def dct2(v):
        vb = v.astype(t0.dtype)
        tmp = jax.lax.dot_general(
            t0, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype)              # T0 @ v
        return jax.lax.dot_general(
            tmp.astype(t1.dtype), t1, (((1,), (1,)), ((), ())),
            preferred_element_type=dtype)              # @ T1'

    def idct2(v):
        vb = v.astype(t0.dtype)
        tmp = jax.lax.dot_general(
            t0, vb, (((0,), (0,)), ((), ())),
            preferred_element_type=dtype)              # T0' @ v
        return jax.lax.dot_general(
            tmp.astype(t1.dtype), t1, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype)              # @ T1

    def precond(r):
        rhat = dct2(r)
        zhat = rhat / w
        rz = jnp.sum(rhat * zhat)
        return idct2(zhat), rz

    r = b - matvec(x)
    z, rz = precond(r)
    p = z
    for step in range(n_steps):
        ap = matvec(p)
        pap = jnp.sum(p * ap)
        alpha = rz / jnp.maximum(pap, eps)
        x = x + alpha * p
        r = r - alpha * ap
        if step + 1 < n_steps:
            # Last-step precond feeds only beta/p — dead after the loop.
            # Measured neutral on v5e (the lowering already DCEs the dead
            # dots); kept explicit to match solver/xupdate.py's guard and
            # to not depend on DCE for the kernel's FLOP accounting.
            z, rz_new = precond(r)
            beta = rz_new / jnp.maximum(rz, eps)
            p = z + beta * p
            rz = rz_new
    xout_ref[:] = x
    rsq_ref[0] = jnp.sum(r * r)


def _xupdate_kernel_packed(n_steps, b_ref, x_ref, counts_ref,
                           te0_ref, to0_ref, te1_ref, to1_ref,
                           r0_ref, r1_ref,
                           eigs_ref, scal_ref, xout_ref, rsq_ref):
    """Same PCG solve as _xupdate_kernel, but each DCT transform runs as
    two HALF-size bf16 MXU matmuls via the DCT-II even/odd fold
    (ops/dct.py::dct2_packed) — 2x fewer matmul FLOPs.  eigs_ref holds the
    Gram eigenvalues in packed (even, odd) frequency order, absorbing the
    permutation; CG vectors never leave VMEM."""
    from multivartv_tpu.ops import dct as dct_ops

    x = x_ref[:]
    b = b_ref[:]
    counts = counts_ref[:]
    eigs = eigs_ref[:]
    dtype = b.dtype
    mask0, mask1 = _masks(b.shape, dtype)
    rho = scal_ref[0]
    cbar = scal_ref[1]
    g_mix = rho * scal_ref[2] * scal_ref[2]
    g_ax1 = rho * scal_ref[3] * scal_ref[3]
    g_ax0 = rho * scal_ref[4] * scal_ref[4]
    w = cbar + rho * eigs
    eps = jnp.asarray(1e-30, dtype)
    h0 = (te0_ref[:], to0_ref[:])
    h1 = (te1_ref[:], to1_ref[:])
    flips = (r0_ref[:], r1_ref[:])
    md = jnp.bfloat16

    def matvec(v):
        d1 = _fwd1(v, mask1)
        d0 = _fwd0(v, mask0)
        dm = _fwd1(d0, mask1)
        acc = g_ax1 * _adj1(d1) + g_ax0 * _adj0(d0) + g_mix * _adj0(_adj1(dm))
        return counts * v + acc

    def precond(r):
        rhat = dct_ops.dct2_packed(r, h0, h1, mat_dtype=md, flips=flips)
        zhat = rhat / w
        rz = jnp.sum(rhat * zhat)
        return dct_ops.idct2_packed(zhat, h0, h1, mat_dtype=md,
                                    flips=flips), rz

    r = b - matvec(x)
    z, rz = precond(r)
    p = z
    for step in range(n_steps):
        ap = matvec(p)
        pap = jnp.sum(p * ap)
        alpha = rz / jnp.maximum(pap, eps)
        x = x + alpha * p
        r = r - alpha * ap
        if step + 1 < n_steps:
            # Last-step precond feeds only beta/p — dead after the loop.
            # Measured neutral on v5e (the lowering already DCEs the dead
            # dots); kept explicit to match solver/xupdate.py's guard and
            # to not depend on DCE for the kernel's FLOP accounting.
            z, rz_new = precond(r)
            beta = rz_new / jnp.maximum(rz, eps)
            p = z + beta * p
            rz = rz_new
    xout_ref[:] = x
    rsq_ref[0] = jnp.sum(r * r)


def xupdate_pcg_2d_packed(b: jax.Array, x0: jax.Array, counts: jax.Array,
                          dct_halves, eigs_packed: jax.Array,
                          rho: jax.Array, cbar: jax.Array,
                          scales: Tuple[jax.Array, ...], n_steps: int,
                          interpret: bool = False):
    """One-kernel folded-DCT-preconditioned CG x-update (p=2, even axes).
    Returns (x, ||r||^2 after the last step)."""
    dtype = b.dtype
    scal = jnp.stack([
        jnp.asarray(rho, dtype),
        jnp.asarray(cbar, dtype),
        jnp.asarray(scales[0], dtype),
        jnp.asarray(scales[1], dtype),
        jnp.asarray(scales[2], dtype),
    ])
    te0 = dct_halves[0][0].astype(jnp.bfloat16)
    to0 = dct_halves[0][1].astype(jnp.bfloat16)
    te1 = dct_halves[1][0].astype(jnp.bfloat16)
    to1 = dct_halves[1][1].astype(jnp.bfloat16)
    from multivartv_tpu.ops import dct as dct_ops
    r0 = dct_ops.exchange_matrix(b.shape[0] // 2, jnp.bfloat16)
    r1 = dct_ops.exchange_matrix(b.shape[1] // 2, jnp.bfloat16)
    x, rsq = pl.pallas_call(
        functools.partial(_xupdate_kernel_packed, n_steps),
        out_shape=(
            jax.ShapeDtypeStruct(b.shape, dtype),
            jax.ShapeDtypeStruct((1,), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
        compiler_params=_params(),
    )(b, x0, counts, te0, to0, te1, to1, r0, r1, eigs_packed, scal)
    return x, rsq[0]


def xupdate_pcg_2d(b: jax.Array, x0: jax.Array, counts: jax.Array,
                   dct_mats: Tuple[jax.Array, ...], eigs: jax.Array,
                   rho: jax.Array, cbar: jax.Array,
                   scales: Tuple[jax.Array, ...], n_steps: int,
                   interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """One-kernel DCT-preconditioned CG x-update (p=2).  Returns
    (x, ||r||^2 after the last step)."""
    dtype = b.dtype
    scal = jnp.stack([
        jnp.asarray(rho, dtype),
        jnp.asarray(cbar, dtype),
        jnp.asarray(scales[0], dtype),
        jnp.asarray(scales[1], dtype),
        jnp.asarray(scales[2], dtype),
    ])
    t0 = dct_mats[0].astype(jnp.bfloat16)
    t1 = dct_mats[1].astype(jnp.bfloat16)
    x, rsq = pl.pallas_call(
        functools.partial(_xupdate_kernel, n_steps),
        out_shape=(
            jax.ShapeDtypeStruct(b.shape, dtype),
            jax.ShapeDtypeStruct((1,), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
        compiler_params=_params(),
    )(b, x0, counts, t0, t1, eigs, scal)
    return x, rsq[0]


def xupdate_supported(m: Tuple[int, ...], binaries) -> bool:
    """The one-kernel x-update needs ~20 lattice-sized f32 buffers plus
    the DCT half-matrices resident in VMEM: p == 2, full C++ block set,
    lattice <= 1024^2 f32 (measured: the full-ADMM kernel's scoped-VMEM
    stack peaks at 120.7 MB at 1024^2 under the 110 MB vmem_limit_bytes
    + ~20 MB compiler headroom; 2048^2 would need 4x that)."""
    if len(m) != 2 or len(binaries) != 3:
        return False
    lattice_bytes = int(np.prod(m)) * 4
    mat_bytes = 2 * (m[0] * m[0] + m[1] * m[1])
    # The 1024^2 (4 MB-lattice) variant needs the full 110 MB limit; on a
    # part granted less, gate at 512^2 (1 MB lattice, ~28 MB resident).
    gate = (4 << 20) if _vmem_limit_bytes() >= 110 * 1024 * 1024 else (1 << 20)
    return lattice_bytes <= gate and mat_bytes <= (16 << 20)


# ---------------------------------------------------------------------------
# Kernel 4: fused x-update right-hand side b = oty + rho D'(alpha + u)
# ---------------------------------------------------------------------------

def _rhs_kernel(a0_ref, a1_ref, a2_ref, u0_ref, u1_ref, u2_ref, oty_ref,
                scal_ref, b_ref):
    """scal_ref (SMEM, (5,)): [rho, u_scale, s_mix, s_ax1, s_ax0].
    b = oty + rho * sum_b s_b adj_b(alpha_b + u_scale * u_b)
    (reference solvers.cpp:112) in one VMEM pass."""
    rho = scal_ref[0]
    uscale = scal_ref[1]
    s_mix = scal_ref[2]
    s_ax1 = scal_ref[3]
    s_ax0 = scal_ref[4]
    w0 = a0_ref[:] + uscale * u0_ref[:]
    w1 = a1_ref[:] + uscale * u1_ref[:]
    w2 = a2_ref[:] + uscale * u2_ref[:]
    acc = (s_mix * _adj0(_adj1(w0)) + s_ax1 * _adj1(w1) + s_ax0 * _adj0(w2))
    b_ref[:] = oty_ref[:] + rho * acc


def rhs_2d(alpha: Tuple[jax.Array, ...], u: Tuple[jax.Array, ...],
           oty: jax.Array, rho: jax.Array, u_scale: jax.Array | None,
           scales: Tuple[jax.Array, ...],
           interpret: bool = False) -> jax.Array:
    """Fused ADMM x-update RHS for p=2 (blocks in fd_binaries(2) order)."""
    dtype = oty.dtype
    scal = jnp.stack([
        jnp.asarray(rho, dtype),
        (jnp.ones((), dtype) if u_scale is None
         else jnp.asarray(u_scale, dtype)),
        jnp.asarray(scales[0], dtype),
        jnp.asarray(scales[1], dtype),
        jnp.asarray(scales[2], dtype),
    ])
    return pl.pallas_call(
        _rhs_kernel,
        out_shape=jax.ShapeDtypeStruct(oty.shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_params(),
    )(alpha[0], alpha[1], alpha[2], u[0], u[1], u[2], oty, scal)


def supported(m: Tuple[int, ...], binaries) -> bool:
    """Whole-lattice VMEM kernels: p == 2, full C++ block set, and the
    lattice + temporaries fit VMEM (~16 MB/core)."""
    if len(m) != 2 or len(binaries) != 3:
        return False
    return int(np.prod(m)) * 4 <= 4 * 1024 * 1024  # <=1024^2 f32


# ---------------------------------------------------------------------------
# Kernel 5: K FULL ADMM ITERATIONS in one kernel.
#
# The per-iteration chain (rhs -> PCG x-update -> dual stage -> rho
# adaptation) runs entirely in VMEM: theta / u / alpha are aliased
# input-output buffers, so the ADMM state never round-trips HBM between
# iterations — the only HBM traffic for K iterations is the one-time load
# of (counts, oty, DCT halves, eigenvalues) plus the aliased state.  Math
# is identical, iteration for iteration, to solver/admm.py::body (reference
# admm_update, solvers.cpp:96-136): Boyd residual statistics and adaptive
# rho (tau/band with inverse dual rescale) are computed every iteration.
# ---------------------------------------------------------------------------

def _admm_chain(k_iters, n_steps, adapt, tau, tau_shrink, band, true_m,
                counts, oty, h0, h1, flips, eigs,
                lam, rho0, uscale0, cbar, s_mix, s_ax1, s_ax0,
                theta_ref, u0_ref, u1_ref, u2_ref,
                a0_ref, a1_ref, a2_ref, put_stat):
    """k_iters full ADMM iterations executed in-place on VMEM refs — the
    shared core of the single-problem (kernel 5) and batched (kernel 6)
    fused-iteration kernels.  Math is identical, iteration for iteration,
    to solver/admm.py::body (reference admm_update, solvers.cpp:96-136).

    counts/oty/eigs/h0/h1/flips are VALUES already loaded from VMEM; the
    state refs are read and written every iteration; put_stat(i, value)
    records the last iteration's six reductions ([||r||^2, ||Dtheta||^2,
    ||alpha||^2, ||D'r||^2, ||D'u||^2, cg ||res||^2]).  Returns
    (rho, u_scale) after the last iteration."""
    from multivartv_tpu.ops import dct as dct_ops

    dtype = counts.dtype
    mask0, mask1 = _masks(counts.shape, dtype)
    wm = _wmasks2(counts.shape, true_m, dtype)
    md = jnp.bfloat16
    eps = jnp.asarray(1e-30, dtype)

    def adjD(w0, w1, w2):
        return (s_mix * _adj0(_adj1(w0)) + s_ax1 * _adj1(w1)
                + s_ax0 * _adj0(w2))

    def body(_, carry):
        rho, uscale = carry
        g_mix = rho * s_mix * s_mix
        g_ax1 = rho * s_ax1 * s_ax1
        g_ax0 = rho * s_ax0 * s_ax0

        def matvec(v):
            d1 = _fwd1(v, mask1)
            d0 = _fwd0(v, mask0)
            dm = _fwd1(d0, mask1)
            acc = (g_ax1 * _adj1(d1) + g_ax0 * _adj0(d0)
                   + g_mix * _adj0(_adj1(dm)))
            return counts * v + acc

        def precond(r):
            # eigs stay f32, matching xupdate_pcg_2d_packed: the 0.5 MB
            # VMEM saved by bf16 is not worth a precision asymmetry
            # between the two packed preconditioner paths.
            rhat = dct_ops.dct2_packed(r, h0, h1, mat_dtype=md, flips=flips)
            zhat = rhat / (cbar + rho * eigs)
            rz = jnp.sum(rhat * zhat)
            return dct_ops.idct2_packed(zhat, h0, h1, mat_dtype=md,
                                        flips=flips), rz

        # --- x-update rhs: b = oty + rho D'(alpha + uscale*u) ------------
        ue0 = uscale * u0_ref[:]
        ue1 = uscale * u1_ref[:]
        ue2 = uscale * u2_ref[:]

        # --- x-update: folded-DCT-preconditioned CG ----------------------
        # (b = oty + rho D'(alpha + uscale*u) folded straight into the
        # initial residual — never materialized on the VMEM stack.)
        x = theta_ref[:]
        r = (oty + rho * adjD(a0_ref[:] + ue0, a1_ref[:] + ue1,
                              a2_ref[:] + ue2)) - matvec(x)
        z, rz = precond(r)
        p = z
        for step in range(n_steps):
            ap = matvec(p)
            pap = jnp.sum(p * ap)
            al = rz / jnp.maximum(pap, eps)
            x = x + al * p
            r = r - al * ap
            if step + 1 < n_steps:
                # The last step's preconditioner apply feeds only beta/p,
                # which nothing reads after the loop.  Measured neutral
                # on v5e (the lowering already DCEs the dead dots); kept
                # explicit to match the XLA spectral CG
                # (solver/xupdate.py) and the kernel's FLOP accounting.
                z, rz_new = precond(r)
                beta = rz_new / jnp.maximum(rz, eps)
                p = z + beta * p
                rz = rz_new
        theta_ref[:] = x
        put_stat(5, jnp.sum(r * r))

        # --- z/dual stage + Boyd statistics ------------------------------
        d0 = _fwd0(x, mask0)
        dt_mix = s_mix * _fwd1(d0, mask1)
        dt_ax1 = s_ax1 * _fwd1(x, mask1)
        dt_ax0 = s_ax0 * d0
        kappa = lam / rho

        def soft(zv, k):
            return jnp.sign(zv) * jnp.maximum(jnp.abs(zv) - k, 0.0)

        k0, k1, k2 = ((kappa, kappa, kappa) if wm is None
                      else (kappa * wm[0], kappa * wm[1], kappa * wm[2]))
        na0 = soft(dt_mix - ue0, k0)
        na1 = soft(dt_ax1 - ue1, k1)
        na2 = soft(dt_ax0 - ue2, k2)
        r0 = na0 - dt_mix
        r1 = na1 - dt_ax1
        r2 = na2 - dt_ax0
        un0 = ue0 + r0
        un1 = ue1 + r1
        un2 = ue2 + r2
        a0_ref[:] = na0
        a1_ref[:] = na1
        a2_ref[:] = na2
        u0_ref[:] = un0
        u1_ref[:] = un1
        u2_ref[:] = un2

        prim_sq = jnp.sum(r0 * r0) + jnp.sum(r1 * r1) + jnp.sum(r2 * r2)
        # ||Dtheta|| / ||alpha|| count TRUE rows only on the exact padded
        # route (r and u are identically zero on masked rows already).
        if wm is not None:
            sd = (dt_mix * wm[0], dt_ax1 * wm[1], dt_ax0 * wm[2])
            sa = (na0 * wm[0], na1 * wm[1], na2 * wm[2])
        else:
            sd = (dt_mix, dt_ax1, dt_ax0)
            sa = (na0, na1, na2)
        dt_sq = (jnp.sum(sd[0] * sd[0]) + jnp.sum(sd[1] * sd[1])
                 + jnp.sum(sd[2] * sd[2]))
        a_sq = (jnp.sum(sa[0] * sa[0]) + jnp.sum(sa[1] * sa[1])
                + jnp.sum(sa[2] * sa[2]))
        dtr = adjD(r0, r1, r2)
        dtu = adjD(un0, un1, un2)
        dtr_sq = jnp.sum(dtr * dtr)
        dtu_sq = jnp.sum(dtu * dtu)
        put_stat(0, prim_sq)
        put_stat(1, dt_sq)
        put_stat(2, a_sq)
        put_stat(3, dtr_sq)
        put_stat(4, dtu_sq)

        # --- adaptive rho (reference adapt_step, solvers.cpp:77-94) ------
        if adapt:
            pn = jnp.sqrt(prim_sq)
            dn = rho * jnp.sqrt(dtr_sq)
            tau_ = jnp.asarray(tau, dtype)
            tau_s = jnp.asarray(tau if tau_shrink is None else tau_shrink,
                                dtype)
            band_ = jnp.asarray(band, dtype)
            grow = pn > band_ * dn
            shrink = dn > band_ * pn
            factor = jnp.where(grow, tau_,
                               jnp.where(shrink, 1.0 / tau_s, 1.0))
            rho = rho * factor
            uscale = 1.0 / factor
        else:
            uscale = jnp.ones((), dtype)
        return rho, uscale

    return jax.lax.fori_loop(0, k_iters, body, (rho0, uscale0))


def _admm_iters_kernel(k_iters, n_steps, adapt, tau, tau_shrink, band,
                       true_m,
                       theta_in, u0_in, u1_in, u2_in, a0_in, a1_in, a2_in,
                       counts_ref, oty_ref, te0_ref, to0_ref, te1_ref,
                       to1_ref, r0_ref, r1_ref, eigs_ref, scal_ref,
                       theta_ref, u0_ref, u1_ref, u2_ref,
                       a0_ref, a1_ref, a2_ref, scal_out, stats_out):
    """scal_ref (SMEM, (7,)): [lam, rho, u_scale, s_mix, s_ax1, s_ax0, cbar].
    scal_out (SMEM, (2,)): [rho, u_scale] after the last iteration.
    stats_out (SMEM, (6,)): the last iteration's reductions (_admm_chain).
    The *_in refs alias the corresponding output refs (state lives in one
    buffer); all state reads/writes go through the output refs."""
    del theta_in, u0_in, u1_in, u2_in, a0_in, a1_in, a2_in  # aliased

    def put_stat(i, v):
        stats_out[i] = v

    rho, uscale = _admm_chain(
        k_iters, n_steps, adapt, tau, tau_shrink, band, true_m,
        counts_ref[:], oty_ref[:],
        (te0_ref[:], to0_ref[:]), (te1_ref[:], to1_ref[:]),
        (r0_ref[:], r1_ref[:]), eigs_ref[:],
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[6],
        scal_ref[3], scal_ref[4], scal_ref[5],
        theta_ref, u0_ref, u1_ref, u2_ref, a0_ref, a1_ref, a2_ref,
        put_stat)
    scal_out[0] = rho
    scal_out[1] = uscale


def admm_iters_2d(theta: jax.Array, u: Tuple[jax.Array, ...],
                  alpha: Tuple[jax.Array, ...], counts: jax.Array,
                  oty: jax.Array, dct_halves, eigs_packed: jax.Array,
                  lam: jax.Array, rho: jax.Array, u_scale: jax.Array,
                  cbar: jax.Array, scales: Tuple[jax.Array, ...],
                  k_iters: int, n_steps: int, adapt: bool = True,
                  tau: float = 2.0, tau_shrink: float | None = None,
                  band: float = 10.0,
                  true_m: Tuple[int, int] | None = None,
                  interpret: bool = False):
    """Run k_iters full ADMM iterations in ONE kernel (p=2, even axes).

    Returns (theta, u (3), alpha (3), rho, u_scale, stats (6,)) where stats
    holds the last iteration's Boyd reductions + CG residual (see
    _admm_iters_kernel).  State buffers are donated (aliased in-place).
    """
    dtype = theta.dtype
    scal = jnp.stack([
        jnp.asarray(lam, dtype),
        jnp.asarray(rho, dtype),
        jnp.asarray(u_scale, dtype),
        jnp.asarray(scales[0], dtype),
        jnp.asarray(scales[1], dtype),
        jnp.asarray(scales[2], dtype),
        jnp.asarray(cbar, dtype),
    ])
    te0 = dct_halves[0][0].astype(jnp.bfloat16)
    to0 = dct_halves[0][1].astype(jnp.bfloat16)
    te1 = dct_halves[1][0].astype(jnp.bfloat16)
    to1 = dct_halves[1][1].astype(jnp.bfloat16)
    from multivartv_tpu.ops import dct as dct_ops
    r0 = dct_ops.exchange_matrix(theta.shape[0] // 2, jnp.bfloat16)
    r1 = dct_ops.exchange_matrix(theta.shape[1] // 2, jnp.bfloat16)
    eigs_packed = eigs_packed.astype(dtype)
    shp = jax.ShapeDtypeStruct(theta.shape, dtype)
    outs = pl.pallas_call(
        functools.partial(_admm_iters_kernel, k_iters, n_steps, adapt,
                          tau, tau_shrink, band, true_m),
        out_shape=(
            shp, shp, shp, shp, shp, shp, shp,
            jax.ShapeDtypeStruct((2,), dtype),
            jax.ShapeDtypeStruct((6,), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 16
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6},
        interpret=interpret,
        compiler_params=_params(),
    )(theta, u[0], u[1], u[2], alpha[0], alpha[1], alpha[2],
      counts, oty, te0, to0, te1, to1, r0, r1, eigs_packed, scal)
    new_theta = outs[0]
    new_u = outs[1:4]
    new_alpha = outs[4:7]
    rho_scale = outs[7]
    stats = outs[8]
    return (new_theta, new_u, new_alpha, rho_scale[0], rho_scale[1], stats)


# ---------------------------------------------------------------------------
# Kernel 6: K FULL ADMM ITERATIONS x B INDEPENDENT PROBLEMS in one kernel.
#
# The reference's product path is the 5-fold CV fit (mbs_impl,
# solvers.cpp:305-376) — B simultaneous solves (CV folds, lambda sweeps,
# scenario batches).  jax.vmap cannot batch a pallas_call whose scalars
# live in SMEM, so batching is explicit: grid=(B,), one grid step per
# problem.  State lives in HBM ((B, m0, m1) buffers, aliased in-place) and
# is DMA'd through single-buffered VMEM scratch; per-problem scalars
# (lambda, rho, u_scale, cbar, activity) are full-array SMEM operands
# indexed by pl.program_id(0); the DCT halves / flip matrices / packed
# eigenvalues are VMEM-resident operands shared across all grid steps
# (constant index map -> fetched once).  Each grid step runs k_iters full
# ADMM iterations via _admm_chain — identical math to kernels 1-5 and to
# solver/admm.py::body.
#
# Problems whose activity flag is 0 (already Boyd-converged in a batched
# convergent solve) are skipped entirely: no DMA, no compute — their state
# rows pass through untouched via the input/output aliasing, matching the
# freeze-when-converged semantics of a vmapped lax.while_loop.
# ---------------------------------------------------------------------------

def _admm_iters_batched_kernel(k_iters, n_steps, adapt, tau, tau_shrink,
                               band, true_m, shared_problem, *refs):
    if shared_problem:
        (theta_in, u0_in, u1_in, u2_in, a0_in, a1_in, a2_in,
         counts_ref, oty_ref, te0, to0, te1, to1, r0f, r1f, eigs_ref,
         scalb_ref, scalsh_ref, act_ref,
         theta_out, u0_out, u1_out, u2_out, a0_out, a1_out, a2_out,
         scal_out, stats_out,
         theta_s, u0_s, u1_s, u2_s, a0_s, a1_s, a2_s, sems) = refs
        counts_s = oty_s = None
    else:
        (theta_in, u0_in, u1_in, u2_in, a0_in, a1_in, a2_in,
         counts_ref, oty_ref, te0, to0, te1, to1, r0f, r1f, eigs_ref,
         scalb_ref, scalsh_ref, act_ref,
         theta_out, u0_out, u1_out, u2_out, a0_out, a1_out, a2_out,
         scal_out, stats_out,
         theta_s, u0_s, u1_s, u2_s, a0_s, a1_s, a2_s,
         counts_s, oty_s, sems) = refs

    b = pl.program_id(0)

    @pl.when(act_ref[b] != 0)
    def _():
        ins = [theta_in, u0_in, u1_in, u2_in, a0_in, a1_in, a2_in]
        scr = [theta_s, u0_s, u1_s, u2_s, a0_s, a1_s, a2_s]
        if not shared_problem:
            ins += [counts_ref, oty_ref]
            scr += [counts_s, oty_s]
        copies = [pltpu.make_async_copy(r.at[b], s, sems.at[i])
                  for i, (r, s) in enumerate(zip(ins, scr))]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        counts = counts_ref[:] if shared_problem else counts_s[:]
        oty = oty_ref[:] if shared_problem else oty_s[:]

        def put_stat(i, v):
            stats_out[b, i] = v

        rho, uscale = _admm_chain(
            k_iters, n_steps, adapt, tau, tau_shrink, band, true_m,
            counts, oty, (te0[:], to0[:]), (te1[:], to1[:]),
            (r0f[:], r1f[:]), eigs_ref[:],
            scalb_ref[b, 0], scalb_ref[b, 1], scalb_ref[b, 2],
            scalb_ref[b, 3],
            scalsh_ref[0], scalsh_ref[1], scalsh_ref[2],
            theta_s, u0_s, u1_s, u2_s, a0_s, a1_s, a2_s, put_stat)
        scal_out[b, 0] = rho
        scal_out[b, 1] = uscale

        outs = [theta_out, u0_out, u1_out, u2_out, a0_out, a1_out, a2_out]
        wc = [pltpu.make_async_copy(s, r.at[b], sems.at[i])
              for i, (s, r) in enumerate(zip(scr[:7], outs))]
        for c in wc:
            c.start()
        for c in wc:
            c.wait()

    @pl.when(act_ref[b] == 0)
    def _():
        # Frozen problem: pass scalars through (state rows pass through
        # via the input/output aliasing); stats are stale by contract —
        # the driver keeps the frozen element's previous norms.
        scal_out[b, 0] = scalb_ref[b, 1]
        scal_out[b, 1] = scalb_ref[b, 2]
        for i in range(6):
            stats_out[b, i] = jnp.zeros((), scalb_ref.dtype)


def admm_iters_2d_batched(theta: jax.Array, u: Tuple[jax.Array, ...],
                          alpha: Tuple[jax.Array, ...], counts: jax.Array,
                          oty: jax.Array, dct_halves,
                          eigs_packed: jax.Array, lams: jax.Array,
                          rhos: jax.Array, u_scales: jax.Array,
                          cbars: jax.Array, scales: Tuple[jax.Array, ...],
                          k_iters: int, n_steps: int,
                          active: jax.Array | None = None,
                          adapt: bool = True, tau: float = 2.0,
                          tau_shrink: float | None = None,
                          band: float = 10.0,
                          true_m: Tuple[int, int] | None = None,
                          interpret: bool = False):
    """k_iters ADMM iterations for each of B problems in ONE kernel.

    theta/u/alpha: (B, m0, m1) state (donated in-place).  counts/oty:
    per-problem (B, m0, m1) (CV folds) or shared (m0, m1) (lambda sweeps
    of one problem).  lams/rhos/u_scales/cbars: (B,).  active: (B,) bool
    (None = all active); inactive rows are skipped and pass through.

    Returns (theta, u (3), alpha (3), rhos (B,), u_scales (B,),
    stats (B, 6)) — stats rows of inactive elements are zero.
    """
    B = int(theta.shape[0])
    m = tuple(theta.shape[1:])
    dtype = theta.dtype
    shared = counts.ndim == 2
    scalb = jnp.stack([
        jnp.broadcast_to(jnp.asarray(lams, dtype), (B,)),
        jnp.broadcast_to(jnp.asarray(rhos, dtype), (B,)),
        jnp.broadcast_to(jnp.asarray(u_scales, dtype), (B,)),
        jnp.broadcast_to(jnp.asarray(cbars, dtype), (B,)),
    ], axis=1)
    scalsh = jnp.stack([jnp.asarray(s, dtype) for s in scales[:3]])
    act = (jnp.ones((B,), jnp.int32) if active is None
           else jnp.asarray(active, jnp.int32))

    te0 = dct_halves[0][0].astype(jnp.bfloat16)
    to0 = dct_halves[0][1].astype(jnp.bfloat16)
    te1 = dct_halves[1][0].astype(jnp.bfloat16)
    to1 = dct_halves[1][1].astype(jnp.bfloat16)
    from multivartv_tpu.ops import dct as dct_ops
    r0f = dct_ops.exchange_matrix(m[0] // 2, jnp.bfloat16)
    r1f = dct_ops.exchange_matrix(m[1] // 2, jnp.bfloat16)
    eigs = eigs_packed.astype(dtype)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def vmem_shared(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b: (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = [any_spec] * 7
    in_specs += ([vmem_shared(m)] * 2 if shared else [any_spec] * 2)
    in_specs += [vmem_shared(t.shape)
                 for t in (te0, to0, te1, to1, r0f, r1f, eigs)]
    in_specs += [smem_spec, smem_spec, smem_spec]
    out_specs = tuple([any_spec] * 7 + [smem_spec, smem_spec])

    shp = jax.ShapeDtypeStruct((B,) + m, dtype)
    out_shape = tuple([shp] * 7) + (
        jax.ShapeDtypeStruct((B, 2), dtype),
        jax.ShapeDtypeStruct((B, 6), dtype),
    )
    scratch = [pltpu.VMEM(m, dtype)] * (7 if shared else 9)
    scratch += [pltpu.SemaphoreType.DMA((9,))]

    outs = pl.pallas_call(
        functools.partial(_admm_iters_batched_kernel, k_iters, n_steps,
                          adapt, tau, tau_shrink, band, true_m, shared),
        grid=(B,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6},
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_params(),
    )(theta, u[0], u[1], u[2], alpha[0], alpha[1], alpha[2], counts, oty,
      te0, to0, te1, to1, r0f, r1f, eigs, scalb, scalsh, act)
    rho_scale = outs[7]
    return (outs[0], outs[1:4], outs[4:7], rho_scale[:, 0], rho_scale[:, 1],
            outs[8])


def batched_supported(m: Tuple[int, ...], binaries) -> bool:
    """grid=(B,) batched kernel: p == 2, full C++ block set, even axes
    sized so one problem's state + DCT matrices fit VMEM scratch, and
    DMA-sliceable layout (sublane multiple of 8, lane multiple of 128)."""
    if len(m) != 2 or len(binaries) != 3:
        return False
    if m[0] % 8 or m[1] % 128:
        return False
    lattice_bytes = int(np.prod(m)) * 4
    mat_bytes = 2 * (m[0] * m[0] + m[1] * m[1])
    return lattice_bytes <= (1 << 20) and mat_bytes <= (2 << 20)


# ---------------------------------------------------------------------------
# Kernels 7/8: TILED dual stage + rhs for large 2-D lattices (2048^2+).
#
# Above the whole-lattice VMEM gate, the jnp stencil stages run each
# roll/mask/reduce as separate HBM passes (measured 5.5 ms of the 17.4 ms
# 4096^2 iteration).  These kernels stream row panels through VMEM with a
# one-row halo: the dual kernel reads theta + 3 u panels and writes the 6
# updated blocks plus ALL five Boyd reductions in one pass; the rhs kernel
# reads the 6 blocks + oty and writes b.  Row panels are DMA'd manually
# (pl.ds with dynamic start) because BlockSpecs cannot express the row
# halo, with ping-pong double buffering (tile t+1 prefetches while tile t
# computes); the first/last tiles take static-size branch copies and a
# validity mask reproduces the padded-block convention (w[-1] == 0) at
# the lattice edge.
# ---------------------------------------------------------------------------

def _tile_target(m1: int) -> int:
    """Ideal row-panel height for lane width m1: ~2 MB panels (the
    kernels keep ~18 live panel temporaries plus double-buffered in/out
    panels in VMEM), multiple of 8."""
    return max(8, min(512, ((2 << 20) // (int(m1) * 4)) // 8 * 8))


def _tile_rows(m: Tuple[int, int]) -> int:
    """Row-panel height: the largest multiple of 8 <= _tile_target that
    divides m0.  solver/pad.py::pad_target_m guarantees padded lattices
    always have a divisor >= min(64, target), so the 8-row fallback
    (200% halo overhead) is unreachable on the padded route."""
    target = _tile_target(m[1])
    for t in range(target, 7, -8):
        if m[0] % t == 0:
            return t
    return 8


def tiled_supported(m: Tuple[int, ...], binaries) -> bool:
    """p == 2, full C++ block set, DMA-aligned panels, and at least two
    row panels (whole-lattice kernels serve smaller lattices)."""
    if len(m) != 2 or len(binaries) != 3:
        return False
    if m[0] % 8 or m[1] % 128:
        return False
    return m[0] > _tile_rows(m)


# Halo rows per panel side: 8 keeps every DMA row offset and size
# sublane-aligned (the stencils only need 1; the extra rows are masked).
HALO = 8


def _halo_copies(tt, n_tiles, T, src, dst, sem, H=None, halo=None,
                 hsem=None, H_bot=None):
    """(predicate, async_copy) branch set loading tile tt's extended
    panel — rows [tt*T - H, tt*T + T + H) clamped at the lattice
    edge (edge halo rows keep stale scratch data; callers mask them).
    pl.multiple_of: T and H are multiples of 8 (H defaults to HALO == 8;
    the 3-D kernels pass H = m1 + 8), so every start is 8-aligned — the
    hint lets Mosaic prove the sublane tiling.

    halo = (top_ref, bot_ref) ((H, width) VMEM refs, sharded-lattice
    mode): edge tiles fill their out-of-slab halo rows from these instead
    of leaving them for the caller to zero — the neighbor shard's
    boundary rows (global-edge shards pass zero arrays).  hsem: DMA
    semaphore for the halo copies.

    H_bot: bottom-halo row count when asymmetric (default = H).  A
    kernel that only applies ADJOINT chains (up-shifts) needs no bottom
    halo at all (H_bot = 0) — at 256^3 the m1+8-row halo is 26% of the
    panel, so halving it is real bandwidth."""
    H = HALO if H is None else H
    H_bot = H if H_bot is None else H_bot
    lo = pl.multiple_of(tt * T - H, 8)
    out = [
        (jnp.logical_and(tt > 0, tt < n_tiles - 1),
         pltpu.make_async_copy(src.at[pl.ds(lo, T + H + H_bot), :], dst,
                               sem)),
        (tt == 0,
         pltpu.make_async_copy(src.at[pl.ds(0, T + H_bot), :],
                               dst.at[pl.ds(H, T + H_bot), :], sem)),
        (jnp.logical_and(tt == n_tiles - 1, tt > 0),
         pltpu.make_async_copy(src.at[pl.ds(lo, T + H), :],
                               dst.at[pl.ds(0, T + H), :], sem)),
    ]
    if halo is not None:
        top, bot = halo
        out += [
            (tt == 0,
             pltpu.make_async_copy(top, dst.at[pl.ds(0, H), :], hsem)),
        ]
        if H_bot:
            out += [
                (tt == n_tiles - 1,
                 pltpu.make_async_copy(bot, dst.at[pl.ds(T + H, H_bot), :],
                                       hsem)),
            ]
    return out


def _halo_pingpong(t, n_tiles, T, ins, scr, sems, H=None, halos=None,
                   hsems=None, H_bot=None):
    """Double-buffered halo loads: start tile 0 at step 0, prefetch tile
    t+1 into the other buffer, then wait for tile t's copies.  scr[i] has
    a leading buffer axis of 2; sems has shape (2, len(ins)).  Returns
    the current-buffer index (traced).  H: halo rows per side (default
    HALO; the 3-D flattened-rows kernels pass m1 + 8).

    halos: optional list of (top_ref, bot_ref) per input (sharded-lattice
    mode) — edge tiles DMA their out-of-slab halo rows from the neighbor
    shard's boundary slabs instead of zeroing them; hsems has shape
    (2, len(ins)) when halos is given.  H_bot: asymmetric bottom halo
    (see _halo_copies)."""
    H = HALO if H is None else H
    H_bot = H if H_bot is None else H_bot
    cur = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def issue(tt, buf, start):
        for i, (r, s) in enumerate(zip(ins, scr)):
            halo = None if halos is None else halos[i]
            hsem = None if halos is None else hsems.at[buf, i]
            for pred, cp in _halo_copies(tt, n_tiles, T, r, s.at[buf],
                                         sems.at[buf, i], H=H, halo=halo,
                                         hsem=hsem, H_bot=H_bot):
                @pl.when(pred)
                def _(cp=cp):
                    cp.start() if start else cp.wait()

    @pl.when(t == 0)
    def _():
        issue(t, cur, start=True)          # t == 0 here

    @pl.when(t + 1 < n_tiles)
    def _():
        issue(t + 1, nxt, start=True)

    issue(t, cur, start=False)             # wait for tile t

    if halos is not None:
        # Sharded mode: edge halos were DMA'd from the neighbor slabs
        # (zero arrays at true global edges), so nothing is stale.
        return cur

    # Zero the rows the edge tiles do NOT DMA: the masks downstream rely
    # on x*0 == 0, which is FALSE for stale Inf/NaN VMEM bits — in a real
    # program context (scratch reused across ops) this produced NaN Boyd
    # stats at the lattice edge (caught on chip by
    # test_tpu_live.py::test_tiled_kernels_on_chip).

    @pl.when(t == 0)
    def _():
        for s in scr:
            s[cur, :H, :] = jnp.zeros((H, s.shape[-1]), s.dtype)

    if H_bot:
        @pl.when(t == n_tiles - 1)
        def _():
            for s in scr:
                s[cur, s.shape[-2] - H_bot:, :] = jnp.zeros(
                    (H_bot, s.shape[-1]), s.dtype)
    return cur


def _tiled_dual_kernel(T, m0, m1, n_tiles, true_m, sharded, want_adjoints,
                       want_alpha, *refs):
    """Extended-panel dual stage: locals 0..T+2*HALO-1 map to global rows
    t*T-HALO .. t*T+T+HALO-1; outputs cover locals HALO..HALO+T-1;
    adjoints at local l read l-1, so halo-row values are computed too and
    zeroed where the global row is < 0 (the w[-1] == 0 convention).
    true_m: TRUE lattice dims for the exact padded-solve route (see
    _wmasks2) — masks the prox threshold and the ||Dtheta||/||alpha||
    reductions to the true problem's rows.

    sharded=True (the shard_map lattice-sharded variant): the HBM inputs
    are this shard's ROW SLAB of the global lattice, preceded by an SMEM
    global-row offset and per-input (HALO, m1) neighbor-boundary arrays
    that fill the edge tiles' out-of-slab halo rows; m0 stays the GLOBAL
    row count (all masks use global rows).

    want_adjoints (r5, mirrors the p=3 kernel): additionally write
    dta = D'alpha_new and dtu = D'u_new (computed for the Boyd stats
    anyway), collapsing the next iteration's rhs to a fused elementwise
    pass.

    want_alpha=False (r5): skip the 3 alpha HBM outputs.  On the
    adjoint-carrying ADMM route nothing reads the per-iteration alpha
    arrays (the rhs consumes dta/dtu; the Boyd reductions are in-kernel),
    so the writes are 3/12 of the stage's streaming traffic for dead
    stores — admm_solve refreshes alpha once after the loop instead."""
    k = 0
    if sharded:
        off_ref = refs[k]; k += 1
        ht = refs[k:k + 4]; k += 4
        hb = refs[k:k + 4]; k += 4
        halos = list(zip(ht, hb))
    else:
        off_ref = None
        halos = None
    theta_hbm, u0_hbm, u1_hbm, u2_hbm = refs[k:k + 4]; k += 4
    scal_ref = refs[k]; k += 1
    a_refs = None
    if want_alpha:
        a_refs = refs[k:k + 3]; k += 3
    un0_ref, un1_ref, un2_ref = refs[k:k + 3]; k += 3
    if want_adjoints:
        dta_ref, dtu_ref = refs[k:k + 2]; k += 2
    stats_ref = refs[k]; k += 1
    theta_s, u0_s, u1_s, u2_s = refs[k:k + 4]; k += 4
    sems = refs[k]; k += 1
    hsems = refs[k] if sharded else None
    t = pl.program_id(0)
    dtype = theta_s.dtype
    kappa = scal_ref[0]
    s_mix = scal_ref[1]
    s_ax1 = scal_ref[2]
    s_ax0 = scal_ref[3]
    uscale = scal_ref[4]

    ins = [theta_hbm, u0_hbm, u1_hbm, u2_hbm]
    scr = [theta_s, u0_s, u1_s, u2_s]
    cur = _halo_pingpong(t, n_tiles, T, ins, scr, sems, halos=halos,
                         hsems=hsems)

    theta = theta_s[cur]
    H = HALO
    R = T + 2 * H
    off = off_ref[0] if sharded else 0
    g = jax.lax.broadcasted_iota(jnp.int32, (R, m1), 0) + t * T - H + off
    col = jax.lax.broadcasted_iota(jnp.int32, (R, m1), 1)
    mask0 = jnp.logical_and(g < m0 - 1, g >= 0).astype(dtype)
    mask1 = (col < m1 - 1).astype(dtype)
    valid = (g >= 0).astype(dtype)
    if true_m is not None:
        # Global-row w masks (halo rows included: their r values feed the
        # adjoints at the first output row, so they must be exact too; on
        # g < 0 rows z == 0, so the threshold value there is irrelevant).
        t0t, t1t = int(true_m[0]), int(true_m[1])
        rA = (g < t0t - 1).astype(dtype)
        rB = (g < t0t).astype(dtype)
        cA = (col < t1t - 1).astype(dtype)
        cB = (col < t1t).astype(dtype)
        wm = (rA * cA, rB * cA, rA * cB)
    else:
        wm = None

    # Forward diffs on the extended panel.  _shift_down wraps local row
    # R-1, whose results are never consumed (outputs stop at local T and
    # d at local T reads theta[T+1], in-panel).
    d0 = (_shift_down(theta, 0) - theta) * mask0
    dt_mix = s_mix * _fwd1(d0, mask1)
    dt_ax1 = s_ax1 * _fwd1(theta, mask1) * valid
    dt_ax0 = s_ax0 * d0

    def soft(z, k):
        return jnp.sign(z) * jnp.maximum(jnp.abs(z) - k, 0.0)

    k0, k1, k2 = ((kappa, kappa, kappa) if wm is None
                  else (kappa * wm[0], kappa * wm[1], kappa * wm[2]))
    u0 = uscale * u0_s[cur] * valid
    u1 = uscale * u1_s[cur] * valid
    u2 = uscale * u2_s[cur] * valid
    a0 = soft(dt_mix - u0, k0)
    a1 = soft(dt_ax1 - u1, k1)
    a2 = soft(dt_ax0 - u2, k2)
    r0 = a0 - dt_mix
    r1 = a1 - dt_ax1
    r2 = a2 - dt_ax0
    un0 = u0 + r0
    un1 = u1 + r1
    un2 = u2 + r2

    sl = slice(H, T + H)
    if want_alpha:
        a_refs[0][:] = a0[sl]
        a_refs[1][:] = a1[sl]
        a_refs[2][:] = a2[sl]
    un0_ref[:] = un0[sl]
    un1_ref[:] = un1[sl]
    un2_ref[:] = un2[sl]

    # Adjoint stencils (valid at locals 1..T given halo values at 0).
    dtr = s_mix * _adj0(_adj1(r0)) + s_ax1 * _adj1(r1) + s_ax0 * _adj0(r2)
    dtu = (s_mix * _adj0(_adj1(un0)) + s_ax1 * _adj1(un1)
           + s_ax0 * _adj0(un2))
    if want_adjoints:
        dta = (s_mix * _adj0(_adj1(a0)) + s_ax1 * _adj1(a1)
               + s_ax0 * _adj0(a2))
        dta_ref[:] = dta[sl]
        dtu_ref[:] = dtu[sl]

    # Per-tile PARTIAL stats, one row per grid step (summed by the
    # wrapper): accumulating into one SMEM output block across grid steps
    # worked in interpret mode but read garbage on real hardware (the
    # revisited block is not guaranteed preserved for SMEM outputs) —
    # caught by tests/test_tpu_live.py::test_tiled_kernels_on_chip.
    if wm is not None:
        sd = (dt_mix * wm[0], dt_ax1 * wm[1], dt_ax0 * wm[2])
        sa = (a0 * wm[0], a1 * wm[1], a2 * wm[2])
    else:
        sd = (dt_mix, dt_ax1, dt_ax0)
        sa = (a0, a1, a2)
    part = [
        (jnp.sum(r0[sl] ** 2) + jnp.sum(r1[sl] ** 2) + jnp.sum(r2[sl] ** 2)),
        (jnp.sum(sd[0][sl] ** 2) + jnp.sum(sd[1][sl] ** 2)
         + jnp.sum(sd[2][sl] ** 2)),
        (jnp.sum(sa[0][sl] ** 2) + jnp.sum(sa[1][sl] ** 2)
         + jnp.sum(sa[2][sl] ** 2)),
        jnp.sum(dtr[sl] ** 2),
        jnp.sum(dtu[sl] ** 2),
    ]
    for i, v in enumerate(part):
        stats_ref[t, i] = v


def dual_update_tiled_2d(theta: jax.Array, u: Tuple[jax.Array, ...],
                         kappa: jax.Array, scales: Tuple[jax.Array, ...],
                         u_scale: jax.Array | None = None,
                         true_m: Tuple[int, int] | None = None,
                         want_adjoints: bool = False,
                         want_alpha: bool = True,
                         interpret: bool = False,
                         tile_rows: int | None = None):
    """Row-panel-streamed dual_update_2d for lattices above the
    whole-lattice VMEM gate.  Same contract as dual_update_2d; with
    want_adjoints, returns (alpha, u_new, stats, dta, dtu); with
    want_alpha=False the alpha slot is None (dead-store elision — see
    _tiled_dual_kernel)."""
    m = tuple(int(v) for v in theta.shape)
    dtype = theta.dtype
    T = tile_rows if tile_rows is not None else _tile_rows(m)
    n_tiles = m[0] // T
    scal = jnp.stack([
        jnp.asarray(kappa, dtype),
        jnp.asarray(scales[0], dtype),
        jnp.asarray(scales[1], dtype),
        jnp.asarray(scales[2], dtype),
        (jnp.ones((), dtype) if u_scale is None
         else jnp.asarray(u_scale, dtype)),
    ])
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    tile_spec = pl.BlockSpec((T, m[1]), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    # Whole-array SMEM output, one row per grid step (kernel 6's proven
    # on-chip pattern; blocked SMEM outputs are rejected by Mosaic).
    smem_stat = pl.BlockSpec(memory_space=pltpu.SMEM)
    shp = jax.ShapeDtypeStruct(m, dtype)
    n_a = 3 if want_alpha else 0
    n_out = n_a + 3 + (2 if want_adjoints else 0)
    outs = pl.pallas_call(
        functools.partial(_tiled_dual_kernel, T, m[0], m[1], n_tiles,
                          true_m, False, want_adjoints, want_alpha),
        grid=(n_tiles,),
        out_shape=tuple([shp] * n_out) + (
            jax.ShapeDtypeStruct((n_tiles, 5), dtype),),
        in_specs=[any_spec] * 4 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple([tile_spec] * n_out) + (smem_stat,),
        scratch_shapes=[pltpu.VMEM((2, T + 2 * HALO, m[1]), dtype)] * 4
        + [pltpu.SemaphoreType.DMA((2, 4))],
        interpret=interpret,
        compiler_params=_params(),
    )(theta, u[0], u[1], u[2], scal)
    stats = jnp.sum(outs[n_out], axis=0)
    alpha = outs[0:3] if want_alpha else None
    un = outs[n_a:n_a + 3]
    if want_adjoints:
        return alpha, un, stats, outs[n_a + 3], outs[n_a + 4]
    return alpha, un, stats


def dual_update_tiled_2d_shard(theta: jax.Array, u: Tuple[jax.Array, ...],
                               halos_top, halos_bot, row_off: jax.Array,
                               m0_global: int,
                               kappa: jax.Array,
                               scales: Tuple[jax.Array, ...],
                               u_scale: jax.Array | None = None,
                               true_m: Tuple[int, int] | None = None,
                               want_adjoints: bool = False,
                               want_alpha: bool = True,
                               interpret: bool = False,
                               tile_rows: int | None = None):
    """Shard-local dual stage (called INSIDE shard_map with the lattice
    sharded over rows): theta/u are this shard's (m0_local, m1) slabs,
    halos_top/halos_bot the 4 neighbor boundary arrays (HALO, m1) in
    (theta, u0, u1, u2) order (zeros at global edges), row_off the global
    row index of local row 0.  Returns (alpha (3), u_new (3),
    stats-partial (5,)) — caller psums stats over the shard axis; with
    want_adjoints, additionally (dta, dtu) local slabs; with
    want_alpha=False the alpha slot is None (dead-store elision)."""
    m = tuple(int(v) for v in theta.shape)
    dtype = theta.dtype
    T = tile_rows if tile_rows is not None else _tile_rows(m)
    n_tiles = m[0] // T
    scal = jnp.stack([
        jnp.asarray(kappa, dtype),
        jnp.asarray(scales[0], dtype),
        jnp.asarray(scales[1], dtype),
        jnp.asarray(scales[2], dtype),
        (jnp.ones((), dtype) if u_scale is None
         else jnp.asarray(u_scale, dtype)),
    ])
    off = jnp.asarray(row_off, jnp.int32).reshape(1)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    halo_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((T, m[1]), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct(m, dtype)
    n_a = 3 if want_alpha else 0
    n_out = n_a + 3 + (2 if want_adjoints else 0)
    outs = pl.pallas_call(
        functools.partial(_tiled_dual_kernel, T, int(m0_global), m[1],
                          n_tiles, true_m, True, want_adjoints,
                          want_alpha),
        grid=(n_tiles,),
        out_shape=tuple([shp] * n_out) + (
            jax.ShapeDtypeStruct((n_tiles, 5), dtype),),
        in_specs=[smem_spec] + [halo_spec] * 8 + [any_spec] * 4
        + [smem_spec],
        out_specs=tuple([tile_spec] * n_out) + (smem_spec,),
        scratch_shapes=[pltpu.VMEM((2, T + 2 * HALO, m[1]), dtype)] * 4
        + [pltpu.SemaphoreType.DMA((2, 4)), pltpu.SemaphoreType.DMA((2, 4))],
        interpret=interpret,
        compiler_params=_params(),
    )(off, halos_top[0], halos_top[1], halos_top[2], halos_top[3],
      halos_bot[0], halos_bot[1], halos_bot[2], halos_bot[3],
      theta, u[0], u[1], u[2], scal)
    stats = jnp.sum(outs[n_out], axis=0)
    alpha = outs[0:3] if want_alpha else None
    un = outs[n_a:n_a + 3]
    if want_adjoints:
        return alpha, un, stats, outs[n_a + 3], outs[n_a + 4]
    return alpha, un, stats


def _tiled_rhs_kernel(T, m0, m1, n_tiles, sharded, *refs):
    """b = oty + rho D'(alpha + u_scale u) on row panels with a one-row
    top halo (adjoints read local l-1).  sharded: see
    _tiled_dual_kernel."""
    if sharded:
        (off_ref, h0, h1, h2, h3, h4, h5, b0, b1, b2, b3, b4, b5,
         a0_hbm, a1_hbm, a2_hbm, u0_hbm, u1_hbm, u2_hbm,
         oty_ref, scal_ref, b_ref,
         a0_s, a1_s, a2_s, u0_s, u1_s, u2_s, sems, hsems) = refs
        halos = [(h0, b0), (h1, b1), (h2, b2), (h3, b3), (h4, b4),
                 (h5, b5)]
    else:
        (a0_hbm, a1_hbm, a2_hbm, u0_hbm, u1_hbm, u2_hbm,
         oty_ref, scal_ref, b_ref,
         a0_s, a1_s, a2_s, u0_s, u1_s, u2_s, sems) = refs
        halos = None
        hsems = None
    t = pl.program_id(0)
    dtype = oty_ref.dtype
    rho = scal_ref[0]
    uscale = scal_ref[1]
    s_mix = scal_ref[2]
    s_ax1 = scal_ref[3]
    s_ax0 = scal_ref[4]

    ins = [a0_hbm, a1_hbm, a2_hbm, u0_hbm, u1_hbm, u2_hbm]
    scr = [a0_s, a1_s, a2_s, u0_s, u1_s, u2_s]
    cur = _halo_pingpong(t, n_tiles, T, ins, scr, sems, halos=halos,
                         hsems=hsems)

    H = HALO
    R = T + 2 * H
    off = off_ref[0] if sharded else 0
    g = jax.lax.broadcasted_iota(jnp.int32, (R, m1), 0) + t * T - H + off
    valid = (g >= 0).astype(dtype)
    au0 = (a0_s[cur] + uscale * u0_s[cur]) * valid
    au1 = (a1_s[cur] + uscale * u1_s[cur]) * valid
    au2 = (a2_s[cur] + uscale * u2_s[cur]) * valid
    acc = (s_mix * _adj0(_adj1(au0)) + s_ax1 * _adj1(au1)
           + s_ax0 * _adj0(au2))
    b_ref[:] = oty_ref[:] + rho * acc[H:T + H]


def rhs_tiled_2d(alpha: Tuple[jax.Array, ...], u: Tuple[jax.Array, ...],
                 oty: jax.Array, rho: jax.Array, u_scale: jax.Array,
                 scales: Tuple[jax.Array, ...],
                 interpret: bool = False,
                 tile_rows: int | None = None) -> jax.Array:
    """Row-panel-streamed rhs_2d (same contract) for large lattices."""
    m = tuple(int(v) for v in oty.shape)
    dtype = oty.dtype
    T = tile_rows if tile_rows is not None else _tile_rows(m)
    n_tiles = m[0] // T
    scal = jnp.stack([
        jnp.asarray(rho, dtype),
        (jnp.ones((), dtype) if u_scale is None
         else jnp.asarray(u_scale, dtype)),
        jnp.asarray(scales[0], dtype),
        jnp.asarray(scales[1], dtype),
        jnp.asarray(scales[2], dtype),
    ])
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    tile_spec = pl.BlockSpec((T, m[1]), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tiled_rhs_kernel, T, m[0], m[1], n_tiles, False),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct(m, dtype),
        in_specs=[any_spec] * 6 + [tile_spec,
                                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tile_spec,
        scratch_shapes=[pltpu.VMEM((2, T + 2 * HALO, m[1]), dtype)] * 6
        + [pltpu.SemaphoreType.DMA((2, 6))],
        interpret=interpret,
        compiler_params=_params(),
    )(alpha[0], alpha[1], alpha[2], u[0], u[1], u[2], oty, scal)
    return out


def rhs_tiled_2d_shard(alpha: Tuple[jax.Array, ...],
                       u: Tuple[jax.Array, ...], halos_top, halos_bot,
                       row_off: jax.Array, oty: jax.Array, rho: jax.Array,
                       u_scale: jax.Array,
                       scales: Tuple[jax.Array, ...],
                       interpret: bool = False,
                       tile_rows: int | None = None) -> jax.Array:
    """Shard-local rhs stage (inside shard_map, rows sharded): halos in
    (a0, a1, a2, u0, u1, u2) order."""
    m = tuple(int(v) for v in oty.shape)
    dtype = oty.dtype
    T = tile_rows if tile_rows is not None else _tile_rows(m)
    n_tiles = m[0] // T
    scal = jnp.stack([
        jnp.asarray(rho, dtype),
        (jnp.ones((), dtype) if u_scale is None
         else jnp.asarray(u_scale, dtype)),
        jnp.asarray(scales[0], dtype),
        jnp.asarray(scales[1], dtype),
        jnp.asarray(scales[2], dtype),
    ])
    off = jnp.asarray(row_off, jnp.int32).reshape(1)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    halo_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((T, m[1]), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tiled_rhs_kernel, T, m[0], m[1], n_tiles, True),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct(m, dtype),
        in_specs=[smem_spec] + [halo_spec] * 12 + [any_spec] * 6
        + [tile_spec, smem_spec],
        out_specs=tile_spec,
        scratch_shapes=[pltpu.VMEM((2, T + 2 * HALO, m[1]), dtype)] * 6
        + [pltpu.SemaphoreType.DMA((2, 6)), pltpu.SemaphoreType.DMA((2, 6))],
        interpret=interpret,
        compiler_params=_params(),
    )(off, *halos_top, *halos_bot,
      alpha[0], alpha[1], alpha[2], u[0], u[1], u[2], oty, scal)
    return out


# ---------------------------------------------------------------------------
# Kernel 9: TILED Gram matvec for large 2-D lattices.
#
# (counts + rho D'D) v streamed through row panels — the r0 computation of
# the spectral-correction CG ran as unfused jnp rolls (measured 2.18 ms at
# 4096^2 vs ~0.23 ms of unavoidable traffic).  Same ping-pong halo DMA as
# kernels 7/8; counts needs no halo and rides a plain blocked input.
# ---------------------------------------------------------------------------

def _tiled_gram_kernel(T, m0, m1, n_tiles,
                       v_hbm, counts_ref, scal_ref, out_ref, v_s, sems):
    t = pl.program_id(0)
    dtype = counts_ref.dtype
    rho_smix = scal_ref[0]
    rho_sax1 = scal_ref[1]
    rho_sax0 = scal_ref[2]

    cur = _halo_pingpong(t, n_tiles, T, [v_hbm], [v_s], sems)
    v = v_s[cur]

    H = HALO
    R = T + 2 * H
    g = jax.lax.broadcasted_iota(jnp.int32, (R, m1), 0) + t * T - H
    col = jax.lax.broadcasted_iota(jnp.int32, (R, m1), 1)
    mask0 = jnp.logical_and(g < m0 - 1, g >= 0).astype(dtype)
    mask1 = (col < m1 - 1).astype(dtype)
    valid = (g >= 0).astype(dtype)

    d1 = _fwd1(v, mask1) * valid
    d0 = (_shift_down(v, 0) - v) * mask0
    dm = _fwd1(d0, mask1)
    acc = (rho_sax1 * _adj1(d1) + rho_sax0 * _adj0(d0)
           + rho_smix * _adj0(_adj1(dm)))
    out_ref[:] = counts_ref[:] * v[H:T + H] + acc[H:T + H]


def _tiled_gram_res_kernel(T, m0, m1, n_tiles, sharded, fuse_rhs, *refs):
    """r0 = b - (counts + rho D'D) v on row panels — the gram matvec of
    _tiled_gram_kernel with the spectral-correction CG's initial-residual
    subtraction fused in (saves a separate read-Av/read-b/write-r0 XLA
    pass per ADMM iteration).  sharded: see _tiled_dual_kernel.

    fuse_rhs (r5): b never materializes — the refs carry (oty, dta, dtu)
    instead of b and the kernel forms b = oty + rho (dta + u_scale dtu)
    in VMEM (the adjoint-carry rhs is b's ONLY consumer on this route,
    so fusing it here deletes two full-lattice passes per iteration)."""
    nb = 3 if fuse_rhs else 1
    k = 0
    if sharded:
        off_ref = refs[k]; k += 1
        h_top, h_bot = refs[k:k + 2]; k += 2
        halos = [(h_top, h_bot)]
    else:
        off_ref = None
        halos = None
        hsems = None
    v_hbm, counts_ref = refs[k:k + 2]; k += 2
    b_refs = refs[k:k + nb]; k += nb
    scal_ref = refs[k]; k += 1
    out_ref = refs[k]; k += 1
    v_s = refs[k]; k += 1
    sems = refs[k]; k += 1
    if sharded:
        hsems = refs[k]
    t = pl.program_id(0)
    dtype = counts_ref.dtype
    rho_smix = scal_ref[0]
    rho_sax1 = scal_ref[1]
    rho_sax0 = scal_ref[2]

    cur = _halo_pingpong(t, n_tiles, T, [v_hbm], [v_s], sems, halos=halos,
                         hsems=hsems)
    v = v_s[cur]

    H = HALO
    R = T + 2 * H
    off = off_ref[0] if sharded else 0
    g = jax.lax.broadcasted_iota(jnp.int32, (R, m1), 0) + t * T - H + off
    col = jax.lax.broadcasted_iota(jnp.int32, (R, m1), 1)
    mask0 = jnp.logical_and(g < m0 - 1, g >= 0).astype(dtype)
    mask1 = (col < m1 - 1).astype(dtype)
    valid = (g >= 0).astype(dtype)

    d1 = _fwd1(v, mask1) * valid
    d0 = (_shift_down(v, 0) - v) * mask0
    dm = _fwd1(d0, mask1)
    acc = (rho_sax1 * _adj1(d1) + rho_sax0 * _adj0(d0)
           + rho_smix * _adj0(_adj1(dm)))
    if fuse_rhs:
        oty_ref, dta_ref, dtu_ref = b_refs
        bb = oty_ref[:] + scal_ref[3] * (dta_ref[:]
                                         + scal_ref[4] * dtu_ref[:])
    else:
        bb = b_refs[0][:]
    out_ref[:] = bb - (counts_ref[:] * v[H:T + H] + acc[H:T + H])


def gram_residual_tiled_2d(b: jax.Array | None, v: jax.Array,
                           counts: jax.Array,
                           rho: jax.Array, scales: Tuple[jax.Array, ...],
                           rhs_parts=None,
                           interpret: bool = False,
                           tile_rows: int | None = None) -> jax.Array:
    """r0 = b - (counts + rho D'D) v, one streamed pass.

    rhs_parts = (oty, dta, u_scale, dtu): fuse the adjoint-carry rhs
    b = oty + rho (dta + u_scale dtu) into the kernel — b is ignored
    (may be None) and never materializes in HBM."""
    m = tuple(int(s) for s in v.shape)
    dtype = v.dtype
    T = tile_rows if tile_rows is not None else _tile_rows(m)
    n_tiles = m[0] // T
    rho = jnp.asarray(rho, dtype)
    scal_list = [
        rho * jnp.asarray(scales[0], dtype) ** 2,
        rho * jnp.asarray(scales[1], dtype) ** 2,
        rho * jnp.asarray(scales[2], dtype) ** 2,
    ]
    fuse = rhs_parts is not None
    if fuse:
        oty, dta, uscale, dtu = rhs_parts
        scal_list += [rho, jnp.asarray(uscale, dtype)]
        b_ins = (oty, dta, dtu)
    else:
        b_ins = (b,)
    scal = jnp.stack(scal_list)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    tile_spec = pl.BlockSpec((T, m[1]), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tiled_gram_res_kernel, T, m[0], m[1], n_tiles,
                          False, fuse),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct(m, dtype),
        in_specs=[any_spec, tile_spec] + [tile_spec] * len(b_ins)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tile_spec,
        scratch_shapes=[pltpu.VMEM((2, T + 2 * HALO, m[1]), dtype)]
        + [pltpu.SemaphoreType.DMA((2, 1))],
        interpret=interpret,
        compiler_params=_params(),
    )(v, counts, *b_ins, scal)
    return out


def gram_residual_tiled_2d_shard(b: jax.Array | None, v: jax.Array,
                                 halo_top: jax.Array, halo_bot: jax.Array,
                                 row_off: jax.Array, m0_global: int,
                                 counts: jax.Array, rho: jax.Array,
                                 scales: Tuple[jax.Array, ...],
                                 rhs_parts=None,
                                 interpret: bool = False,
                                 tile_rows: int | None = None) -> jax.Array:
    """Shard-local r0 = b - (counts + rho D'D) v (inside shard_map, rows
    sharded); halo_top/halo_bot are v's neighbor boundary slabs.
    rhs_parts: see gram_residual_tiled_2d (all parts row-sharded)."""
    m = tuple(int(s) for s in v.shape)
    dtype = v.dtype
    T = tile_rows if tile_rows is not None else _tile_rows(m)
    n_tiles = m[0] // T
    rho = jnp.asarray(rho, dtype)
    scal_list = [
        rho * jnp.asarray(scales[0], dtype) ** 2,
        rho * jnp.asarray(scales[1], dtype) ** 2,
        rho * jnp.asarray(scales[2], dtype) ** 2,
    ]
    fuse = rhs_parts is not None
    if fuse:
        oty, dta, uscale, dtu = rhs_parts
        scal_list += [rho, jnp.asarray(uscale, dtype)]
        b_ins = (oty, dta, dtu)
    else:
        b_ins = (b,)
    scal = jnp.stack(scal_list)
    off = jnp.asarray(row_off, jnp.int32).reshape(1)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    halo_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((T, m[1]), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tiled_gram_res_kernel, T, int(m0_global), m[1],
                          n_tiles, True, fuse),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct(m, dtype),
        in_specs=[smem_spec, halo_spec, halo_spec, any_spec, tile_spec]
        + [tile_spec] * len(b_ins) + [smem_spec],
        out_specs=tile_spec,
        scratch_shapes=[pltpu.VMEM((2, T + 2 * HALO, m[1]), dtype)]
        + [pltpu.SemaphoreType.DMA((2, 1)), pltpu.SemaphoreType.DMA((2, 1))],
        interpret=interpret,
        compiler_params=_params(),
    )(off, halo_top, halo_bot, v, counts, *b_ins, scal)
    return out


def gram_matvec_tiled_2d(v: jax.Array, counts: jax.Array, rho: jax.Array,
                         scales: Tuple[jax.Array, ...],
                         interpret: bool = False,
                         tile_rows: int | None = None) -> jax.Array:
    """Row-panel-streamed (counts + rho D'D) v (same contract as
    gram_matvec_2d minus the CG dot, which the spectral path never
    needs)."""
    m = tuple(int(s) for s in v.shape)
    dtype = v.dtype
    T = tile_rows if tile_rows is not None else _tile_rows(m)
    n_tiles = m[0] // T
    rho = jnp.asarray(rho, dtype)
    scal = jnp.stack([
        rho * jnp.asarray(scales[0], dtype) ** 2,
        rho * jnp.asarray(scales[1], dtype) ** 2,
        rho * jnp.asarray(scales[2], dtype) ** 2,
    ])
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    tile_spec = pl.BlockSpec((T, m[1]), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tiled_gram_kernel, T, m[0], m[1], n_tiles),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct(m, dtype),
        in_specs=[any_spec, tile_spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tile_spec,
        scratch_shapes=[pltpu.VMEM((2, T + 2 * HALO, m[1]), dtype)]
        + [pltpu.SemaphoreType.DMA((2, 1))],
        interpret=interpret,
        compiler_params=_params(),
    )(v, counts, scal)
    return out


# ---------------------------------------------------------------------------
# Kernels 10/11: TILED 3-D dual stage + Gram residual (flattened rows).
#
# p = 3 has 2^3 - 1 = 7 difference blocks and no whole-lattice kernels, so
# through round 3 the dual stage ran as ~10 ms of separate jnp stencil,
# elementwise and reduction passes at 256^3 (the jnp rhs adjoint measured
# near-optimal and KEEPS running in XLA — only the stages XLA cannot fuse
# get kernels).  Design: view the (m0, m1, m2) lattice as a 2-D
# (m0*m1, m2) row-matrix — the axis-2 stencil is a lane shift, axis 1 a
# 1-row shift, axis 0 an m1-row shift — and stream row panels with an
# (m1 + 8)-row halo through the same ping-pong DMA machinery as kernels
# 7-9.  Row starts stay 8-sublane-aligned because T and m1 + 8 are
# multiples of 8.  Chained shifts wrap across slab boundaries exactly
# onto positions the combined edge mask zeroes (the padded-block
# convention, ops/diff.py::apply_block).
# ---------------------------------------------------------------------------


def _row_shift_down(x, k):
    """out[r] = x[r + k] (circular in the panel)."""
    return pltpu.roll(x, x.shape[0] - k, 0)


def _row_shift_up(x, k):
    """out[r] = x[r - k] (circular in the panel)."""
    return pltpu.roll(x, k, 0)


def _fchain3(x, b, m1, masks):
    """Forward-difference chain for binary b on a flat panel, one
    combined edge mask (apply_block semantics)."""
    out = x
    if b[0]:
        out = _row_shift_down(out, m1) - out
    if b[1]:
        out = _row_shift_down(out, 1) - out
    if b[2]:
        out = _shift_down(out, 1) - out
    mask = None
    for bj, mk in zip(b, masks):
        if bj:
            mask = mk if mask is None else mask * mk
    return out if mask is None else out * mask


def _achain3(w, b, m1):
    """Adjoint chain (shift_up - id per differenced axis); exact given
    the edge-zero block convention."""
    out = w
    if b[0]:
        out = _row_shift_up(out, m1) - out
    if b[1]:
        out = _row_shift_up(out, 1) - out
    if b[2]:
        out = _shift_up(out, 1) - out
    return out


def _masks3(R, m, t, T, H, dtype):
    """(mask_ax0, mask_ax1, mask_ax2, valid) for an extended flat panel:
    locals 0..R-1 map to flat rows g = t*T - H + l; i0 = g // m1,
    i1 = g mod m1."""
    m0, m1, m2 = m
    g = jax.lax.broadcasted_iota(jnp.int32, (R, m2), 0) + t * T - H
    col = jax.lax.broadcasted_iota(jnp.int32, (R, m2), 1)
    i1 = jax.lax.rem(g, m1)   # g >= -H > -m1 - 8; negative rows are
    # zeroed by valid anyway, so rem's sign convention is irrelevant there
    valid = (g >= 0).astype(dtype)
    mask0 = jnp.logical_and(g < (m0 - 1) * m1, g >= 0).astype(dtype)
    mask1 = jnp.logical_and(i1 < m1 - 1, g >= 0).astype(dtype)
    mask2 = (col < m2 - 1).astype(dtype)
    return mask0, mask1, mask2, valid


# p = 3 full C++ block set in fd_binaries(3, True) order.
_BINARIES3 = ((1, 1, 1), (0, 0, 1), (0, 1, 0), (0, 1, 1),
              (1, 0, 0), (1, 0, 1), (1, 1, 0))

# Minimum knot count for the 3-D tiled kernels (see tiled3_supported;
# tests lower this to exercise the path on tiny lattices).
TILED3_MIN_KNOTS = 1 << 22


def _wmasks3(R, m, true_m, t, T, H, dtype):
    """Per-block TRUE-problem row masks for the exact padded 3-D route
    (order _BINARIES3), or None when true_m is None.  Flat-row panel
    coordinates: global flat row g = t*T - H + local, i0 = g // m1,
    i1 = g mod m1 (negative-g rows have z == 0, so their threshold value
    is irrelevant and div/rem sign conventions do not matter there)."""
    if true_m is None:
        return None
    m0, m1, m2 = m
    t0, t1, t2 = (int(v) for v in true_m)
    g = jax.lax.broadcasted_iota(jnp.int32, (R, m2), 0) + t * T - H
    col = jax.lax.broadcasted_iota(jnp.int32, (R, m2), 1)
    i0 = jax.lax.div(g, m1)
    i1 = jax.lax.rem(g, m1)
    pA = ((i0 < t0 - 1).astype(dtype), (i1 < t1 - 1).astype(dtype),
          (col < t2 - 1).astype(dtype))
    pB = ((i0 < t0).astype(dtype), (i1 < t1).astype(dtype),
          (col < t2).astype(dtype))
    out = []
    for b in _BINARIES3:
        w = None
        for j, bj in enumerate(b):
            pj = pA[j] if bj else pB[j]
            w = pj if w is None else w * pj
        out.append(w)
    return out


def _tiled3_dual_kernel(T, m, n_tiles, H, true_m, want_adjoints,
                        want_alpha, *refs):
    """Fused p=3 dual stage on flat row panels: 7 forward-difference
    blocks, prox, dual ascent, and all five Boyd reductions in ONE pass
    (contract of dual_update_2d, seven blocks).

    want_adjoints (r5): additionally WRITE the adjoint accumulations
    dta = D'alpha_new and dtu = D'u_new (already computed on the panels
    for the Boyd stats) as lattice outputs — the next iteration's rhs
    b = oty + rho (dta + u_scale dtu) then collapses to a 4-array fused
    elementwise pass instead of a full 15-read adjoint-stencil kernel.

    want_alpha=False (r5): skip the 7 alpha HBM outputs — dead stores on
    the adjoint-carrying ADMM route (7/16 of the stage's write traffic);
    admm_solve refreshes alpha once after the loop."""
    k = 0
    theta_hbm = refs[k]; k += 1
    u_hbm = refs[k:k + 7]; k += 7
    scal_ref = refs[k]; k += 1
    a_refs = None
    if want_alpha:
        a_refs = refs[k:k + 7]; k += 7
    un_refs = refs[k:k + 7]; k += 7
    if want_adjoints:
        dta_ref, dtu_ref = refs[k:k + 2]; k += 2
    stats_ref = refs[k]; k += 1
    theta_s = refs[k]; k += 1
    u_s = refs[k:k + 7]; k += 7
    sems = refs[k]
    t = pl.program_id(0)
    m0, m1, m2 = m
    dtype = theta_s.dtype
    kappa = scal_ref[0]
    uscale = scal_ref[1]
    scales = [scal_ref[2 + k] for k in range(7)]

    ins = [theta_hbm] + list(u_hbm)
    scr = [theta_s] + list(u_s)
    cur = _halo_pingpong(t, n_tiles, T, ins, scr, sems, H=H)

    theta = theta_s[cur]
    R = T + 2 * H
    masks = _masks3(R, m, t, T, H, dtype)
    mask012, valid = masks[:3], masks[3]
    wms = _wmasks3(R, m, true_m, t, T, H, dtype)

    def soft(z, k):
        return jnp.sign(z) * jnp.maximum(jnp.abs(z) - k, 0.0)

    sl = slice(H, T + H)
    p_sq = jnp.zeros((), dtype)
    d_sq = jnp.zeros((), dtype)
    a_sq = jnp.zeros((), dtype)
    dtr = None
    dtu = None
    dta = None
    for k, b in enumerate(_BINARIES3):
        d_k = scales[k] * _fchain3(theta, b, m1, mask012)
        u_k = uscale * u_s[k][cur] * valid
        kap_k = kappa if wms is None else kappa * wms[k]
        a_k = soft(d_k - u_k, kap_k)
        r_k = a_k - d_k
        un_k = u_k + r_k
        if want_alpha:
            a_refs[k][:] = a_k[sl]
        un_refs[k][:] = un_k[sl]
        sd_k = d_k if wms is None else d_k * wms[k]
        sa_k = a_k if wms is None else a_k * wms[k]
        p_sq += jnp.sum(r_k[sl] ** 2)
        d_sq += jnp.sum(sd_k[sl] ** 2)
        a_sq += jnp.sum(sa_k[sl] ** 2)
        tr = scales[k] * _achain3(r_k, b, m1)
        tu = scales[k] * _achain3(un_k, b, m1)
        dtr = tr if dtr is None else dtr + tr
        dtu = tu if dtu is None else dtu + tu
        if want_adjoints:
            ta = scales[k] * _achain3(a_k, b, m1)
            dta = ta if dta is None else dta + ta

    if want_adjoints:
        dta_ref[:] = dta[sl]
        dtu_ref[:] = dtu[sl]
    stats_ref[t, 0] = p_sq
    stats_ref[t, 1] = d_sq
    stats_ref[t, 2] = a_sq
    stats_ref[t, 3] = jnp.sum(dtr[sl] ** 2)
    stats_ref[t, 4] = jnp.sum(dtu[sl] ** 2)


def _tile_rows_3d(m: Tuple[int, int, int], target_bytes: int = 1 << 20
                  ) -> int:
    """Flat-row panel height for the 3-D kernels: ~target_bytes output
    panels (default 1 MB), multiple of 8, divides m0*m1, and at least
    the halo height m1 + 8 (so interior tiles' DMA starts stay in
    range).  The adjoint-only rhs kernel passes 2 MB: its top-only halo
    frees the VMEM, and the T sweep at 256^3 measured 3.86/3.26/2.91 ms
    at T = 512/1024/2048 (halo amortization keeps paying there, unlike
    the 2-D kernels where larger panels LOSE)."""
    m0, m1, m2 = int(m[0]), int(m[1]), int(m[2])
    rows = m0 * m1
    target = max(8, min(4096, (target_bytes // (m2 * 4)) // 8 * 8))
    H = m1 + 8
    # Loop start rounded DOWN to a multiple of 8: rows // 2 need not be
    # 8-aligned, and a non-8-aligned T would violate the pl.multiple_of
    # DMA-start contract in _halo_copies (ADVICE r4 — latent under the
    # shipped gate, a miscompile hazard under a lowered one).
    for t in range(min(target, rows // 2 // 8 * 8), 7, -8):
        # t >= H keeps interior DMA starts nonnegative; rows >= t + 2H
        # keeps the interior-tile slice constructible (it is traced even
        # when n_tiles == 2 leaves no interior tiles).
        if rows % t == 0 and t >= H and rows >= t + 2 * H:
            return t
    return 0   # no usable panel height


def tiled3_supported(m: Tuple[int, ...], binaries) -> bool:
    """p == 3, full C++ block set, lane-aligned last axis, 8-aligned
    middle axis, a flat-row panel height with >= 2 tiles, and at least
    2^22 knots — below that XLA's own fusion wins (measured on one v5e:
    256^3 37.2 -> 64.0 iters/s with the kernels, 128^3 711 -> 620, i.e.
    a REGRESSION at 2M knots where the panels are cache-resident)."""
    if len(m) != 3 or len(binaries) != 7:
        return False
    if tuple(binaries) != _BINARIES3:
        return False
    m0, m1, m2 = (int(v) for v in m)
    if m2 % 128 or m1 % 8:
        return False
    if m0 * m1 * m2 < TILED3_MIN_KNOTS:
        return False
    T = _tile_rows_3d(m)
    return T > 0 and (m0 * m1) // T >= 2


def dual_update_tiled_3d(theta: jax.Array, u: Tuple[jax.Array, ...],
                         kappa: jax.Array, scales: Tuple[jax.Array, ...],
                         u_scale: jax.Array | None = None,
                         true_m: Tuple[int, int, int] | None = None,
                         want_adjoints: bool = False,
                         want_alpha: bool = True,
                         interpret: bool = False,
                         tile_rows: int | None = None):
    """Row-panel-streamed p=3 dual stage (contract of dual_update_2d:
    returns (alpha_blocks, u_blocks, stats[5]); with want_adjoints,
    (alpha_blocks, u_blocks, stats[5], dta, dtu) — see
    _tiled3_dual_kernel).  want_alpha=False: the alpha slot is None
    (dead-store elision on the adjoint-carrying ADMM route)."""
    m = tuple(int(v) for v in theta.shape)
    m0, m1, m2 = m
    dtype = theta.dtype
    T = tile_rows if tile_rows is not None else _tile_rows_3d(m)
    H = m1 + 8
    rows = m0 * m1
    n_tiles = rows // T
    scal = jnp.stack([
        jnp.asarray(kappa, dtype),
        (jnp.ones((), dtype) if u_scale is None
         else jnp.asarray(u_scale, dtype)),
    ] + [jnp.asarray(s, dtype) for s in scales])

    flat = lambda x: x.reshape(rows, m2)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    tile_spec = pl.BlockSpec((T, m2), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    smem_stat = pl.BlockSpec(memory_space=pltpu.SMEM)
    shp = jax.ShapeDtypeStruct((rows, m2), dtype)
    n_a = 7 if want_alpha else 0
    n_out = n_a + 7 + (2 if want_adjoints else 0)
    outs = pl.pallas_call(
        functools.partial(_tiled3_dual_kernel, T, m, n_tiles, H, true_m,
                          want_adjoints, want_alpha),
        grid=(n_tiles,),
        out_shape=tuple([shp] * n_out) + (
            jax.ShapeDtypeStruct((n_tiles, 5), dtype),),
        in_specs=[any_spec] * 8 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple([tile_spec] * n_out) + (smem_stat,),
        scratch_shapes=[pltpu.VMEM((2, T + 2 * H, m2), dtype)] * 8
        + [pltpu.SemaphoreType.DMA((2, 8))],
        interpret=interpret,
        compiler_params=_params(),
    )(flat(theta), *[flat(w) for w in u], scal)
    unflat = lambda x: x.reshape(m)
    alpha = (tuple(unflat(o) for o in outs[0:7]) if want_alpha else None)
    un = tuple(unflat(o) for o in outs[n_a:n_a + 7])
    stats = jnp.sum(outs[n_out], axis=0)
    if want_adjoints:
        return (alpha, un, stats,
                unflat(outs[n_a + 7]), unflat(outs[n_a + 8]))
    return alpha, un, stats


def _tiled3_rhs_kernel(T, m, n_tiles, H,
                       a0_h, a1_h, a2_h, a3_h, a4_h, a5_h, a6_h,
                       u0_h, u1_h, u2_h, u3_h, u4_h, u5_h, u6_h,
                       oty_ref, scal_ref, b_ref,
                       a0_s, a1_s, a2_s, a3_s, a4_s, a5_s, a6_s,
                       u0_s, u1_s, u2_s, u3_s, u4_s, u5_s, u6_s, sems):
    """b = oty + rho D'(alpha + u_scale u) on flat row panels (p = 3,
    7 blocks).  r4 kept this stage in jnp on the claim it was
    near-optimal; the r5 dependency-chained slope probe measured it at
    5.3 ms vs the 1.3 ms model bound at 256^3 — the single largest
    stage — so it gets the same streaming treatment as the dual
    (kernel 10)."""
    t = pl.program_id(0)
    m0, m1, m2 = m
    dtype = oty_ref.dtype
    rho = scal_ref[0]
    uscale = scal_ref[1]
    scales = [scal_ref[2 + k] for k in range(7)]

    ins = [a0_h, a1_h, a2_h, a3_h, a4_h, a5_h, a6_h,
           u0_h, u1_h, u2_h, u3_h, u4_h, u5_h, u6_h]
    scr = [a0_s, a1_s, a2_s, a3_s, a4_s, a5_s, a6_s,
           u0_s, u1_s, u2_s, u3_s, u4_s, u5_s, u6_s]
    # Adjoint-only stage: up-shifts never read below the panel, so the
    # bottom halo is 0 — saves (m1+8)/T read amplification per input.
    cur = _halo_pingpong(t, n_tiles, T, ins, scr, sems, H=H, H_bot=0)

    R = T + H
    g = jax.lax.broadcasted_iota(jnp.int32, (R, m2), 0) + t * T - H
    valid = (g >= 0).astype(dtype)

    sl = slice(H, T + H)
    acc = None
    for k, b in enumerate(_BINARIES3):
        au = (scr[k][cur] + uscale * scr[7 + k][cur]) * valid
        term = scales[k] * _achain3(au, b, m1)
        acc = term if acc is None else acc + term
    b_ref[:] = oty_ref[:] + rho * acc[sl]


def rhs_tiled_3d(alpha: Tuple[jax.Array, ...], u: Tuple[jax.Array, ...],
                 oty: jax.Array, rho: jax.Array, u_scale: jax.Array,
                 scales: Tuple[jax.Array, ...],
                 interpret: bool = False,
                 tile_rows: int | None = None) -> jax.Array:
    """Row-panel-streamed p=3 rhs (contract of rhs_2d, seven blocks)."""
    m = tuple(int(v) for v in oty.shape)
    m0, m1, m2 = m
    dtype = oty.dtype
    T = (tile_rows if tile_rows is not None
         else (_tile_rows_3d(m, target_bytes=2 << 20)
               or _tile_rows_3d(m)))   # gate guarantees the 1 MB divisor
    H = m1 + 8
    rows = m0 * m1
    n_tiles = rows // T
    scal = jnp.stack([
        jnp.asarray(rho, dtype),
        (jnp.ones((), dtype) if u_scale is None
         else jnp.asarray(u_scale, dtype)),
    ] + [jnp.asarray(s, dtype) for s in scales])
    flat = lambda x: x.reshape(rows, m2)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    tile_spec = pl.BlockSpec((T, m2), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tiled3_rhs_kernel, T, m, n_tiles, H),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((rows, m2), dtype),
        in_specs=[any_spec] * 14 + [tile_spec,
                                    pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tile_spec,
        scratch_shapes=[pltpu.VMEM((2, T + H, m2), dtype)] * 14
        + [pltpu.SemaphoreType.DMA((2, 14))],
        interpret=interpret,
        compiler_params=_params(),
    )(*[flat(a) for a in alpha], *[flat(w) for w in u], flat(oty), scal)
    return out.reshape(m)


def _tiled3_gram_res_kernel(T, m, n_tiles, H, fuse_rhs, *refs):
    """r0 = b - (counts + rho D'D) v on flat row panels (p = 3).
    fuse_rhs: see _tiled_gram_res_kernel."""
    nb = 3 if fuse_rhs else 1
    v_hbm, counts_ref = refs[0:2]
    b_refs = refs[2:2 + nb]
    scal_ref, out_ref, v_s, sems = refs[2 + nb:6 + nb]
    t = pl.program_id(0)
    m0, m1, m2 = m
    dtype = counts_ref.dtype
    scales_sq = [scal_ref[k] for k in range(7)]

    cur = _halo_pingpong(t, n_tiles, T, [v_hbm], [v_s], sems, H=H)
    v = v_s[cur]
    R = T + 2 * H
    masks = _masks3(R, m, t, T, H, dtype)
    mask012 = masks[:3]

    sl = slice(H, T + H)
    acc = None
    for k, b in enumerate(_BINARIES3):
        term = scales_sq[k] * _achain3(_fchain3(v, b, m1, mask012), b, m1)
        acc = term if acc is None else acc + term
    if fuse_rhs:
        oty_ref, dta_ref, dtu_ref = b_refs
        bb = oty_ref[:] + scal_ref[7] * (dta_ref[:]
                                         + scal_ref[8] * dtu_ref[:])
    else:
        bb = b_refs[0][:]
    out_ref[:] = bb - (counts_ref[:] * v[sl] + acc[sl])


def gram_residual_tiled_3d(b: jax.Array | None, v: jax.Array,
                           counts: jax.Array,
                           rho: jax.Array, scales: Tuple[jax.Array, ...],
                           rhs_parts=None,
                           interpret: bool = False,
                           tile_rows: int | None = None) -> jax.Array:
    """r0 = b - (counts + rho D'D) v, one streamed pass (p = 3).
    rhs_parts = (oty, dta, u_scale, dtu): fuse b = oty + rho (dta +
    u_scale dtu) in-kernel; b is ignored and never materializes."""
    m = tuple(int(s) for s in v.shape)
    m0, m1, m2 = m
    dtype = v.dtype
    T = tile_rows if tile_rows is not None else _tile_rows_3d(m)
    H = m1 + 8
    rows = m0 * m1
    n_tiles = rows // T
    rho = jnp.asarray(rho, dtype)
    scal_list = [rho * jnp.asarray(s, dtype) ** 2 for s in scales]
    flat = lambda x: x.reshape(rows, m2)
    fuse = rhs_parts is not None
    if fuse:
        oty, dta, uscale, dtu = rhs_parts
        scal_list += [rho, jnp.asarray(uscale, dtype)]
        b_ins = (flat(oty), flat(dta), flat(dtu))
    else:
        b_ins = (flat(b),)
    scal = jnp.stack(scal_list)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    tile_spec = pl.BlockSpec((T, m2), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tiled3_gram_res_kernel, T, m, n_tiles, H, fuse),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((rows, m2), dtype),
        in_specs=[any_spec, tile_spec] + [tile_spec] * len(b_ins)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tile_spec,
        scratch_shapes=[pltpu.VMEM((2, T + 2 * H, m2), dtype)]
        + [pltpu.SemaphoreType.DMA((2, 1))],
        interpret=interpret,
        compiler_params=_params(),
    )(flat(v), flat(counts), *b_ins, scal)
    return out.reshape(m)
