"""Matrix-free preconditioned conjugate gradient.

The reference's only iterative solver is a CGLS-flavored CG used to
estimate lambda_max (cg, rcpp-code .../utils.cpp:306-340).  Here PCG is the
workhorse of the ADMM x-update: the operator is the fused lattice stencil
c * theta + rho * D'D theta, and the preconditioner is either the exact DCT
solve of the mean-count system or the Jacobi diagonal.  Everything is
jnp on lattice-shaped arrays, so it jits, vmaps over batch axes, and runs
under pjit sharding (dot products lower to psum collectives automatically).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    residual_sq: jax.Array


def _poison_if_nonfinite(x: jax.Array, residual_sq: jax.Array) -> jax.Array:
    """NaN/Inf residuals silently *pass* `>`-style loop predicates (NaN
    comparisons are False), which would return a finite-but-meaningless x
    and mask divergence from the ADMM fault guard.  Explicitly poison the
    solution instead so the failure propagates and the solve stops."""
    return jnp.where(jnp.isfinite(residual_sq), x, jnp.full_like(x, jnp.nan))


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.sum(a * b)


def pcg(matvec: Callable[[jax.Array], jax.Array],
        b: jax.Array,
        x0: jax.Array,
        precond: Optional[Callable[[jax.Array], jax.Array]] = None,
        tol: float = 1e-6,
        max_iters: int = 100) -> CGResult:
    """Solve A x = b (A SPD) with preconditioned CG, warm-started at x0.

    Stops when ||r||^2 <= tol^2 * ||b||^2 or at max_iters.  Division guards
    make the fixed-point iteration safe once converged (important under
    vmap, where all batch elements iterate until the slowest converges).
    """
    if precond is None:
        precond = lambda v: v

    eps = jnp.asarray(1e-30, b.dtype)
    b_sq = _dot(b, b)
    stop_sq = (tol * tol) * b_sq

    r0 = b - matvec(x0)
    z0 = precond(r0)
    rz0 = _dot(r0, z0)

    def cond(state):
        x, r, z, p, rz, it = state
        return jnp.logical_and(_dot(r, r) > stop_sq, it < max_iters)

    def body(state):
        x, r, z, p, rz, it = state
        ap = matvec(p)
        denom = _dot(p, ap)
        alpha = rz / jnp.maximum(denom, eps)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.maximum(rz, eps)
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    init = (x0, r0, z0, z0, rz0, jnp.zeros((), jnp.int32))
    x, r, _, _, _, it = jax.lax.while_loop(cond, body, init)
    rsq = _dot(r, r)
    return CGResult(x=_poison_if_nonfinite(x, rsq), iters=it, residual_sq=rsq)


def pcg_fixed(matvec: Callable[[jax.Array], jax.Array],
              b: jax.Array,
              x0: jax.Array,
              precond: Optional[Callable[[jax.Array], jax.Array]] = None,
              n_iters: int = 3) -> CGResult:
    """Exactly n_iters PCG steps, no convergence predicate.

    With the DCT preconditioner a handful of steps reach ~1e-6 relative
    residual; a static step count removes the device-side while-loop
    bookkeeping and the residual-norm round trips, and keeps the x-update
    cost deterministic (ideal for benchmarks and for vmapped batches that
    would otherwise run to the slowest element's count).
    """
    if precond is None:
        precond = lambda v: v
    eps = jnp.asarray(1e-30, b.dtype)
    r = b - matvec(x0)
    z = precond(r)
    p = z
    rz = _dot(r, z)
    x = x0
    for _ in range(n_iters):
        ap = matvec(p)
        alpha = rz / jnp.maximum(_dot(p, ap), eps)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.maximum(rz, eps)
        p = z + beta * p
        rz = rz_new
    rsq = _dot(r, r)
    return CGResult(x=_poison_if_nonfinite(x, rsq),
                    iters=jnp.asarray(n_iters, jnp.int32), residual_sq=rsq)


def pcg_fused(matvec_dot, precond_dot, b: jax.Array, x0: jax.Array,
              n_iters: int = 3) -> CGResult:
    """Fixed-step PCG where the two reductions per step ride along fused
    operators: matvec_dot(p) -> (A p, <p, A p>) (the dot computed inside
    the stencil kernel) and precond_dot(r) -> (M^-1 r, <r, M^-1 r>) (the
    dot computed in the DCT domain where M is diagonal).  No standalone
    full-array reductions remain in the loop.
    """
    eps = jnp.asarray(1e-30, b.dtype)
    ax0, _ = matvec_dot(x0)
    r = b - ax0
    z, rz = precond_dot(r)
    p = z
    x = x0
    for _ in range(n_iters):
        ap, pap = matvec_dot(p)
        alpha = rz / jnp.maximum(pap, eps)
        x = x + alpha * p
        r = r - alpha * ap
        z, rz_new = precond_dot(r)
        beta = rz_new / jnp.maximum(rz, eps)
        p = z + beta * p
        rz = rz_new
    return CGResult(x=_poison_if_nonfinite(x, rz),
                    iters=jnp.asarray(n_iters, jnp.int32), residual_sq=rz)
