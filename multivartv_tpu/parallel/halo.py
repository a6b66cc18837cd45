"""Explicit lattice-sharded ADMM: shard_map + ppermute halo exchange.

SCOPE (honest): the PRODUCT sharded path is mvtv_sharded
(parallel/fit.py), which relies on the XLA SPMD partitioner inserting
every collective from NamedSharding annotations — including the
distributed-DCT preconditioner.  This module is a single-lambda,
p == 2 solver with every collective written out BY HAND, kept for two
reasons: (a) collective-level validation — tests/test_halo.py pins the
manual pattern's numerics against the auto-partitioned solver, so a
regression in either is caught; (b) a template for manual ICI
scheduling if SPMD-auto ever proves suboptimal on real multi-chip
topologies.  It is reachable through sharded_admm_solve, not through
the mvtv product API.

The collective pattern it spells out:

  * forward/adjoint differences along sharded axes exchange one boundary
    slab with the neighbor via jax.lax.ppermute (ring, one hop),
  * every norm / CG dot is a local partial + jax.lax.psum over the mesh,
  * the x-update is Jacobi-preconditioned CG (fully local preconditioner;
    the DCT preconditioner would need a distributed transform).

The padded-block convention (ops/diff.py) is what makes the adjoint
trivially correct here: adjoints are *circular* shifts globally, and the
wrapped slab is all zeros, so a plain ring ppermute is exact.

Scope: p == 2 lattices, the full C++ block set, mesh axes ("sx", "sy")
— the flagship large-lattice layout (BASELINE config 5).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multivartv_tpu.config import SolverConfig


# ---------------------------------------------------------------------------
# Distributed shift / diff primitives (inside shard_map)
# ---------------------------------------------------------------------------

def _ring_perm(n: int, up: bool):
    """up=True: receive from the next device (send to previous)."""
    if up:
        return [(i, (i - 1) % n) for i in range(n)]
    return [(i, (i + 1) % n) for i in range(n)]


def dist_shift_down(x: jax.Array, axis: int, mesh_axis: str, n_shards: int):
    """Global circular out[i] = x[i+1] on an axis sharded over mesh_axis."""
    rolled = jnp.roll(x, -1, axis)
    if n_shards == 1:
        return rolled
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    recv = jax.lax.ppermute(first, mesh_axis, _ring_perm(n_shards, up=True))
    return jax.lax.dynamic_update_slice_in_dim(
        rolled, recv, x.shape[axis] - 1, axis=axis)


def dist_shift_up(x: jax.Array, axis: int, mesh_axis: str, n_shards: int):
    """Global circular out[i] = x[i-1]."""
    rolled = jnp.roll(x, 1, axis)
    if n_shards == 1:
        return rolled
    last = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    recv = jax.lax.ppermute(last, mesh_axis, _ring_perm(n_shards, up=False))
    return jax.lax.dynamic_update_slice_in_dim(rolled, recv, 0, axis=axis)


def _global_edge_mask(local_shape, axis: int, mesh_axis: str, n_shards: int,
                      dtype):
    """1 everywhere except the *global* last index along axis."""
    li = jax.lax.broadcasted_iota(jnp.int32, local_shape, axis)
    if n_shards == 1:
        return (li < local_shape[axis] - 1).astype(dtype)
    shard = jax.lax.axis_index(mesh_axis)
    is_last_shard = shard == n_shards - 1
    local_edge = (li < local_shape[axis] - 1).astype(dtype)
    ones = jnp.ones(local_shape, dtype)
    return jnp.where(is_last_shard, local_edge, ones)


class _DistStencil2D:
    """Forward/adjoint D blocks for a (sx, sy)-sharded 2-D lattice."""

    def __init__(self, scales, mesh_axes=("sx", "sy"), shards=(1, 1)):
        self.s_mix, self.s_ax1, self.s_ax0 = scales
        self.mesh_axes = mesh_axes
        self.shards = shards

    def _fwd(self, v, axis):
        ma, n = self.mesh_axes[axis], self.shards[axis]
        mask = _global_edge_mask(v.shape, axis, ma, n, v.dtype)
        return (dist_shift_down(v, axis, ma, n) - v) * mask

    def _adj(self, w, axis):
        ma, n = self.mesh_axes[axis], self.shards[axis]
        return dist_shift_up(w, axis, ma, n) - w

    def apply_D(self, theta):
        d0 = self._fwd(theta, 0)
        return (
            self.s_mix * self._fwd(d0, 1),
            self.s_ax1 * self._fwd(theta, 1),
            self.s_ax0 * d0,
        )

    def apply_Dt(self, blocks) -> jax.Array:
        b0, b1, b2 = blocks
        return (
            self.s_mix * self._adj(self._adj(b0, 1), 0)
            + self.s_ax1 * self._adj(b1, 1)
            + self.s_ax0 * self._adj(b2, 0)
        )

    def apply_gram(self, v) -> jax.Array:
        return self.apply_Dt(self.apply_D(v))

    def psum(self, x):
        # Reduce over every mesh axis (size-1 axes included — the psum is
        # a no-op there but keeps the shard_map varying-axes types
        # consistent across while_loop carries).
        return jax.lax.psum(x, self.mesh_axes)


class ShardedADMMResult(NamedTuple):
    theta: jax.Array
    rho: jax.Array
    iters: jax.Array


def sharded_admm_solve(mesh: Mesh, counts, oty, gram_diag, ybar, scales,
                       lam, rho0, cfg: SolverConfig,
                       mesh_axes=("sx", "sy")) -> ShardedADMMResult:
    """Full-semantics ADMM (Boyd stopping + adaptive rho) on a 2-D lattice
    sharded over mesh_axes, all collectives explicit.

    counts/oty/gram_diag: global lattice arrays (sharded or replicated —
    shard_map partitions them); returns the global theta (same sharding).
    """
    shards = tuple(mesh.shape[a] for a in mesh_axes)
    ntheta = counts.size
    dtype = oty.dtype
    m = counts.shape

    rows_d = float((m[0] - 1) * (m[1] - 1) + m[0] * (m[1] - 1)
                   + (m[0] - 1) * m[1])
    sqrt_ntheta = math.sqrt(ntheta)
    sqrt_rowsd = math.sqrt(rows_d)

    spec = P(*mesh_axes)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec, P(), P(), P()),
        out_specs=(spec, P(), P()),
    )
    def run(counts_l, oty_l, gdiag_l, ybar_s, lam_s, rho_s):
        st = _DistStencil2D(scales, mesh_axes, shards)
        tol = jnp.asarray(cfg.tol, dtype)

        inv_diag_of = lambda rho: 1.0 / (counts_l + rho * gdiag_l + 1e-30)

        def pcg(b, x0, rho, n_steps):
            def matvec(v):
                return counts_l * v + rho * st.apply_gram(v)
            inv_diag = inv_diag_of(rho)
            r = b - matvec(x0)
            z = inv_diag * r
            rz = st.psum(jnp.sum(r * z))
            p_, x = z, x0
            eps = jnp.asarray(1e-30, dtype)
            def step(_, carry):
                x, r, z, p_, rz = carry
                ap = matvec(p_)
                pap = st.psum(jnp.sum(p_ * ap))
                a = rz / jnp.maximum(pap, eps)
                x = x + a * p_
                r = r - a * ap
                z = inv_diag * r
                rz_new = st.psum(jnp.sum(r * z))
                beta = rz_new / jnp.maximum(rz, eps)
                return (x, r, z, z + beta * p_, rz_new)
            x, *_ = jax.lax.fori_loop(0, n_steps, step, (x, r, z, p_, rz))
            return x

        n_cg = cfg.cg_fixed_iters if cfg.cg_fixed_iters is not None else 10

        # zeros_like(counts_l) keeps the shard_map varying-axes type of the
        # carry consistent (a jnp.full literal would be device-invariant).
        theta0 = jnp.zeros_like(counts_l) + ybar_s
        alpha0 = st.apply_D(theta0)
        u0 = tuple(jnp.zeros_like(a) for a in alpha0)
        one = jnp.ones((), dtype)
        state0 = (theta0, alpha0, u0, jnp.asarray(rho_s, dtype),
                  jnp.zeros((), jnp.int32), one, one, one * 0, one * 0)

        def cond(s):
            (_, _, _, _, counter, pn, dn, ep, ed) = s
            return jnp.logical_and(
                jnp.logical_or(dn > ed, pn > ep), counter < cfg.max_iters)

        def body(s):
            theta, alpha, u, rho, counter, _, _, _, _ = s
            au = tuple(a + w for a, w in zip(alpha, u))
            b = oty_l + rho * st.apply_Dt(au)
            theta = pcg(b, theta, rho, n_cg)
            d_theta = st.apply_D(theta)
            kappa = lam_s / rho
            alpha = tuple(
                jnp.sign(z) * jnp.maximum(jnp.abs(z) - kappa, 0.0)
                for z in (dt - w for dt, w in zip(d_theta, u))
            )
            res = tuple(a - dt for a, dt in zip(alpha, d_theta))
            u = tuple(w + r for w, r in zip(u, res))
            dtr = st.apply_Dt(res)
            dtu = st.apply_Dt(u)
            pn = jnp.sqrt(st.psum(sum(jnp.sum(r * r) for r in res)))
            dn = rho * jnp.sqrt(st.psum(jnp.sum(dtr * dtr)))
            dtu_n = jnp.sqrt(st.psum(jnp.sum(dtu * dtu)))
            dt_n = jnp.sqrt(st.psum(sum(jnp.sum(d * d) for d in d_theta)))
            al_n = jnp.sqrt(st.psum(sum(jnp.sum(a * a) for a in alpha)))
            ed = tol * (sqrt_ntheta + dtu_n)
            ep = tol * (sqrt_rowsd + jnp.maximum(dt_n, al_n))
            if cfg.adapt_rho:
                tau = jnp.asarray(cfg.adapt_tau, dtype)
                band = jnp.asarray(cfg.adapt_band, dtype)
                grow = pn > band * dn
                shrink = dn > band * pn
                f = jnp.where(grow, tau, jnp.where(shrink, 1.0 / tau, 1.0))
                rho = rho * f
                u = tuple(w / f for w in u)
            return (theta, alpha, u, rho, counter + 1, pn, dn, ep, ed)

        theta, _, _, rho, counter, *_ = jax.lax.while_loop(cond, body, state0)
        return theta, rho, counter

    theta, rho, iters = run(
        counts, oty, gram_diag,
        jnp.asarray(ybar, dtype), jnp.asarray(lam, dtype),
        jnp.asarray(rho0, dtype))
    return ShardedADMMResult(theta=theta, rho=rho, iters=iters)
