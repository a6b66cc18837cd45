"""Device-mesh sharding for lattice-parallel and batch-parallel solves.

The reference is strictly single-process (SURVEY.md section 2a); scaling
here is new capability, designed the idiomatic JAX way:

  * Lattice (spatial/"context") parallelism: theta, counts, oty, and every
    alpha/u block shard over spatial mesh axes.  The solver is pure jnp on
    lattice arrays, so under jit the XLA SPMD partitioner inserts the halo
    exchanges for the shifted-slice difference stencils and psum
    collectives for CG dot products and residual norms automatically.
    (x_solver="jacobi_pcg" keeps the x-update local+psum; the DCT
    preconditioner is all-to-all heavy and is best kept for single-chip or
    replicated lattices.)
  * Batch ("data") parallelism: CV folds and scenario batches (many
    problems / lambdas) shard over a leading batch axis.

An explicit shard_map + ppermute halo-exchange implementation of the same
stencils lives in multivartv_tpu.parallel.halo for full manual control.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multivartv_tpu.solver.problem import Problem


def make_device_mesh(shape: Sequence[int], axis_names: Sequence[str],
                     devices=None) -> Mesh:
    """Build a jax.sharding.Mesh over the given (or all) devices."""
    devices = jax.devices() if devices is None else devices
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {tuple(shape)} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def lattice_sharding(mesh: Mesh, ndim: int,
                     spatial_axes: Sequence[Optional[str]],
                     batch_axis: Optional[str] = None,
                     batched: bool = False) -> NamedSharding:
    """NamedSharding for a lattice array: spatial_axes[j] names the mesh
    axis sharding lattice dim j (None = replicated)."""
    spec = list(spatial_axes[:ndim])
    spec += [None] * (ndim - len(spec))
    if batched:
        spec = [batch_axis] + spec
    return NamedSharding(mesh, P(*spec))


def batch_sharding(mesh: Mesh, batch_axis: Optional[str],
                   extra_dims: int = 0) -> NamedSharding:
    spec = [batch_axis] + [None] * extra_dims
    return NamedSharding(mesh, P(*spec))


def shard_problem(problem: Problem, mesh: Mesh,
                  spatial_axes: Sequence[Optional[str]],
                  batch_axis: Optional[str] = None,
                  batched: bool = False) -> Problem:
    """Place a Problem's arrays with lattice/batch shardings.

    Lattice arrays (counts, oty) shard spatially; per-sample arrays
    (flat_idx, y, train_mask) shard over the batch axis when batched,
    otherwise replicate (they are only touched by gathers/segment-sums).
    """
    ndim = problem.counts.ndim - (1 if batched else 0)
    lat = lattice_sharding(mesh, ndim, spatial_axes, batch_axis, batched)
    rep_spec = [batch_axis] if batched else []
    rep = NamedSharding(mesh, P(*rep_spec, None)) if batched else NamedSharding(mesh, P(None))
    scal = NamedSharding(mesh, P(batch_axis)) if batched else NamedSharding(mesh, P())

    def put(x, sh):
        return jax.device_put(x, sh)

    return Problem(
        counts=put(problem.counts, lat),
        oty=put(problem.oty, lat),
        ybar=put(problem.ybar, scal),
        flat_idx=put(problem.flat_idx, rep),
        y=put(problem.y, rep),
        train_mask=(None if problem.train_mask is None
                    else put(problem.train_mask, rep)),
    )


def shard_state(state, mesh: Mesh, spatial_axes: Sequence[Optional[str]],
                batch_axis: Optional[str] = None, batched: bool = False):
    """Place an ADMMState with lattice shardings (blocks shard like theta:
    a block's dims differ from the lattice's by at most 1, which XLA
    handles with ragged-edge shards)."""
    ndim = state.theta.ndim - (1 if batched else 0)
    lat = lattice_sharding(mesh, ndim, spatial_axes, batch_axis, batched)
    scal = NamedSharding(mesh, P(batch_axis)) if batched else NamedSharding(mesh, P())

    def place(x):
        if x.ndim == state.theta.ndim:
            return jax.device_put(x, lat)
        return jax.device_put(x, scal)

    return jax.tree.map(place, state)
