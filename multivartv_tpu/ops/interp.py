"""Interpolation ("O matrix") operations as gather / scatter-add.

The reference builds an explicit n x ntheta sparse 0/1 matrix O with one 1
per row at the nearest knot (nearest_interp_matrix, utils.cpp:289-304) and
uses O theta, O'y, O'O as sparse products.  On a lattice with closed-form
nearest-knot indices (see mesh.py):

    O theta  = theta gathered at per-sample flat indices,
    O' v     = segment_sum (scatter-add) of v onto the lattice,
    O' O     = diag(counts) — exactly diagonal, since each row of O has a
               single unit entry.

The diagonality of O'O is what makes the x-update system
diag(c) + rho D'D amenable to DCT-preconditioned CG.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multivartv_tpu import mesh as mesh_lib
from multivartv_tpu.mesh import MeshSpec, PointCloudMeshSpec


def flat_knot_indices(spec, data) -> jax.Array:
    """Per-sample C-order flat index of the nearest knot, shape (n,)."""
    if isinstance(spec, PointCloudMeshSpec):
        return pointcloud_flat_c_indices(spec, data)
    multi = mesh_lib.nearest_knot_multi_index(spec, data)
    return mesh_lib.flat_index_c(multi, spec.m)


def pointcloud_flat_c_indices(spec: PointCloudMeshSpec, data) -> jax.Array:
    """Nearest mesh-row assignment for an arbitrary point-cloud mesh,
    converted from the reference row order to internal C-order flat
    indices.  Host data uses the native kd-tree (multivartv_tpu.native);
    traced/device data uses the batched-matmul scan."""
    if isinstance(data, np.ndarray):
        try:
            from multivartv_tpu import native
            pts = np.asarray(spec.points)
            idx_ref = native.nearest_kdtree(data, pts)
        except Exception:
            idx_ref = None
        if idx_ref is not None:
            multi = mesh_lib.ref_flat_to_multi(idx_ref, spec.m)
            return mesh_lib.flat_index_c(jnp.asarray(multi), spec.m)
    idx_ref = nearest_pointcloud_indices(data, spec.points)
    # ref-order flat -> multi -> C-order flat (traced-safe arithmetic)
    rem = idx_ref.astype(jnp.int32)
    cols = []
    for mj in spec.m:
        cols.append(rem % mj)
        rem = rem // mj
    multi = jnp.stack(cols, axis=1)
    return mesh_lib.flat_index_c(multi, spec.m)


def gather_fitted(theta: jax.Array, flat_idx: jax.Array) -> jax.Array:
    """O theta: fitted value per sample."""
    return jnp.take(theta.reshape(-1), flat_idx, axis=0)


def scatter_to_lattice(values: jax.Array, flat_idx: jax.Array,
                       m: Sequence[int]) -> jax.Array:
    """O' v: scatter-add per-sample values onto the lattice (shape m)."""
    m = tuple(int(v) for v in m)
    ntheta = int(np.prod(m))
    flat = jax.ops.segment_sum(values, flat_idx, num_segments=ntheta)
    return flat.reshape(m)


def knot_counts(flat_idx: jax.Array, m: Sequence[int],
                weights: jax.Array | None = None,
                dtype=jnp.float32) -> jax.Array:
    """diag(O'O): per-knot sample counts (optionally masked/weighted)."""
    n = flat_idx.shape[0]
    w = jnp.ones((n,), dtype) if weights is None else weights.astype(dtype)
    return scatter_to_lattice(w, flat_idx, m)


def nearest_pointcloud_indices(data, mesh_points, *, chunk: int = 4096) -> jax.Array:
    """Brute-force nearest neighbor against an arbitrary (ntheta, p) point
    cloud, for non-lattice user meshes (reference nearest1,
    utils.cpp:280-287).

    Batched as ||x||^2 - 2 x . mesh' + ||mesh||^2 so the heavy term is an
    (n, p) x (p, ntheta) matmul — MXU work instead of a scalar scan.
    Tie-break: first (lowest flat index) minimum, like index_min.
    """
    data = jnp.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    mesh_points = jnp.asarray(mesh_points)
    mesh_sq = jnp.sum(jnp.square(mesh_points), axis=1)

    def one_chunk(x):
        # HIGHEST matmul precision: TPU's DEFAULT f32 dot lowering runs
        # at ~bf16 precision, which flips argmin cell assignments for
        # points anywhere near a cell boundary (caught on-chip: 38/400
        # disagreements vs the closed-form regular-mesh index at a 10x10
        # mesh).  Assignment exactness beats MXU throughput here.
        d = (
            jnp.sum(jnp.square(x), axis=1, keepdims=True)
            - 2.0 * jnp.matmul(x, mesh_points.T,
                               precision=jax.lax.Precision.HIGHEST)
            + mesh_sq[None, :]
        )
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    n = data.shape[0]
    if n <= chunk:
        return one_chunk(data)
    pad = (-n) % chunk
    padded = jnp.pad(data, ((0, pad), (0, 0)))
    chunks = padded.reshape(-1, chunk, data.shape[1])
    idx = jax.lax.map(one_chunk, chunks).reshape(-1)
    return idx[:n]
