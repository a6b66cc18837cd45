"""Mesh generation and nearest-knot indexing.

The reference builds an explicit (ntheta, p) matrix of knot coordinates
(create_mesh, rcpp-code/MultivarTV/src/utils.cpp:234-254) and finds nearest
knots by an O(n * ntheta * p) brute-force scan (utils.cpp:267-287).  Here a
mesh is a *lattice spec* — per-axis knot vectors — and nearest-knot lookup
is closed-form O(n * p) for regular lattices (or O(n * p * log m) via
searchsorted for irregular per-axis knots).  theta keeps the p-dim lattice
shape; flat orderings only appear at the API boundary, where the
reference's axis-0-fastest ("F order") linearization (utils.cpp:45-57) is
reproduced exactly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multivartv_tpu.config import MeshConfig, DEFAULT_MESH


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """A p-dim lattice mesh: per-axis knots + TV cell sizes (deltas).

    knots: tuple of (m_j,) arrays of per-axis knot positions (ascending).
    deltas: (p,) array of per-axis TV cell sizes (reference create_deltas,
        utils.cpp:256-263).
    m: static per-axis knot counts.
    regular: static flag — True when every axis is evenly spaced, enabling
        the closed-form nearest-knot index.
    """

    knots: Tuple[jax.Array, ...]
    deltas: jax.Array
    m: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    regular: bool = dataclasses.field(metadata=dict(static=True), default=True)

    @property
    def ndim(self) -> int:
        return len(self.m)

    @property
    def ntheta(self) -> int:
        return int(np.prod(self.m))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloudMeshSpec:
    """An arbitrary (non-lattice) user mesh: (ntheta, p) knot coordinates
    in the reference's axis-0-fastest row order.

    The reference supports this via its `mesh` argument (gen_mesh,
    solvers.cpp:233-244): geometric nearest-neighbor assignment uses the
    raw points, while the difference operator D still acts on the m-lattice
    *index* structure — row k of the mesh is lattice node vector2tensor(k)
    (utils.cpp:245-252).  Nearest lookup is host-side (native kd-tree when
    available) or on-device batched matmul.
    """

    points: jax.Array   # (ntheta, p), reference row order
    deltas: jax.Array   # (p,)
    m: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))

    @property
    def ndim(self) -> int:
        return len(self.m)

    @property
    def ntheta(self) -> int:
        return int(np.prod(self.m))


def ref_flat_to_multi(flat_ref: np.ndarray, m: Sequence[int]) -> np.ndarray:
    """Decompose reference-order (axis 0 fastest) flat indices into
    multi-indices, shape (n, p) — inverse of flat_index_ref."""
    m = tuple(int(v) for v in m)
    out = np.empty((len(flat_ref), len(m)), np.int64)
    rem = np.asarray(flat_ref, np.int64).copy()
    for j, mj in enumerate(m):
        out[:, j] = rem % mj
        rem //= mj
    return out


def _as_2d(data) -> jax.Array:
    data = jnp.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    return data


def make_mesh_spec(data, m: Sequence[int], *, config: MeshConfig = DEFAULT_MESH) -> MeshSpec:
    """Build a regular MeshSpec spanning [min-eps, max+eps] per axis.

    Reference: create_mesh (utils.cpp:234-254) — per-axis linspace over the
    eps-padded data range; create_deltas (utils.cpp:256-263) — per-axis
    delta (range+2*eps)/m_j ("cpp" mode) or the knot spacing
    (range+2*eps)/(m_j-1) ("py" mode, code/utils.py:187).
    """
    data = _as_2d(data)
    p = data.shape[1]
    m = tuple(int(v) for v in np.ravel(m))
    if len(m) != p:
        raise ValueError(f"m has {len(m)} entries but data has {p} columns")
    eps = config.eps
    knots = []
    deltas = []
    for j in range(p):
        lo = jnp.min(data[:, j]) - eps
        hi = jnp.max(data[:, j]) + eps
        knots.append(jnp.linspace(lo, hi, m[j], dtype=data.dtype))
        rng = hi - lo
        if config.delta_mode == "cpp":
            deltas.append(rng / m[j])
        else:
            deltas.append(rng / max(m[j] - 1, 1))
    return MeshSpec(knots=tuple(knots), deltas=jnp.stack(deltas), m=m, regular=True)


def mesh_spec_from_points(points, m: Sequence[int], deltas=None,
                          *, validate: bool = True) -> MeshSpec:
    """Interpret a user-supplied (ntheta, p) mesh matrix as a lattice.

    The reference accepts arbitrary user meshes (gen_mesh, solvers.cpp:
    233-244) but always builds D from the lattice dims m, so a user mesh is
    only meaningful as a lattice in axis-0-fastest order.  This extracts
    the per-axis knot vectors and checks lattice structure.
    """
    points = np.asarray(points)
    m = tuple(int(v) for v in np.ravel(m))
    p = len(m)
    ntheta = int(np.prod(m))
    if points.shape != (ntheta, p):
        raise ValueError(f"mesh has shape {points.shape}, expected {(ntheta, p)}")
    knots = []
    regular = True
    stride = 1
    for j in range(p):
        kj = points[: stride * m[j] : stride, j]
        knots.append(np.asarray(kj))
        stride *= m[j]
        if m[j] > 2:
            sp = np.diff(kj)
            if not np.allclose(sp, sp[0], rtol=1e-5, atol=1e-8):
                regular = False
        if np.any(np.diff(kj) <= 0):
            raise ValueError(f"mesh axis {j} knots are not strictly increasing")
    if validate:
        rebuilt = lattice_points(tuple(jnp.asarray(k) for k in knots), m)
        if not np.allclose(np.asarray(rebuilt), points, rtol=1e-5, atol=1e-7):
            raise ValueError(
                "user mesh is not a lattice in axis-0-fastest order; "
                "supply per-axis knots or a lattice mesh"
            )
    if deltas is None:
        deltas = jnp.stack([
            jnp.asarray((k[-1] - k[0]) / max(len(k) - 1, 1)) for k in knots
        ])
    else:
        deltas = jnp.asarray(deltas)
    return MeshSpec(
        knots=tuple(jnp.asarray(k) for k in knots),
        deltas=deltas,
        m=m,
        regular=regular,
    )


def lattice_points(knots: Sequence[jax.Array], m: Sequence[int]) -> jax.Array:
    """(ntheta, p) knot coordinates in the reference's axis-0-fastest order
    (create_mesh, utils.cpp:245-252)."""
    m = tuple(int(v) for v in m)
    p = len(m)
    cols = []
    before = 1
    total = int(np.prod(m))
    for j in range(p):
        col = jnp.repeat(jnp.asarray(knots[j]), before)
        col = jnp.tile(col, total // (before * m[j]))
        cols.append(col)
        before *= m[j]
    return jnp.stack(cols, axis=1)


def gen_mesh(data, m: Sequence[int], mesh=None, *, config: MeshConfig = DEFAULT_MESH):
    """Reference-parity mesh entry point (gen_mesh, solvers.cpp:233-244).

    Returns the (ntheta, p) knot coordinate matrix in the reference's
    ordering.  If `mesh` is given it is returned unchanged (after lattice
    validation).
    """
    if mesh is not None:
        spec = mesh_spec_from_points(mesh, m)
        return jnp.asarray(mesh)
    # Host-side build (p linspaces) — avoids eager device dispatch.
    data_np = np.asarray(data)
    if data_np.ndim == 1:
        data_np = data_np[:, None]
    m = tuple(int(v) for v in np.ravel(m))
    knots = [
        jnp.asarray(np.linspace(data_np[:, j].min() - config.eps,
                                data_np[:, j].max() + config.eps, m[j]))
        for j in range(len(m))
    ]
    return lattice_points(knots, m)


def nearest_knot_multi_index(spec: MeshSpec, data) -> jax.Array:
    """Per-axis nearest-knot indices, shape (n, p) int32.

    Replaces the reference's brute-force O(n*ntheta*p) scan
    (nearest1, utils.cpp:280-287) with an O(n*p) closed form on regular
    lattices.  Tie-breaking matches the reference: on an exact midpoint the
    *lower* index wins (index_min returns the first minimum over the
    axis-0-fastest scan order, utils.cpp:275).
    """
    data = _as_2d(data)
    idxs = []
    for j in range(spec.ndim):
        kj = spec.knots[j]
        mj = spec.m[j]
        x = data[:, j]
        if mj == 1:
            idxs.append(jnp.zeros(x.shape, jnp.int32))
            continue
        if spec.regular:
            h = (kj[-1] - kj[0]) / (mj - 1)
            t = (x - kj[0]) / h
            i = jnp.floor(t)
            frac = t - i
            idx = i.astype(jnp.int32) + (frac > 0.5).astype(jnp.int32)
        else:
            hi = jnp.searchsorted(kj, x, side="left").astype(jnp.int32)
            hi = jnp.clip(hi, 1, mj - 1)
            lo = hi - 1
            pick_hi = (kj[hi] - x) < (x - kj[lo])  # strict: ties -> lower
            idx = jnp.where(pick_hi, hi, lo)
        idxs.append(jnp.clip(idx, 0, mj - 1))
    return jnp.stack(idxs, axis=1)


def flat_index_c(multi_idx: jax.Array, m: Sequence[int]) -> jax.Array:
    """C-order (last axis fastest) flat index — internal lattice addressing."""
    m = tuple(int(v) for v in m)
    strides = np.ones(len(m), dtype=np.int64)
    for j in range(len(m) - 2, -1, -1):
        strides[j] = strides[j + 1] * m[j + 1]
    return (multi_idx.astype(jnp.int32) * jnp.asarray(strides, jnp.int32)).sum(axis=1)


def flat_index_ref(multi_idx: jax.Array, m: Sequence[int]) -> jax.Array:
    """Reference-order (axis 0 fastest) flat index (tensor2vector,
    utils.cpp:45-57)."""
    m = tuple(int(v) for v in m)
    strides = np.ones(len(m), dtype=np.int64)
    for j in range(1, len(m)):
        strides[j] = strides[j - 1] * m[j - 1]
    return (multi_idx.astype(jnp.int32) * jnp.asarray(strides, jnp.int32)).sum(axis=1)


def flatten_ref_order(theta: jax.Array) -> jax.Array:
    """Flatten a p-dim lattice array to the reference's axis-0-fastest
    vector layout (the layout of theta_hat in reference outputs)."""
    return jnp.transpose(theta).reshape(-1)


def unflatten_ref_order(vec: jax.Array, m: Sequence[int]) -> jax.Array:
    """Inverse of flatten_ref_order."""
    m = tuple(int(v) for v in m)
    return jnp.transpose(vec.reshape(tuple(reversed(m))))
