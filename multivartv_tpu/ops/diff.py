"""Matrix-free difference operator D and its adjoint/Gram.

The reference materializes D as a stack of 2^p - 1 sparse COO blocks — one
per nonzero binary b in {0,1}^p — where block b chains first differences
along every axis j with b_j = 1, scaled by prod_j deltas_j^(1-b_j)
(create_D, rcpp-code/MultivarTV/src/utils.cpp:218-232; mixedpartial,
utils.cpp:159-194; Python create_D, code/utils.py:138-149).

On a lattice, block b is exactly the Kronecker product over axes of either
the (m_j-1) x m_j forward-difference matrix (b_j = 1) or the identity
(b_j = 0).  So D theta is just iterated `x[1:] - x[:-1]` slicing along the
axes in b — no sparse matrix, no index algebra, perfectly fusible by XLA.
(The reference's mixedpartial hardwires its first factor to axis 0,
utils.cpp:173 / code/utils.py:116 — a bug for p >= 3 binaries excluding
axis 0; the Kronecker form here is the mathematically intended operator and
coincides with the reference for p <= 2.)

A D block's mathematical shape is (m - b), but blocks are *stored padded to
the full lattice shape m* with zeros in the trailing edge along every
differenced axis.  Rationale (TPU): uniform m-shaped arrays keep the last
dims 128-lane aligned (a 511x512 intermediate forces relayouts and runs the
stencil ~50x below HBM roofline), make every ADMM state leaf shard
identically over a device mesh, and give Pallas kernels one block shape.
The padding is self-maintaining: soft-threshold maps 0 to 0, the dual
update adds edge-zero arrays, and the adjoint (roll - id) is exact given
edge zeros — only the forward diff needs an explicit edge mask.
"alpha"/"u" ADMM variables are tuples of such arrays in the reference's
stack order (all-ones block first, then binaries 1..2^p-2 in big-endian
order — create_D, utils.cpp:225-230).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Binary = Tuple[int, ...]
Blocks = Tuple[jax.Array, ...]


def fd_binaries(p: int, include_full_mixed: bool = True) -> Tuple[Binary, ...]:
    """Nonzero binaries in the reference C++ stack order: the all-ones
    binary first, then 1..2^p-2 in big-endian binary order (create_D,
    utils.cpp:225-230; fd_binaries, utils.cpp:93-103).

    With include_full_mixed=False the all-ones block is dropped, matching
    the reference Python create_D when deltas are supplied
    (code/utils.py:145).
    """
    ordered = []
    for n in range(1, (1 << p) - 1):
        ordered.append(tuple((n >> (p - 1 - j)) & 1 for j in range(p)))
    ones = tuple([1] * p)
    if include_full_mixed:
        return (ones,) + tuple(ordered)
    if p == 1:
        # p=1: the only binary is (1,); dropping it would leave no penalty.
        return (ones,)
    return tuple(ordered)


def delta_scales(binaries: Sequence[Binary], deltas: jax.Array) -> Tuple[jax.Array, ...]:
    """Per-block scale prod_j deltas_j^(1-b_j) (create_D, utils.cpp:227)."""
    out = []
    for b in binaries:
        mask = jnp.asarray(np.array(b) == 0)
        out.append(jnp.prod(jnp.where(mask, deltas, jnp.ones_like(deltas))))
    return tuple(out)


def block_shape(m: Sequence[int], b: Binary) -> Tuple[int, ...]:
    """Mathematical (unpadded) shape of a block: m - b elementwise."""
    return tuple(int(mj) - bj for mj, bj in zip(m, b))


def num_rows(m: Sequence[int], binaries: Sequence[Binary]) -> int:
    """Total *mathematical* row count of the stacked D (for Boyd stopping
    thresholds) — padding zeros are not rows."""
    return int(sum(np.prod(block_shape(m, b)) for b in binaries))


def _shift_down(x: jax.Array, axis: int) -> jax.Array:
    """x[i] <- x[i+1] circularly (wrapped entries land on the masked edge)."""
    return jnp.roll(x, -1, axis)


def _shift_up(x: jax.Array, axis: int) -> jax.Array:
    """x[i] <- x[i-1] circularly."""
    return jnp.roll(x, 1, axis)


def edge_mask(shape: Sequence[int], b: Binary, dtype=jnp.float32) -> jax.Array:
    """1 on the valid region of block b, 0 on the padded trailing edge of
    every differenced axis.  Built as an outer product of per-axis 1-D
    masks so XLA keeps it fused/broadcast."""
    shape = tuple(int(v) for v in shape)
    out = jnp.ones((), dtype)
    for j, bj in enumerate(b):
        if bj:
            mj = shape[j]
            mask = jnp.ones((mj,), dtype).at[mj - 1].set(0.0)
            s = [1] * len(shape)
            s[j] = mj
            out = out * mask.reshape(s)
    if out.ndim == 0:
        out = jnp.ones(shape, dtype)
    return out


def true_region_mask(shape: Sequence[int], b: Binary,
                     true_m: Sequence[int], dtype=jnp.float32) -> jax.Array:
    """1 on block b's rows of the TRUE (unpadded) problem, 0 on every row
    that reads or lives on an alignment-pad knot (solver/pad.py): along
    axis j the valid indices are 0 .. true_m[j] - b_j - 1 (a differenced
    row at index i reads knots i and i+1, so the last true row is
    true_m[j] - 2).  With true_m == shape this reduces to edge_mask.

    Used by the EXACT padded-solve route: the padded lattice keeps the
    full uniform D (so the DCT diagonalization of D'D stays exact for the
    x-update) and the TV penalty is masked to the true rows at the prox —
    soft-threshold with threshold 0 is the identity, so masked rows carry
    alpha = D theta - u, forcing u = 0 and a zero primal residual there.
    The solved problem is then exactly
    fid(theta_true) + lambda ||W D theta||_1, whose minimum over
    theta_true is the true (unpadded) optimum — the reference solves the
    same objective for any m (rcpp-code/MultivarTV/src/solvers.cpp:110-126).
    """
    shape = tuple(int(v) for v in shape)
    out = jnp.ones((), dtype)
    for j, bj in enumerate(b):
        bound = int(true_m[j]) - bj
        mj = shape[j]
        if bound >= mj:
            continue
        mask = (jnp.arange(mj) < bound).astype(dtype)
        s = [1] * len(shape)
        s[j] = mj
        out = out * mask.reshape(s)
    if out.ndim == 0:
        out = jnp.ones(shape, dtype)
    return out


def apply_block(theta: jax.Array, b: Binary) -> jax.Array:
    """Padded forward difference block: chained (shift - id) per differenced
    axis, then one combined edge mask (wrapped values only pollute rows the
    mask zeroes)."""
    out = theta
    any_diff = False
    for j, bj in enumerate(b):
        if bj:
            out = _shift_down(out, j) - out
            any_diff = True
    if not any_diff:
        return out
    return out * edge_mask(theta.shape, b, theta.dtype)


def adjoint_block(a: jax.Array, b: Binary) -> jax.Array:
    """Adjoint of the padded forward diff: chained (shift_up - id).  Exact
    because a's padded edge is zero: (D'a)_i = a_{i-1} - a_i with a_{-1}
    := a_{m-1} = 0 via the circular shift."""
    out = a
    for j, bj in enumerate(b):
        if bj:
            out = _shift_up(out, j) - out
    return out


def apply_D(theta: jax.Array, binaries: Sequence[Binary],
            scales: Sequence[jax.Array]) -> Blocks:
    """D theta as a tuple of blocks (the matrix-free stack)."""
    return tuple(s * apply_block(theta, b) for b, s in zip(binaries, scales))


def apply_Dt(blocks: Blocks, binaries: Sequence[Binary],
             scales: Sequence[jax.Array]) -> jax.Array:
    """D' applied to a block stack, returning a lattice-shaped array."""
    out = None
    for a, b, s in zip(blocks, binaries, scales):
        term = s * adjoint_block(a, b)
        out = term if out is None else out + term
    return out


def apply_gram(theta: jax.Array, binaries: Sequence[Binary],
               scales: Sequence[jax.Array]) -> jax.Array:
    """D'D theta, fused (never materializes the blocks in HBM when jitted)."""
    out = None
    for b, s in zip(binaries, scales):
        term = (s * s) * adjoint_block(apply_block(theta, b), b)
        out = term if out is None else out + term
    return out


def gram_diag(m: Sequence[int], binaries: Sequence[Binary],
              scales: Sequence[jax.Array], dtype=jnp.float32) -> jax.Array:
    """diag(D'D) in closed form (for Jacobi preconditioning).

    Block b's Gram is a Kronecker product over axes of either
    L_j = Delta' Delta (diag [1,2,...,2,1]) or I, so its diagonal is the
    outer product of the per-axis diagonals.
    """
    m = tuple(int(v) for v in m)
    out = jnp.zeros(m, dtype)
    for b, s in zip(binaries, scales):
        term = jnp.ones((), dtype)
        for j, bj in enumerate(b):
            if bj:
                dj = jnp.full((m[j],), 2.0, dtype)
                dj = dj.at[0].set(1.0).at[-1].set(1.0)
            else:
                dj = jnp.ones((m[j],), dtype)
            shape = [1] * len(m)
            shape[j] = m[j]
            term = term * dj.reshape(shape)
        out = out + (s * s) * term
    return out


def blocks_norm_sq(blocks: Blocks) -> jax.Array:
    """Sum of squares over a block stack (Frobenius^2 of the stacked vector)."""
    return sum(jnp.sum(jnp.square(a)) for a in blocks)


def blocks_abs_sum(blocks: Blocks) -> jax.Array:
    return sum(jnp.sum(jnp.abs(a)) for a in blocks)


def blocks_abs_max(blocks: Blocks) -> jax.Array:
    return jnp.max(jnp.stack([jnp.max(jnp.abs(a)) for a in blocks]))


def zeros_like_blocks(m: Sequence[int], binaries: Sequence[Binary],
                      dtype=jnp.float32) -> Blocks:
    """Zero block stack in the padded (full lattice shape) representation."""
    m = tuple(int(v) for v in m)
    return tuple(jnp.zeros(m, dtype) for _ in binaries)


def tv_penalty(theta: jax.Array, binaries: Sequence[Binary],
               scales: Sequence[jax.Array]) -> jax.Array:
    """||D theta||_1 — the TV penalty value."""
    return blocks_abs_sum(apply_D(theta, binaries, scales))
