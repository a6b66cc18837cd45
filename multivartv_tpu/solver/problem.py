"""Problem and operator containers (pytrees) for the ADMM solver.

The reference caches O, O', D, D', O'O, D'D, O'y and the assembled system
matrix across lambdas/folds (mbs_cache, rcpp-code .../solvers.hpp:30-50;
Python cache list, code/solvers.py:41-51).  Matrix-free on a lattice, the
only data-dependent cached objects are:

    counts = diag(O'O)  (per-knot sample counts, shape m)
    oty    = O'y        (scatter-add of y, shape m)

plus the spectral objects of D'D (eigenvalues on the DCT basis, Jacobi
diagonal) which depend only on (m, deltas).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multivartv_tpu.config import SolverConfig
from multivartv_tpu.mesh import MeshSpec
from multivartv_tpu.ops import dct as dct_ops
from multivartv_tpu.ops import diff as diff_ops
from multivartv_tpu.ops import interp as interp_ops


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Operators:
    """Static/spectral description of D and the x-update system for a
    lattice of dims m with TV cell sizes deltas."""

    binaries: Tuple[Tuple[int, ...], ...] = dataclasses.field(metadata=dict(static=True))
    m: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    scales: Tuple[jax.Array, ...] = dataclasses.field(default=())
    gram_eigs: Optional[jax.Array] = None   # DCT eigenvalues of D'D, shape m
    gram_diagonal: Optional[jax.Array] = None  # diag(D'D), shape m
    # Per-axis dense DCT-II matrices: on TPU the MXU matmul transform beats
    # the FFT lowering for axis sizes up to ~2048.  None -> FFT path.
    dct_mats: Optional[Tuple[jax.Array, ...]] = None
    # Folded-DCT objects (even axes only): per-axis (Te, To) half matrices
    # and the Gram eigenvalues permuted into packed (even, odd) frequency
    # order — HALF the MXU FLOPs per transform (see ops/dct.py).
    dct_halves: Optional[Tuple[Tuple[jax.Array, jax.Array], ...]] = None
    gram_eigs_packed: Optional[jax.Array] = None
    # Blocked (concat-free) large-lattice objects: bfloat16 copies of the
    # half matrices (cast once here, not per transform inside the ADMM
    # loop) and the Gram eigenvalues in blocked even/odd layout
    # (ops/dct.py blocked section).
    dct_halves_lp: Optional[Tuple[Tuple[jax.Array, jax.Array], ...]] = None
    gram_eigs_blocked: Optional[Tuple[jax.Array, ...]] = None
    # Depth-2 fast-DCT ("quartered", ops/dct.py) objects for the largest
    # lattices: HALF the MXU FLOPs of the folded transform.  bf16 operand
    # set + Gram eigenvalues in quartered layout.
    dct_quarters_lp: Optional[Tuple[tuple, ...]] = None
    gram_eigs_quartered: Optional[Tuple[jax.Array, ...]] = None
    # bfloat16 copies of the blocked/quartered eigenvalue blocks for the
    # bf16-vector spectral CG (solver/xupdate.py): the f32 eigenvalues
    # are read ~10x per x-update in the CG elementwise chains (operator
    # ap = f + rho*E*p, preconditioner w = cbar + rho*E) — a full-lattice
    # f32 read each time.  bf16 halves that traffic; the 2^-8 relative
    # eigenvalue perturbation only perturbs the CORRECTION operator /
    # preconditioner (r0 stays exact f32 in the natural domain), so the
    # solve's fixed point is unchanged — the same iterative-refinement
    # argument as the bf16 transforms (docs/MATH.md).
    gram_eigs_blocked_lp: Optional[Tuple[jax.Array, ...]] = None
    gram_eigs_quartered_lp: Optional[Tuple[jax.Array, ...]] = None
    # TV cell sizes the operators were built with — kept so derived
    # (padded) operator sets can be rebuilt (solver/pad.py).
    deltas: Optional[jax.Array] = None
    # Precomputed operator set for the DMA-aligned (zero-count padded)
    # lattice (solver/pad.py) — built once host-side so the padded solve
    # routes (unbatched + batched fused kernels) neither rebuild spectral
    # operands per lambda inside the traced loop nor embed the transform
    # matrices as giant HLO constants.  None when m is already aligned.
    padded: Optional["Operators"] = None

    @property
    def ntheta(self) -> int:
        return int(np.prod(self.m))

    @property
    def rows_d(self) -> int:
        return diff_ops.num_rows(self.m, self.binaries)

    def apply_D(self, theta):
        return diff_ops.apply_D(theta, self.binaries, self.scales)

    def apply_Dt(self, blocks):
        return diff_ops.apply_Dt(blocks, self.binaries, self.scales)

    def apply_gram(self, theta):
        return diff_ops.apply_gram(theta, self.binaries, self.scales)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Problem:
    """One denoising problem (or one fold of one), ready for the solver.

    counts/oty may carry leading batch axes (folds, scenarios) — every
    solver op broadcasts or is vmapped over them.
    """

    counts: jax.Array    # (m) diag(O'O)
    oty: jax.Array       # (m) O'y
    ybar: jax.Array      # scalar mean of (train) y — theta init value
    flat_idx: jax.Array  # (n,) per-sample nearest-knot flat index (C order)
    y: jax.Array         # (n,) responses
    train_mask: Optional[jax.Array] = None  # (n,) 0/1; None = all train


# Minimum axis size for building the depth-2 fast-DCT ("quartered")
# operand set, chosen so the quarter-width (n/4) matmuls fill the 128-lane
# MXU tile: 512 = 4 x 128, the same half-width rule BLOCKED_MIN_HALF
# applies to the folded layout (sub-128-lane contractions measured SLOWER
# at 128^3: 536 vs 712 iters/s).  The former blanket 1024 kept every 3-D
# lattice off the fastest transform (VERDICT r3 #3).  Tests lower this to
# exercise the path on tiny lattices.
QUARTER_MIN_AXIS = 512


def build_operators(m: Sequence[int], deltas: jax.Array,
                    cfg: SolverConfig, dtype=jnp.float32,
                    with_padded: bool = True) -> Operators:
    m = tuple(int(v) for v in m)
    binaries = diff_ops.fd_binaries(len(m), cfg.include_full_mixed)
    scales = diff_ops.delta_scales(binaries, deltas)
    need_dct = cfg.x_solver in ("dct_pcg", "dct_direct")
    # Gram eigenvalues are built for EVERY solver config (one O(ntheta)
    # array): the lambda_max estimate needs the exact (D'D)^+ regardless of
    # the x-update backend — the reference's lambda_max is likewise
    # solver-independent (utils.cpp:343-355).
    gram_eigs = dct_ops.gram_eigenvalues(m, deltas, cfg.include_full_mixed,
                                         dtype)
    gram_diagonal = (
        diff_ops.gram_diag(m, binaries, scales, dtype)
        if cfg.x_solver == "jacobi_pcg" else None
    )
    dct_mats = (
        dct_ops.dct_matrices(m, dtype)
        if max(m) <= 2048 else None
    )
    # Folded-DCT halves are built independently of the dense matrices: the
    # (n/2 x n/2) half pair costs n^2/2 elements per axis, affordable well
    # past the dense-matrix gate (8192 -> 2 x 134 MB f32 per axis in HBM),
    # and the packed x-update path is what keeps 2048^2-8192^2 lattices
    # off the slow FFT-DCT lowering (see solver/xupdate.py).  8192^2 is
    # 67M parameters on one chip — the regime where the reference's
    # per-iteration SuperLU factorization (solvers.cpp:113) is infeasible
    # outright (rcpp-code/README.md:9 flags memory as its wall).
    dct_halves = None
    gram_eigs_packed = None
    dct_halves_lp = None
    gram_eigs_blocked = None
    dct_quarters_lp = None
    gram_eigs_quartered = None
    gram_eigs_blocked_lp = None
    gram_eigs_quartered_lp = None
    # p = 1 never uses the folded/packed operand sets: the x-update is an
    # exact cyclic-reduction tridiagonal solve (solver/tridiag.py), so
    # the (n/2)^2 half-matrix builds would be pure memory waste at large
    # n (134 MB at n = 8192).
    if (need_dct and len(m) >= 2 and max(m) <= 8192
            and all(v % 2 == 0 for v in m)):
        dct_halves = tuple(dct_ops.dct_packed_halves(v, dtype) for v in m)
        gram_eigs_packed = dct_ops.pack_spectrum(gram_eigs)
        dct_halves_lp = tuple(
            (te.astype(jnp.bfloat16), to.astype(jnp.bfloat16))
            for te, to in dct_halves)
        gram_eigs_blocked = dct_ops.blocked_spectrum(gram_eigs)
        gram_eigs_blocked_lp = tuple(
            e.astype(jnp.bfloat16) for e in gram_eigs_blocked)
        if all(v % 4 == 0 and v >= QUARTER_MIN_AXIS for v in m):
            def _lp(qm):
                C2q, V4q, C2qf, c1, s1, alt, w = qm
                return (C2q.astype(jnp.bfloat16), V4q.astype(jnp.bfloat16),
                        C2qf.astype(jnp.bfloat16), c1, s1, alt, w)
            dct_quarters_lp = tuple(
                _lp(dct_ops.dct_quarter_mats(v, dtype)) for v in m)
            gram_eigs_quartered = dct_ops.quartered_spectrum(gram_eigs)
            gram_eigs_quartered_lp = tuple(
                e.astype(jnp.bfloat16) for e in gram_eigs_quartered)
    padded = None
    if with_padded and len(m) in (2, 3) and cfg.x_solver == "dct_pcg":
        from multivartv_tpu.solver import pad as pad_lib
        m_pad = pad_lib.pad_target_m(m)
        # p == 2: always prebuilt (the batched CV route pads any unaligned
        # 2-D mesh).  p == 3: only the unbatched route pads, which gates
        # out >4x blow-ups (admm.pad_single_applies) — skip those builds.
        blowup_ok = (len(m) == 2
                     or int(np.prod(m_pad)) <= 4 * int(np.prod(m)))
        if pad_lib.needs_padding(m) and blowup_ok:
            # Aligned-lattice operator set for the padded solve routes
            # (pad_target_m is aligned, so this does not recurse).
            padded = build_operators(m_pad, deltas, cfg, dtype,
                                     with_padded=False)
    return Operators(
        binaries=binaries,
        m=m,
        scales=tuple(scales),
        gram_eigs=gram_eigs,
        gram_diagonal=gram_diagonal,
        dct_mats=dct_mats,
        dct_halves=dct_halves,
        gram_eigs_packed=gram_eigs_packed,
        dct_halves_lp=dct_halves_lp,
        gram_eigs_blocked=gram_eigs_blocked,
        dct_quarters_lp=dct_quarters_lp,
        gram_eigs_quartered=gram_eigs_quartered,
        gram_eigs_blocked_lp=gram_eigs_blocked_lp,
        gram_eigs_quartered_lp=gram_eigs_quartered_lp,
        deltas=jnp.asarray(deltas, dtype),
        padded=padded,
    )


def build_problem(spec: MeshSpec, data, y, train_mask=None,
                  dtype=jnp.float32, flat_idx=None) -> Problem:
    """Bin data to the lattice and precompute the O-side cached objects.

    flat_idx: precomputed C-order nearest-knot indices (used for
    point-cloud meshes where the assignment runs host-side)."""
    y = jnp.asarray(y, dtype).reshape(-1)
    if flat_idx is None:
        flat_idx = interp_ops.flat_knot_indices(spec, data)
    else:
        flat_idx = jnp.asarray(flat_idx, jnp.int32)
    if train_mask is None:
        w = None
        ybar = jnp.mean(y)
        wy = y
    else:
        train_mask = jnp.asarray(train_mask, dtype)
        w = train_mask
        ybar = jnp.sum(y * train_mask) / jnp.maximum(jnp.sum(train_mask), 1.0)
        wy = y * train_mask
    counts = interp_ops.knot_counts(flat_idx, spec.m, weights=w, dtype=dtype)
    oty = interp_ops.scatter_to_lattice(wy, flat_idx, spec.m)
    return Problem(
        counts=counts,
        oty=oty,
        ybar=ybar,
        flat_idx=flat_idx,
        y=y,
        train_mask=train_mask,
    )
