"""The ADMM x-update: solve (diag(counts) + rho D'D) theta = b.

The reference refactorizes and direct-solves this system with SuperLU
inside *every* ADMM iteration because adaptive rho changes the matrix
(solvers.cpp:113,126), or factorizes once per lambda in the Python
prototype (code/solvers.py:133).  Matrix-free, a rho change costs nothing;
the solve strategies are:

  dct_pcg    — CG preconditioned by the exact DCT solve of
               (mean(counts) I + rho D'D): spectrally tight since the
               perturbation diag(counts - mean) is bounded.  Default.
  jacobi_pcg — CG preconditioned by 1/(counts + rho diag(D'D)); works
               when the lattice is sharded (no global DCT needed).
  dct_direct — single DCT solve treating counts as its mean; exact only
               for equal-count lattices (e.g. the fused-lasso case m = n,
               mesh = x of the vignette, MultivarTV-intro.Rmd:111-118).
  cg         — unpreconditioned CG (baseline for benchmarks).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from multivartv_tpu.config import SolverConfig
from multivartv_tpu.ops import dct as dct_ops
from multivartv_tpu.solver.cg import pcg, pcg_fixed, pcg_fused
from multivartv_tpu.solver.problem import Operators, Problem

# Test hook: when True, the packed-DCT XLA x-update (the large-lattice
# production path, TPU-gated below) is used off-TPU too, so its semantics
# are testable on the CPU harness (same pattern as admm.FORCE_FUSED_INTERPRET).
FORCE_XLA_PACKED = False

# Minimum per-axis half-width for the blocked (concat-free) spectral CG
# layout; below it the 2^p half-size matmuls fall under the 128-lane MXU
# tile and the packed concatenated layout wins (measured at 128^3).
# Tests lower this to exercise the blocked path on tiny lattices.
BLOCKED_MIN_HALF = 128


def _xla_packed_applies(ops: Operators, cfg: SolverConfig) -> bool:
    """The folded/packed-DCT PCG x-update in plain XLA: the production
    path for lattices above the whole-lattice-VMEM kernel gate (2048^2,
    4096^2, 128^3, ...).  Runs the SAME numerics as the fused Pallas
    kernel — bf16 MXU matmuls for the preconditioner transforms, f32
    spectral weights / CG vectors, a fixed handful of CG steps — so the
    large-lattice regime is the small-lattice regime minus VMEM residency,
    not a different algorithm."""
    return (
        cfg.xla_packed
        and cfg.x_solver == "dct_pcg"
        and ops.dct_halves is not None
        and ops.gram_eigs_packed is not None
        and (jax.default_backend() == "tpu" or FORCE_XLA_PACKED)
    )


def _spectral_cg_packed(ops: Operators, counts, b, rho, x0, matvec,
                        w, eigs_packed, fwd, inv, n_steps: int):
    """Fixed-step spectral-correction CG in the packed (concatenated)
    layout — kept for small-axis lattices where the blocked layout's
    half-size matmuls fall below MXU tile width (see call site)."""
    from multivartv_tpu.solver.cg import _poison_if_nonfinite
    eps = jnp.asarray(1e-30, b.dtype)
    rl = rho * eigs_packed
    rh = fwd(b - matvec(x0))
    p = rh / w
    rz = jnp.sum(rh * rh / w)
    xh = jnp.zeros_like(rh)
    for step in range(n_steps):
        ap = fwd(counts * inv(p)) + rl * p
        alpha_cg = rz / jnp.maximum(jnp.sum(p * ap), eps)
        xh = xh + alpha_cg * p
        rh = rh - alpha_cg * ap
        rz_new = jnp.sum(rh * rh / w)
        if step + 1 < n_steps:
            beta = rz_new / jnp.maximum(rz, eps)
            p = rh / w + beta * p
        rz = rz_new
    x = x0 + inv(xh)
    return (_poison_if_nonfinite(x, rz), jnp.asarray(n_steps, jnp.int32))


def spectral_layout(ops: Operators) -> str | None:
    """Which spectral-CG memory layout the large-lattice x-update runs in:
      "quartered" — depth-2 fast DCT, half the MXU FLOPs (largest axes);
      "blocked"   — concat-free folded DCT (half-width >= 128);
      "packed"    — concatenated folded DCT (small axes);
      None        — no packed operand set.
    """
    if ops.dct_halves is None or ops.gram_eigs_packed is None:
        return None
    if ops.gram_eigs_quartered is not None and ops.dct_quarters_lp is not None:
        return "quartered"
    if (ops.gram_eigs_blocked is not None
            and all(v // 2 >= BLOCKED_MIN_HALF for v in ops.m)):
        return "blocked"
    return "packed"


def spectral_vec_dtype(ops: Operators, cfg: SolverConfig):
    """The spectral-CG block-vector storage dtype: bfloat16 when
    SolverConfig.spectral_vec_bf16 (auto: lattices > 2^23 knots — the
    bandwidth-bound regime; measured +20% at 4096^2, -4% at 2048^2),
    else None (= keep the problem dtype)."""
    use = (cfg.spectral_vec_bf16 if cfg.spectral_vec_bf16 is not None
           else ops.ntheta > (1 << 23))
    return jnp.bfloat16 if use else None


def counts_to_layout(ops: Operators, counts, cfg: SolverConfig = None):
    """Loop-invariant layout conversion of counts for the spectral CG
    (hoisted out of the ADMM while_loop body by make_admm_iteration).

    With the bf16 vector path active the blocks are stored bfloat16 too:
    counts are per-knot sample tallies — small integers, EXACT in bf16 up
    to 256 — and the f32 read in fwd(counts * inv(p)) was costing a full
    lattice pass per CG step (~0.5 ms/iteration at 4096^2)."""
    lay = spectral_layout(ops)
    p = len(ops.m)
    if lay == "quartered":
        out = dct_ops.to_blocks4(counts, p)
    elif lay == "blocked":
        out = dct_ops.to_blocks(counts, p)
    else:
        return None
    vd = spectral_vec_dtype(ops, cfg) if cfg is not None else None
    if vd is not None:
        # bf16 represents integer counts exactly only up to 256.  Above
        # that the cast rounds the fidelity diagonal (a convergence-rate,
        # not solution, concern: r0 stays exact f32 in the natural
        # domain, and the product counts*v inside the CG matvec is
        # bf16-rounded regardless of counts' storage dtype) — still, skip
        # the cast whenever a CONCRETE counts array shows values above
        # 256 so the dense-counts edge keeps a bit-exact diagonal
        # (ADVICE r4).  Under a trace the cast stays on (the >2^23-knot
        # auto regime implies > 2 x 10^9 samples for counts > 256/knot).
        dense = False
        if not isinstance(counts, jax.core.Tracer):
            try:
                dense = float(jnp.max(counts)) > 256.0
            except jax.errors.ConcretizationTypeError:
                # Concrete counts closed over by an enclosing trace:
                # jnp.max still returns a Tracer there, so fall back to
                # the cast-on default (same as the Tracer case).
                dense = False
        if not dense:
            out = tuple(c.astype(vd) for c in out)
    return out


def _spectral_cg_generic(b, rho, x0, matvec, to_b, from_b, fwd, inv,
                         eigs_blocks, cbar, n_steps: int, counts_b,
                         vec_dtype=None, residual=None,
                         stack_elementwise: bool = False):
    """Fixed-step spectral-correction CG over tuple-of-blocks layouts.

    The mechanical core shared by the blocked (2^p halves) and quartered
    (4^p, depth-2 fast DCT) layouts: bf16 MXU transforms, f32 weights and
    CG vectors, dots = sums of blockwise dots (the layouts are
    reindexings of the orthonormal coefficients).

    Structured for XLA fusion at the HBM roofline (docs/MATH.md 5): the
    preconditioned residual z = r/w is never materialized — r'z is
    reduced directly from r^2/w (fuses into the r-update pass) and the
    direction update recomputes r/w in place (fuses into one
    read-{r,w,p} write-{p} pass) — and the final step skips the dead
    direction update entirely.  Identical arithmetic to the textbook
    form, two fewer lattice passes per step.

    stack_elementwise: stack all same-shaped blocks along a leading
    axis for the elementwise stages (one big fused kernel each), slicing
    back at the transform boundaries.  Kept for experimentation but OFF
    in production: at 256^3 it measured SLOWER (5.98 vs 5.21 ms per
    x-update) — the stack/unstack copies at each transform boundary cost
    more than the per-block launch overheads they remove."""
    from multivartv_tpu.solver.cg import _poison_if_nonfinite
    f32 = jnp.float32
    eps = jnp.asarray(1e-30, f32)
    vd = b.dtype if vec_dtype is None else vec_dtype

    def bmap(f, *ts):
        return tuple(f(*xs) for xs in zip(*ts))

    if stack_elementwise:
        nblk = len(eigs_blocks)
        E = jnp.stack([e.astype(f32) for e in eigs_blocks])
        W = cbar + rho * E
        C = jnp.stack(counts_b)

        def unstack(S):
            return tuple(S[i] for i in range(nblk))

        r0 = residual(b, x0) if residual is not None else b - matvec(x0)
        rh = jnp.stack(fwd(bmap(lambda v: v.astype(vd), to_b(r0))))
        p = (rh.astype(f32) / W).astype(vd)
        rz = jnp.sum(jnp.square(rh.astype(f32)) / W)
        xh = jnp.zeros_like(rh)
        for step in range(n_steps):
            f = jnp.stack(fwd(bmap(
                lambda c, v: (c * v.astype(c.dtype)).astype(vd),
                unstack(C), inv(unstack(p)))))
            ap = (f.astype(f32) + rho * E * p.astype(f32)).astype(vd)
            pap = jnp.sum(p.astype(f32) * ap.astype(f32))
            alpha_cg = rz / jnp.maximum(pap, eps)
            xh = (xh.astype(f32) + alpha_cg * p.astype(f32)).astype(vd)
            rh = (rh.astype(f32) - alpha_cg * ap.astype(f32)).astype(vd)
            rz_new = jnp.sum(jnp.square(rh.astype(f32)) / W)
            if step + 1 < n_steps:
                beta = rz_new / jnp.maximum(rz, eps)
                p = (rh.astype(f32) / W + beta * p.astype(f32)).astype(vd)
            rz = rz_new
        x = x0 + from_b(inv(unstack(xh))).astype(x0.dtype)
        return (_poison_if_nonfinite(x, rz), jnp.asarray(n_steps, jnp.int32))

    def bdot(a, c):
        # f32 accumulation regardless of vector storage dtype.
        return sum(jnp.sum(x.astype(f32) * y.astype(f32))
                   for x, y in zip(a, c))

    def wdot(a):
        # sum(a^2 / w) in f32 (the preconditioned residual norm r'z,
        # reduced without materializing z).
        return sum(jnp.sum(jnp.square(x.astype(f32))
                           / (cbar + rho * e.astype(f32)))
                   for x, e in zip(a, eigs_blocks))

    r0 = residual(b, x0) if residual is not None else b - matvec(x0)
    rh = fwd(bmap(lambda v: v.astype(vd), to_b(r0)))
    p = bmap(lambda r, e: (r.astype(f32)
                           / (cbar + rho * e)).astype(vd), rh, eigs_blocks)
    rz = wdot(rh)
    xh = bmap(jnp.zeros_like, rh)
    for step in range(n_steps):
        ap = bmap(lambda f, e, pp: (f.astype(f32) + rho * e
                                    * pp.astype(f32)).astype(vd),
                  fwd(bmap(lambda c, v: (c * v.astype(c.dtype)).astype(vd),
                           counts_b, inv(p))),
                  eigs_blocks, p)
        alpha_cg = rz / jnp.maximum(bdot(p, ap), eps)
        xh = bmap(lambda x_, pp: (x_.astype(f32) + alpha_cg
                                  * pp.astype(f32)).astype(vd), xh, p)
        rh = bmap(lambda r, a: (r.astype(f32) - alpha_cg
                                * a.astype(f32)).astype(vd), rh, ap)
        rz_new = wdot(rh)
        if step + 1 < n_steps:
            beta = rz_new / jnp.maximum(rz, eps)
            p = bmap(lambda r, e, pp: (r.astype(f32) / (cbar + rho * e)
                                       + beta * pp.astype(f32)).astype(vd),
                     rh, eigs_blocks, p)
        rz = rz_new
    x = x0 + from_b(inv(xh)).astype(x0.dtype)
    return (_poison_if_nonfinite(x, rz), jnp.asarray(n_steps, jnp.int32))


def _spectral_cg_blocked(ops: Operators, counts, b, rho, x0, matvec,
                         cbar, n_steps: int, counts_blocked=None,
                         vec_dtype=None, residual=None):
    """Spectral-correction CG in the blocked (2^p halves) layout."""
    p_dims = len(ops.m)
    halves = ops.dct_halves_lp or ops.dct_halves
    counts_b = (counts_blocked if counts_blocked is not None
                else dct_ops.to_blocks(counts, p_dims))
    eigs = ops.gram_eigs_blocked
    if vec_dtype is not None and ops.gram_eigs_blocked_lp is not None:
        # bf16-vector regime: the eigenvalue blocks are pure elementwise
        # operands (operator correction + preconditioner), so their bf16
        # copies halve a ~10-reads-per-solve f32 stream (Operators
        # docstring for the exactness argument).
        eigs = ops.gram_eigs_blocked_lp
    return _spectral_cg_generic(
        b, rho, x0, matvec,
        to_b=lambda v: dct_ops.to_blocks(v, p_dims),
        from_b=lambda v: dct_ops.from_blocks(v, p_dims),
        fwd=lambda v: dct_ops.dctn_blocked(v, halves),
        inv=lambda v: dct_ops.idctn_blocked(v, halves),
        eigs_blocks=eigs, cbar=cbar, n_steps=n_steps,
        counts_b=counts_b, vec_dtype=vec_dtype, residual=residual)


def _spectral_cg_quartered(ops: Operators, counts, b, rho, x0, matvec,
                           cbar, n_steps: int, counts_blocked=None,
                           vec_dtype=None, residual=None):
    """Spectral-correction CG in the quartered (depth-2 fast DCT)
    layout — half the MXU FLOPs per transform."""
    p_dims = len(ops.m)
    quarters = ops.dct_quarters_lp
    counts_b = (counts_blocked if counts_blocked is not None
                else dct_ops.to_blocks4(counts, p_dims))
    eigs = ops.gram_eigs_quartered
    if vec_dtype is not None and ops.gram_eigs_quartered_lp is not None:
        eigs = ops.gram_eigs_quartered_lp   # see _spectral_cg_blocked
    return _spectral_cg_generic(
        b, rho, x0, matvec,
        to_b=lambda v: dct_ops.to_blocks4(v, p_dims),
        from_b=lambda v: dct_ops.from_blocks4(v, p_dims),
        fwd=lambda v: dct_ops.dctn_quartered(v, quarters),
        inv=lambda v: dct_ops.idctn_quartered(v, quarters),
        eigs_blocks=eigs, cbar=cbar, n_steps=n_steps,
        counts_b=counts_b, vec_dtype=vec_dtype, residual=residual)


def solve_x(ops: Operators, counts: jax.Array, cbar: jax.Array,
            b: jax.Array, rho: jax.Array, x0: jax.Array,
            cfg: SolverConfig, use_pallas: bool = False,
            counts_blocked=None,
            tiled_ok: bool = False,
            tiled3_ok: bool = False,
            shard_key=None,
            rhs_parts=None) -> Tuple[jax.Array, jax.Array]:
    """Returns (theta, cg_iters).

    counts_blocked: optional precomputed blocked layout of counts (loop-
    invariant — callers running solve_x inside the ADMM while_loop hoist
    the conversion out of the body instead of paying it per iteration).
    tiled_ok: caller attests it is NOT under vmap and the lattice passes
    the tiled-kernel gate, so the Gram matvec may stream through the
    row-panel Pallas kernel (unfused jnp rolls measured ~10x the
    unavoidable traffic at 4096^2).
    shard_key: row-sharded tiled-kernel mode (parallel/tiled_shard.py) —
    the spectral CG's initial residual streams through the shard_map
    gram-residual kernel.
    rhs_parts = (oty, dta, u_scale, dtu) (r5, adjoint-carry routes):
    fuse b = oty + rho (dta + u_scale dtu) into the streamed gram-
    residual kernel.  r0 is b's only consumer on the spectral-CG paths,
    so the passed-in b becomes dead and XLA removes its materialization;
    non-kernel fallthroughs (packed layout, tridiag, dct_direct) keep
    consuming the real b."""

    if tiled_ok:
        from multivartv_tpu.ops import pallas_kernels as pk
        from multivartv_tpu.solver import admm as admm_mod

        def matvec(v):
            return pk.gram_matvec_tiled_2d(
                v, counts, rho, ops.scales,
                interpret=admm_mod.FORCE_FUSED_INTERPRET)

        def residual(bb, v):
            # r0 = b - A v with the subtraction fused into the streamed
            # gram kernel (one pass instead of matvec + subtract); with
            # rhs_parts, b's own assembly fuses in too.
            return pk.gram_residual_tiled_2d(
                bb, v, counts, rho, ops.scales, rhs_parts=rhs_parts,
                interpret=admm_mod.FORCE_FUSED_INTERPRET)
    elif tiled3_ok:
        from multivartv_tpu.ops import pallas_kernels as pk
        from multivartv_tpu.solver import admm as admm_mod

        def matvec(v):
            return counts * v + rho * ops.apply_gram(v)

        def residual(bb, v):
            return pk.gram_residual_tiled_3d(
                bb, v, counts, rho, ops.scales, rhs_parts=rhs_parts,
                interpret=admm_mod.FORCE_FUSED_INTERPRET)
    elif shard_key is not None:
        from multivartv_tpu.parallel import tiled_shard as ts_mod
        from multivartv_tpu.solver import admm as admm_mod

        def matvec(v):
            return counts * v + rho * ops.apply_gram(v)

        def residual(bb, v):
            return ts_mod.gram_residual_tiled_2d_sharded(
                shard_key, bb, v, counts, rho, ops.scales,
                rhs_parts=rhs_parts,
                interpret=admm_mod.FORCE_FUSED_INTERPRET)
    else:
        def matvec(v):
            return counts * v + rho * ops.apply_gram(v)

        residual = None

    if cfg.x_solver == "dct_direct":
        x = dct_ops.shifted_solve(b, cbar, rho, ops.gram_eigs, ops.dct_mats)
        return x, jnp.zeros((), jnp.int32)

    from multivartv_tpu.solver import tridiag as tri
    if tri.tridiag_applies(ops, cfg):
        # p = 1: the system is tridiagonal — solved EXACTLY by cyclic
        # reduction (solver/tridiag.py), any n, no padding, no CG.  This
        # is the m = N fused-lasso regime's production path (vignette
        # MultivarTV-intro.Rmd:111-118); vmappable, so batched CV folds
        # ride it too.
        x = tri.xupdate_tridiag(counts, b, rho, ops.scales[0])
        return x, jnp.zeros((), jnp.int32)

    if use_pallas and cfg.x_solver == "dct_pcg" and ops.dct_mats is not None:
        from multivartv_tpu.ops import pallas_kernels as pk
        from multivartv_tpu.solver.cg import _poison_if_nonfinite
        eigs = ops.gram_eigs
        mats = ops.dct_mats
        n_steps = cfg.cg_fixed_iters if cfg.cg_fixed_iters is not None else 3

        if pk.xupdate_supported(ops.m, ops.binaries):
            # The entire PCG solve in ONE kernel: CG vectors stay
            # VMEM-resident, DCT transforms run as MXU matmuls in-kernel.
            if ops.dct_halves is not None:
                # Folded DCT: half the matmul FLOPs (ops/dct.py).
                x, rsq = pk.xupdate_pcg_2d_packed(
                    b, x0, counts, ops.dct_halves, ops.gram_eigs_packed,
                    rho, cbar, ops.scales, n_steps)
            else:
                x, rsq = pk.xupdate_pcg_2d(b, x0, counts, mats, eigs, rho,
                                           cbar, ops.scales, n_steps)
            return (_poison_if_nonfinite(x, rsq),
                    jnp.asarray(n_steps, jnp.int32))

        def matvec_dot(v):
            return pk.gram_matvec_2d(v, counts, rho, ops.scales)

        if cfg.precond_bf16:
            mats_lp = tuple(t.astype(jnp.bfloat16) for t in mats)

            def precond_dot(r):
                rhat = dct_ops.dctn_mat(
                    r.astype(jnp.bfloat16), mats_lp).astype(r.dtype)
                w = cbar + rho * eigs
                zhat = rhat / w
                rz = jnp.sum(rhat * zhat)
                z = dct_ops.idctn_mat(
                    zhat.astype(jnp.bfloat16), mats_lp).astype(r.dtype)
                return z, rz
        else:
            def precond_dot(r):
                rhat = dct_ops.dctn_mat(r, mats)
                w = cbar + rho * eigs
                zhat = rhat / w
                rz = jnp.sum(rhat * zhat)
                return dct_ops.idctn_mat(zhat, mats), rz

        res = pcg_fused(matvec_dot, precond_dot, b, x0, n_iters=n_steps)
        return res.x, res.iters

    if cfg.x_solver == "dct_pcg" and _xla_packed_applies(ops, cfg):
        halves = ops.dct_halves
        eigs_packed = ops.gram_eigs_packed
        w = cbar + rho * eigs_packed
        n_steps = cfg.cg_fixed_iters if cfg.cg_fixed_iters is not None else 3
        md = jnp.bfloat16

        def fwd(v):
            return dct_ops.dctn_packed(v, halves, mat_dtype=md)

        def inv(v):
            return dct_ops.idctn_packed(v, halves, mat_dtype=md)

        if cfg.spectral_cg:
            # CG in the SPECTRAL domain, as a CORRECTION solve: A-hat =
            # F diag(counts) F' + rho Lambda, so the Gram matvec is a
            # diagonal multiply (no stencil passes) and the preconditioner
            # a pure diagonal scale — at 2048^2+ the stencil/elementwise
            # HBM traffic, not the MXU transforms, is the wall.  The
            # initial residual r0 = b - A x0 is formed EXACTLY in f32 in
            # the natural domain (one stencil matvec, vs four on the
            # plain-PCG path) and the correction dx solved spectrally from
            # zero: the bf16 transform error then scales with ||dx|| —
            # which shrinks as ADMM converges — not with ||x||, so the
            # Boyd residuals keep their f32 floor (iterative-refinement
            # structure).  Dots are preserved by the orthonormal
            # transform, so CG scalars live on spectral vectors directly.
            #
            # Layout choice (spectral_layout): QUARTERED (depth-2 fast
            # DCT, half the MXU FLOPs — the transforms measured AT the
            # MXU roofline at 2048^2+) > BLOCKED (concat-free folds,
            # half-width >= 128) > PACKED (small axes, where 2^p
            # half-size matmuls under-utilize the 128-lane MXU tile:
            # 128^3 measured 536 vs 712 iters/s blocked vs packed).
            lay = spectral_layout(ops)
            vd = spectral_vec_dtype(ops, cfg)
            if lay == "quartered":
                return _spectral_cg_quartered(
                    ops, counts, b, rho, x0, matvec, cbar, n_steps,
                    counts_blocked=counts_blocked, vec_dtype=vd,
                    residual=residual)
            if lay == "blocked":
                return _spectral_cg_blocked(ops, counts, b, rho, x0, matvec,
                                            cbar, n_steps,
                                            counts_blocked=counts_blocked,
                                            vec_dtype=vd,
                                            residual=residual)
            return _spectral_cg_packed(ops, counts, b, rho, x0, matvec,
                                       w, eigs_packed, fwd, inv, n_steps)

        def matvec_dot(v):
            av = matvec(v)
            return av, jnp.sum(v * av)

        def precond_dot(r):
            rhat = fwd(r)
            zhat = rhat / w
            rz = jnp.sum(rhat * zhat)
            return inv(zhat), rz

        res = pcg_fused(matvec_dot, precond_dot, b, x0, n_iters=n_steps)
        return res.x, res.iters

    if cfg.x_solver == "dct_pcg":
        eigs = ops.gram_eigs
        mats = ops.dct_mats

        def precond(r):
            if mats is not None:
                return dct_ops.idctn_mat(
                    dct_ops.dctn_mat(r, mats) / (cbar + rho * eigs), mats)
            return dct_ops.idctn(dct_ops.dctn(r) / (cbar + rho * eigs))

    elif cfg.x_solver == "jacobi_pcg":
        inv_diag = 1.0 / (counts + rho * ops.gram_diagonal + 1e-30)

        def precond(r):
            return inv_diag * r

    else:  # "cg"
        precond = None

    if cfg.cg_fixed_iters is not None:
        res = pcg_fixed(matvec, b, x0, precond=precond,
                        n_iters=cfg.cg_fixed_iters)
    else:
        res = pcg(matvec, b, x0, precond=precond,
                  tol=cfg.cg_tol, max_iters=cfg.cg_max_iters)
    return res.x, res.iters
