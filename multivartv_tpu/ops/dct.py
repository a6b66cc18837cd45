"""DCT diagonalization of the difference Gram D'D.

Replaces the reference's sparse direct solve of (O'O + rho D'D) — SuperLU
inside every ADMM iteration (solvers.cpp:113) / cached splu per lambda
(code/solvers.py:133) — with spectral identities:

Each single-axis difference Gram Delta'Delta is the 1-D Neumann Laplacian
(tridiag [-1, 2, -1] with unit corners), whose eigenvectors are the DCT-II
basis with eigenvalues mu_k = 4 sin^2(pi k / (2 m)).  Since every block of
D is a Kronecker product of such factors (see ops/diff.py), the *entire*
stacked Gram is diagonalized by the p-dim DCT-II:

    dctn(D'D theta) = Lambda * dctn(theta)
    Lambda(k) = sum_{b != 0} prod_j [ deltas_j^2   if b_j = 0
                                      mu_{j,k_j}   if b_j = 1 ]
              = prod_j (deltas_j^2 + mu_{j,k_j}) - prod_j deltas_j^2

(with the C++ block set including the all-ones binary; dropping it — the
reference-Python variant — subtracts prod_j mu_{j,k_j}).

This yields an exact O(ntheta log ntheta) solve of (c I + rho D'D) x = b
for scalar c, used directly when O'O is a constant diagonal and as a
preconditioner for CG otherwise, and an *exact* pseudo-inverse of D'D for
the lambda_max estimate (reference approximates it with CG,
utils.cpp:306-355).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multivartv_tpu.ops.diff import Binary


def dctn(x: jax.Array) -> jax.Array:
    """Orthonormal DCT-II over all axes (FFT-based fallback path)."""
    return jax.scipy.fft.dctn(x, type=2, norm="ortho")


def idctn(x: jax.Array) -> jax.Array:
    """Orthonormal DCT-III (inverse of dctn) over all axes (FFT path)."""
    return jax.scipy.fft.idctn(x, type=2, norm="ortho")


# -- Matmul DCT: on TPU the MXU makes an O(n^2)-per-axis dense transform
# far faster than the FFT lowering for lattice sizes up to ~2048 (a 512^2
# 2-D DCT is two 512^3 matmuls ~ 0.5 GFLOP: microseconds on the MXU vs
# ~300us for the FFT path). ---------------------------------------------

def dct_matrix(n: int, dtype=jnp.float32) -> jax.Array:
    """Orthonormal DCT-II matrix T (T @ x == dct(x)): rows are the Neumann
    Laplacian eigenvectors cos(pi k (2i+1) / (2n))."""
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    t = np.cos(np.pi * k * (2.0 * i + 1.0) / (2.0 * n))
    t[0] *= np.sqrt(1.0 / n)
    t[1:] *= np.sqrt(2.0 / n)
    return jnp.asarray(t, dtype)


def dct_matrices(m: Sequence[int], dtype=jnp.float32) -> Tuple[jax.Array, ...]:
    return tuple(dct_matrix(int(n), dtype) for n in m)


def _cyclic_transform(x: jax.Array, mats: Sequence[jax.Array],
                      t_contract_dim: int) -> jax.Array:
    """Apply one matrix per trailing axis with NO physical transposes.

    Each step contracts the first non-batch axis of x against mats[j]
    (t_contract_dim 1 for the forward DCT-II, 0 for the inverse) — the
    contracted axis is consumed and the transformed axis appends last, so
    after len(mats) steps the trailing axes return to their original
    order.  All MXU work; no relayouts between steps.
    """
    nb = x.ndim - len(mats)
    for t in mats:
        x = jax.lax.dot_general(
            x, t,
            dimension_numbers=(((nb,), (t_contract_dim,)), ((), ())),
            preferred_element_type=x.dtype,
        )
    return x


def dctn_mat(x: jax.Array, mats: Sequence[jax.Array]) -> jax.Array:
    """Orthonormal DCT-II over all trailing axes via per-axis matmuls."""
    return _cyclic_transform(x, mats, 1)


def idctn_mat(x: jax.Array, mats: Sequence[jax.Array]) -> jax.Array:
    """Inverse (DCT-III) via the transposed matrices."""
    return _cyclic_transform(x, mats, 0)


# -- Folded (even/odd symmetric) DCT: HALF the matmul FLOPs. -------------
#
# The DCT-II matrix satisfies T[k, n-1-j] = (-1)^k T[k, j], so folding the
# input (s = top + flip(bottom), d = top - flip(bottom)) splits the dense
# (n x n) contraction into two (n/2 x n/2) contractions — 2x fewer MXU
# FLOPs per axis.  The spectrum is produced in PACKED order (even
# frequencies first, then odd); since the solver only ever applies
# elementwise spectral weights, the permutation is absorbed into the
# weight vector once (pack_spectrum) and never materialized.

def dct_packed_halves(n: int, dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """(Te, To): rows = even/odd DCT-II frequencies, columns = first n/2
    spatial points.  Requires even n."""
    assert n % 2 == 0
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    t = np.cos(np.pi * k * (2.0 * i + 1.0) / (2.0 * n))
    t[0] *= np.sqrt(1.0 / n)
    t[1:] *= np.sqrt(2.0 / n)
    h = n // 2
    return jnp.asarray(t[0::2, :h], dtype), jnp.asarray(t[1::2, :h], dtype)


def packed_order(n: int) -> np.ndarray:
    """Permutation taking natural frequency order -> packed (even, odd)."""
    return np.concatenate([np.arange(0, n, 2), np.arange(1, n, 2)])


def pack_spectrum(x: jax.Array) -> jax.Array:
    """Permute every axis of a spectral-domain array into packed order."""
    for ax in range(x.ndim):
        x = jnp.take(x, jnp.asarray(packed_order(x.shape[ax])), axis=ax)
    return x


def exchange_matrix(h: int, dtype=jnp.float32) -> jax.Array:
    """The h x h reversal permutation (symmetric, involutive).  Mosaic has
    no lane/sublane reversal primitive (lax.rev is unlowerable), so inside
    Pallas kernels the fold's flip runs as an MXU matmul with this matrix —
    a quarter of a dense axis transform, keeping the folded DCT at 0.75x
    the dense FLOPs instead of 0.5x."""
    return jnp.asarray(np.eye(h)[::-1].copy(), dtype)


def _flip0(x, flip_mat, md, out_dtype):
    """flip(x, axis=0) — jnp.flip off-kernel, exchange matmul in-kernel."""
    if flip_mat is None:
        return jnp.flip(x, axis=0)
    return jax.lax.dot_general(
        flip_mat.astype(md), x.astype(md), (((1,), (0,)), ((), ())),
        preferred_element_type=out_dtype)


def _flip1(x, flip_mat, md, out_dtype):
    """flip(x, axis=1) — jnp.flip off-kernel, exchange matmul in-kernel."""
    if flip_mat is None:
        return jnp.flip(x, axis=1)
    return jax.lax.dot_general(
        x.astype(md), flip_mat.astype(md), (((1,), (0,)), ((), ())),
        preferred_element_type=out_dtype)


def dct2_packed(v: jax.Array, halves0, halves1,
                mat_dtype=None, flips=None) -> jax.Array:
    """2-D DCT-II with packed-order output via folded half-size matmuls.

    halves{0,1} = dct_packed_halves(m{0,1}); when mat_dtype is bfloat16 the
    matmuls run on the MXU at the bf16 rate with f32 accumulation (folds
    stay f32 on the VPU).  Works identically inside Pallas kernels when
    flips=(R0, R1) exchange matrices are supplied (Mosaic cannot lower
    lax.rev; see exchange_matrix).
    """
    te0, to0 = halves0
    te1, to1 = halves1
    dtype = v.dtype
    h0 = v.shape[0] // 2
    h1 = v.shape[1] // 2
    md = mat_dtype or te0.dtype
    f0 = flips[0] if flips is not None else None
    f1 = flips[1] if flips is not None else None

    top, bot = v[:h0], _flip0(v[h0:], f0, md, dtype)
    s0 = (top + bot).astype(md)
    d0 = (top - bot).astype(md)
    tmp = jnp.concatenate([
        jax.lax.dot_general(te0.astype(md), s0, (((1,), (0,)), ((), ())),
                            preferred_element_type=dtype),
        jax.lax.dot_general(to0.astype(md), d0, (((1,), (0,)), ((), ())),
                            preferred_element_type=dtype),
    ], axis=0)
    left, right = tmp[:, :h1], _flip1(tmp[:, h1:], f1, md, dtype)
    s1 = (left + right).astype(md)
    d1 = (left - right).astype(md)
    return jnp.concatenate([
        jax.lax.dot_general(s1, te1.astype(md), (((1,), (1,)), ((), ())),
                            preferred_element_type=dtype),
        jax.lax.dot_general(d1, to1.astype(md), (((1,), (1,)), ((), ())),
                            preferred_element_type=dtype),
    ], axis=1)


def idct2_packed(y: jax.Array, halves0, halves1,
                 mat_dtype=None, flips=None) -> jax.Array:
    """Inverse of dct2_packed (packed-order input, natural-order output)."""
    te0, to0 = halves0
    te1, to1 = halves1
    dtype = y.dtype
    h0 = y.shape[0] // 2
    h1 = y.shape[1] // 2
    md = mat_dtype or te0.dtype
    f0 = flips[0] if flips is not None else None
    f1 = flips[1] if flips is not None else None

    ye = y[:h0].astype(md)
    yo = y[h0:].astype(md)
    a = jax.lax.dot_general(te0.astype(md), ye, (((0,), (0,)), ((), ())),
                            preferred_element_type=dtype)
    b = jax.lax.dot_general(to0.astype(md), yo, (((0,), (0,)), ((), ())),
                            preferred_element_type=dtype)
    x = jnp.concatenate([a + b, _flip0(a - b, f0, md, dtype)], axis=0)
    xe = x[:, :h1].astype(md)
    xo = x[:, h1:].astype(md)
    aa = jax.lax.dot_general(xe, te1.astype(md), (((1,), (0,)), ((), ())),
                             preferred_element_type=dtype)
    bb = jax.lax.dot_general(xo, to1.astype(md), (((1,), (0,)), ((), ())),
                             preferred_element_type=dtype)
    return jnp.concatenate([aa + bb, _flip1(aa - bb, f1, md, dtype)],
                           axis=1)


def dctn_packed(x: jax.Array, halves, mat_dtype=None) -> jax.Array:
    """p-dim DCT-II over the trailing len(halves) axes via folded half-size
    matmuls, PACKED (even, odd) frequency order along every transformed
    axis (generalizes dct2_packed to any p; off-kernel, so the fold's flip
    is a free jnp.flip).

    Each axis is folded (s = top + flip(bottom), d = top - flip(bottom))
    and contracted against the (n/2 x n/2) even/odd half matrices — half
    the MXU FLOPs of the dense transform.  Contractions consume the first
    non-batch axis and append the transformed axis last (the cyclic
    no-transpose trick of _cyclic_transform), so after p axes the layout
    is restored.  Spectral weights must be in packed order
    (pack_spectrum).  mat_dtype=bfloat16 runs the matmuls at the MXU bf16
    rate with f32 accumulation; folds and outputs stay in x.dtype.
    """
    nb = x.ndim - len(halves)
    dtype = x.dtype
    for te, to in halves:
        h = x.shape[nb] // 2
        assert 2 * h == x.shape[nb], (
            f"dctn_packed needs even axes, got {x.shape[nb]}")
        md = mat_dtype or te.dtype
        top = jax.lax.slice_in_dim(x, 0, h, axis=nb)
        bot = jnp.flip(jax.lax.slice_in_dim(x, h, 2 * h, axis=nb), axis=nb)
        s = (top + bot).astype(md)
        d = (top - bot).astype(md)
        e = jax.lax.dot_general(s, te.astype(md),
                                (((nb,), (1,)), ((), ())),
                                preferred_element_type=dtype)
        o = jax.lax.dot_general(d, to.astype(md),
                                (((nb,), (1,)), ((), ())),
                                preferred_element_type=dtype)
        x = jnp.concatenate([e, o], axis=-1)
    return x


def idctn_packed(y: jax.Array, halves, mat_dtype=None) -> jax.Array:
    """Inverse of dctn_packed: packed-order input, natural-order output."""
    nb = y.ndim - len(halves)
    dtype = y.dtype
    for te, to in halves:
        h = y.shape[nb] // 2
        assert 2 * h == y.shape[nb], (
            f"idctn_packed needs even axes, got {y.shape[nb]}")
        md = mat_dtype or te.dtype
        ye = jax.lax.slice_in_dim(y, 0, h, axis=nb).astype(md)
        yo = jax.lax.slice_in_dim(y, h, 2 * h, axis=nb).astype(md)
        a = jax.lax.dot_general(ye, te.astype(md),
                                (((nb,), (0,)), ((), ())),
                                preferred_element_type=dtype)
        b = jax.lax.dot_general(yo, to.astype(md),
                                (((nb,), (0,)), ((), ())),
                                preferred_element_type=dtype)
        y = jnp.concatenate([a + b, jnp.flip(a - b, axis=-1)], axis=-1)
    return y


# -- Blocked (concat-free) packed transforms. ----------------------------
#
# dctn_packed/idctn_packed pay a full-array concatenate copy per axis per
# transform — at 2048^2+ those copies, not the MXU matmuls, are the
# measured wall (HBM-bandwidth-bound regime).  The blocked layout removes
# them: an array is carried as a tuple of 2^p half-size blocks, indexed by
# a bits integer b where bit j (big-endian over axes, like ops/diff
# binaries) selects
#
#   natural layout:  0 = first half of axis j, 1 = SECOND half FLIPPED
#   spectral layout: 0 = even frequencies of axis j, 1 = odd frequencies
#
# In this layout the DCT fold (s = top + flip(bottom), d = top - flip(
# bottom)) is pure elementwise block arithmetic, each axis transform is a
# pair of half-size MXU matmuls per block pair, and NO concatenate exists
# anywhere: layout conversion (to_blocks/from_blocks, one copy each)
# happens only at the x-update boundary, never inside the CG loop.
# Elementwise ops (spectral weights, CG updates, counts multiply) apply
# blockwise; dots are sums of blockwise dots (the layout is a reindexing
# of the orthonormal-transform coefficients).

def _bit(bits: int, j: int, p: int) -> int:
    return (bits >> (p - 1 - j)) & 1


def to_blocks(x: jax.Array, p: int) -> Tuple[jax.Array, ...]:
    """Natural p-axis array -> 2^p natural-layout blocks (trailing p axes
    halved; leading axes are batch).  One full-array copy."""
    nb = x.ndim - p
    blocks = [x]
    for j in range(p):
        ax = nb + j
        new = []
        for a in blocks:
            h = a.shape[ax] // 2
            assert 2 * h == a.shape[ax], (
                f"to_blocks needs even axes, got {a.shape[ax]}")
            new.append(jax.lax.slice_in_dim(a, 0, h, axis=ax))
            new.append(jnp.flip(
                jax.lax.slice_in_dim(a, h, 2 * h, axis=ax), axis=ax))
        blocks = new
    return tuple(blocks)


def from_blocks(blocks: Tuple[jax.Array, ...], p: int) -> jax.Array:
    """Inverse of to_blocks (one full-array copy)."""
    blocks = list(blocks)
    for j in reversed(range(p)):
        ax = blocks[0].ndim - p + j
        new = []
        for i in range(0, len(blocks), 2):
            top, botf = blocks[i], blocks[i + 1]
            new.append(jnp.concatenate(
                [top, jnp.flip(botf, axis=ax)], axis=ax))
        blocks = new
    return blocks[0]


def blocked_spectrum(eigs: jax.Array) -> Tuple[jax.Array, ...]:
    """Natural-frequency-order spectral array (shape m) -> blocked layout
    (2^p blocks of shape m/2): per axis, bit 0 keeps even frequencies,
    bit 1 odd.  Host-side one-time prep for spectral weights."""
    p = eigs.ndim
    blocks = [eigs]
    for j in range(p):
        new = []
        for a in blocks:
            idx_e = jnp.arange(0, a.shape[j], 2)
            idx_o = jnp.arange(1, a.shape[j], 2)
            new.append(jnp.take(a, idx_e, axis=j))
            new.append(jnp.take(a, idx_o, axis=j))
        blocks = new
    return tuple(blocks)


def dctn_blocked(blocks: Tuple[jax.Array, ...], halves,
                 mat_dtype=None) -> Tuple[jax.Array, ...]:
    """Natural-layout blocks -> spectral-layout blocks.  Cyclic axis
    consumption (contract axis nb, append transformed axis last) exactly
    like dctn_packed, but per block pair and with zero concatenates."""
    p = len(halves)
    nb = blocks[0].ndim - p
    cur = list(blocks)
    dtype = blocks[0].dtype
    for j, (te, to) in enumerate(halves):
        md = mat_dtype or te.dtype
        tem, tom = te.astype(md), to.astype(md)
        new = [None] * len(cur)
        for b0 in range(len(cur)):
            if _bit(b0, j, p):
                continue
            b1 = b0 | (1 << (p - 1 - j))
            a0, a1 = cur[b0], cur[b1]
            s = (a0 + a1).astype(md)
            d = (a0 - a1).astype(md)
            new[b0] = jax.lax.dot_general(
                s, tem, (((nb,), (1,)), ((), ())),
                preferred_element_type=dtype)
            new[b1] = jax.lax.dot_general(
                d, tom, (((nb,), (1,)), ((), ())),
                preferred_element_type=dtype)
        cur = new
    return tuple(cur)


def idctn_blocked(blocks: Tuple[jax.Array, ...], halves,
                  mat_dtype=None) -> Tuple[jax.Array, ...]:
    """Spectral-layout blocks -> natural-layout blocks (inverse of
    dctn_blocked; same cyclic axis order, zero concatenates)."""
    p = len(halves)
    nb = blocks[0].ndim - p
    cur = list(blocks)
    dtype = blocks[0].dtype
    for j, (te, to) in enumerate(halves):
        md = mat_dtype or te.dtype
        tem, tom = te.astype(md), to.astype(md)
        new = [None] * len(cur)
        for b0 in range(len(cur)):
            if _bit(b0, j, p):
                continue
            b1 = b0 | (1 << (p - 1 - j))
            a = jax.lax.dot_general(
                cur[b0].astype(md), tem, (((nb,), (0,)), ((), ())),
                preferred_element_type=dtype)
            bb = jax.lax.dot_general(
                cur[b1].astype(md), tom, (((nb,), (0,)), ((), ())),
                preferred_element_type=dtype)
            new[b0] = a + bb      # top half
            new[b1] = a - bb      # bottom half, flipped (natural layout)
        cur = new
    return tuple(cur)


def neumann_eigenvalues(n: int, dtype=jnp.float32) -> jax.Array:
    """Eigenvalues of the 1-D Neumann Laplacian Delta'Delta of size n."""
    k = jnp.arange(n, dtype=dtype)
    return 4.0 * jnp.square(jnp.sin(jnp.pi * k / (2.0 * n)))


def gram_eigenvalues(m: Sequence[int], deltas: jax.Array,
                     include_full_mixed: bool = True,
                     dtype=jnp.float32) -> jax.Array:
    """Lambda(k): eigenvalues of the stacked Gram D'D on the DCT-II basis,
    shape m.  Lambda(0) = 0 *exactly* (constants are the nullspace).

    Naively Lambda = prod_j(d_j^2 + mu_j) - prod_j d_j^2 (minus prod_j mu_j
    for the reference-Python block set), but that cancels catastrophically
    in float32 near k = 0 and corrupts the pseudo-inverse.  Instead the
    subset sum  sum_{b in S} prod_j [d_j^2 if b_j=0 else mu_j]  is built by
    an additive recurrence over axes with no subtraction:
      full-mixed set S = nonempty subsets:
        s <- s*(d^2 + mu) + z*mu ;  z <- z*d^2
      proper set S = nonempty, not-all-ones (p > 1):
        s <- s*(d^2 + mu) + z*mu + o*d^2 ;  z <- z*d^2 ;  o <- o*mu
      (the z*mu term only applies once the prefix is nonempty-capable,
       i.e. from the second axis on in the proper case).
    """
    m = tuple(int(v) for v in m)
    p = len(m)

    def axis_mu(j):
        mu = neumann_eigenvalues(m[j], dtype)
        shape = [1] * p
        shape[j] = m[j]
        return mu.reshape(shape)

    d2s = [jnp.square(deltas[j]).astype(dtype) for j in range(p)]

    if include_full_mixed or p == 1:
        s = jnp.zeros((1,) * p, dtype)
        z = jnp.ones((), dtype)
        for j in range(p):
            mu = axis_mu(j)
            s = s * (d2s[j] + mu) + z * mu
            z = z * d2s[j]
        return s

    # Proper subsets (nonempty, not all-ones): reference-Python block set.
    mu0 = axis_mu(0)
    s = jnp.zeros((1,) * p, dtype)      # no proper subset of one axis
    z = d2s[0] * jnp.ones((1,) * p, dtype)
    o = mu0
    for j in range(1, p):
        mu = axis_mu(j)
        s = s * (d2s[j] + mu) + z * mu + o * d2s[j]
        z = z * d2s[j]
        o = o * mu
    return s


def shifted_solve(b: jax.Array, c: jax.Array, rho: jax.Array,
                  gram_eigs: jax.Array, mats=None) -> jax.Array:
    """Exact solve of (c I + rho D'D) x = b via DCT (c scalar > 0)."""
    if mats is not None:
        return idctn_mat(dctn_mat(b, mats) / (c + rho * gram_eigs), mats)
    return idctn(dctn(b) / (c + rho * gram_eigs))


def gram_pinv_apply(b: jax.Array, gram_eigs: jax.Array, mats=None) -> jax.Array:
    """Exact (D'D)^+ b via DCT: invert nonzero eigenvalues, kill the
    constant mode.  Reference approximates this with truncated CG
    (mypinv/cg, utils.cpp:306-349)."""
    coeffs = dctn_mat(b, mats) if mats is not None else dctn(b)
    safe = jnp.where(gram_eigs > 0, gram_eigs, 1.0)
    inv = jnp.where(gram_eigs > 0, coeffs / safe, 0.0)
    return idctn_mat(inv, mats) if mats is not None else idctn(inv)


# -- Depth-2 fast folded DCT ("quartered" layout): HALF the MXU FLOPs of
# the folded transform. --------------------------------------------------
#
# One more recursion level on top of the even/odd fold:
#   DCT-II(n) --fold--> [DCT-II(n/2) on s,  DCT-IV(n/2) on d]
#   DCT-II(n/2)  --fold-->    [DCT-II(q) on ss, DCT-IV(q) on sd],  q = n/4
#   DCT-IV(n/2)  --rotation-> [DCT-II(q) on u,  DST-II(q) on v]
# where the DCT-IV split is the Givens-rotation identity (validated
# numerically to 1e-14, see tests):
#   u_j = cos(t_j) d_j + sin(t_j) d_{h-1-j},  t_j = pi(2j+1)/(4h)
#   v_j = sin(t_j) d_j - cos(t_j) d_{h-1-j}
#   X4_{2t} = ce_t - se_{t-1},  X4_{2t+1} = ce_{t+1} + se_t
#   ce = DCT-II(q) u (ce_q := 0),   se = DST-II(q) v
# and DST-II(q) = flip_rows(DCT-II(q) . diag((-1)^j)).
#
# Per axis: 4 matmuls of (q x q) = n^2/4 MACs, vs n^2/2 for the single
# fold — 2x fewer MXU FLOPs, the dominant cost of the spectral CG at
# 2048^2+ (the folded transforms measured AT the MXU roofline there).
#
# Layout: each axis splits into FOUR blocks.  Natural ("M") layout:
#   M0 = x[0:q],  M1 = flip(x[q:2q]),  M2 = x[2q:3q],  M3 = flip(x[3q:4q])
# chosen so both fold levels AND the rotation pairing become pure
# elementwise block arithmetic (no flips inside the loop).  Spectral
# layout: [EE, EO, OE, OO] with frequency patterns k mod 4 = (0, 2, 1, 3).

QUARTER_FREQ_PATTERN = (0, 2, 1, 3)


def _dct2_kernel_np(n: int) -> np.ndarray:
    k = np.arange(n)[:, None].astype(np.float64)
    j = np.arange(n)[None, :].astype(np.float64)
    return np.cos(np.pi * k * (2.0 * j + 1.0) / (2.0 * n))


def _dct4_kernel_np(n: int) -> np.ndarray:
    k = np.arange(n)[:, None].astype(np.float64)
    j = np.arange(n)[None, :].astype(np.float64)
    return np.cos(np.pi * (2.0 * k + 1.0) * (2.0 * j + 1.0) / (4.0 * n))


def dct_quarter_mats(n: int, dtype=jnp.float32):
    """Per-axis operands of the depth-2 fast DCT: (C2q, V4q, C2qf, c1,
    s1, alt, w) — matmul kernels are stored CONTRACTION-ready (columns =
    input), w = the 4 orthonormalization weight vectors in block order."""
    assert n % 4 == 0, f"quartered DCT needs n % 4 == 0, got {n}"
    q = n // 4
    h = n // 2
    C2q = _dct2_kernel_np(q)
    V4q = _dct4_kernel_np(q)
    C2qf = C2q[::-1, :].copy()
    th = np.pi * (2.0 * np.arange(q) + 1.0) / (4.0 * h)
    c1 = np.cos(th)
    s1 = np.sin(th)
    alt = (-1.0) ** np.arange(q)
    wn = np.full(n, np.sqrt(2.0 / n))
    wn[0] = np.sqrt(1.0 / n)
    w = tuple(jnp.asarray(wn[p::4], dtype) for p in QUARTER_FREQ_PATTERN)
    return (jnp.asarray(C2q, dtype), jnp.asarray(V4q, dtype),
            jnp.asarray(C2qf, dtype), jnp.asarray(c1, dtype),
            jnp.asarray(s1, dtype), jnp.asarray(alt, dtype), w)


def to_blocks4(x: jax.Array, p: int) -> Tuple[jax.Array, ...]:
    """Natural p-axis array -> 4^p M-layout blocks (trailing p axes
    quartered; digit order per axis: M0, M1, M2, M3 as defined above).
    One full-array copy."""
    nb = x.ndim - p
    blocks = [x]
    for j in range(p):
        ax = nb + j
        new = []
        for a in blocks:
            n = a.shape[ax]
            assert n % 4 == 0
            q = n // 4
            qs = [jax.lax.slice_in_dim(a, i * q, (i + 1) * q, axis=ax)
                  for i in range(4)]
            new += [qs[0], jnp.flip(qs[1], axis=ax), qs[2],
                    jnp.flip(qs[3], axis=ax)]
        blocks = new
    return tuple(blocks)


def from_blocks4(blocks: Tuple[jax.Array, ...], p: int) -> jax.Array:
    """Inverse of to_blocks4 (one full-array copy)."""
    blocks = list(blocks)
    for j in reversed(range(p)):
        ax = blocks[0].ndim - p + j
        new = []
        for i in range(0, len(blocks), 4):
            m0, m1, m2, m3 = blocks[i:i + 4]
            new.append(jnp.concatenate(
                [m0, jnp.flip(m1, axis=ax), m2, jnp.flip(m3, axis=ax)],
                axis=ax))
        blocks = new
    return blocks[0]


def quartered_spectrum(eigs: jax.Array) -> Tuple[jax.Array, ...]:
    """Natural-frequency-order spectral array -> quartered layout (4^p
    blocks; per-axis digit d keeps frequencies k = QUARTER_FREQ_PATTERN[d]
    mod 4)."""
    p = eigs.ndim
    blocks = [eigs]
    for j in range(p):
        new = []
        for a in blocks:
            for pat in QUARTER_FREQ_PATTERN:
                idx = jnp.arange(pat, a.shape[j], 4)
                new.append(jnp.take(a, idx, axis=j))
        blocks = new
    return tuple(blocks)


def _shift_last(x: jax.Array, down: bool) -> jax.Array:
    """down: y_t = x_{t-1} (y_0 = 0); else y_t = x_{t+1} (y_last = 0).
    Along the LAST axis."""
    n = x.shape[-1]
    if down:
        y = jnp.roll(x, 1, axis=-1)
        i = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        return jnp.where(i > 0, y, 0.0)
    y = jnp.roll(x, -1, axis=-1)
    i = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(i < n - 1, y, 0.0)


def _shift_axis(x: jax.Array, ax: int, down: bool) -> jax.Array:
    n = x.shape[ax]
    y = jnp.roll(x, 1 if down else -1, axis=ax)
    i = jax.lax.broadcasted_iota(jnp.int32, x.shape, ax)
    return jnp.where(i > 0 if down else i < n - 1, y, 0.0)


def dctn_quartered(blocks: Tuple[jax.Array, ...], quarters,
                   mat_dtype=None) -> Tuple[jax.Array, ...]:
    """M-layout natural blocks -> [EE, EO, OE, OO]-per-axis spectral
    blocks (orthonormal coefficients).  Cyclic axis consumption as in
    dctn_blocked; zero concatenates."""
    p = len(quarters)
    nb = blocks[0].ndim - p
    cur = list(blocks)
    dtype = blocks[0].dtype
    for jax_ax, (C2q, V4q, C2qf, c1, s1, alt, w) in enumerate(quarters):
        md = mat_dtype or C2q.dtype
        c2m, v4m, c2fm = C2q.astype(md), V4q.astype(md), C2qf.astype(md)
        nblk = blocks[0].ndim - nb   # p trailing dims per block, constant
        # diagonals act along axis nb (pre-contraction)
        dshape = (1,) * nb + (c1.shape[0],) + (1,) * (nblk - 1)
        c1b = c1.reshape(dshape)
        s1b = s1.reshape(dshape)
        altb = alt.reshape(dshape)
        stride = 4 ** (p - 1 - jax_ax)
        new = [None] * len(cur)
        groups = [g for g in range(len(cur))
                  if (g // stride) % 4 == 0]
        for g in groups:
            d0 = cur[g]
            d1 = cur[g + stride]
            d2 = cur[g + 2 * stride]
            d3 = cur[g + 3 * stride]
            ss = (d0 + d1 + d2 + d3).astype(md)
            sd = (d0 - d1 - d2 + d3).astype(md)
            e0 = d0 - d3
            e1 = d1 - d2
            u = (c1b * e0 + s1b * e1).astype(md)
            vq = (altb * (s1b * e0 - c1b * e1)).astype(md)
            # One multi-output fusion for the four fold combos: without
            # the barrier XLA duplicates the producer chain into each
            # dot's operand fusion, re-reading the 4 input blocks 4x
            # (fwd measured 1.8x roofline at 4096^2 from exactly this).
            ss, sd, u, vq = jax.lax.optimization_barrier((ss, sd, u, vq))

            def dot(a, t):
                return jax.lax.dot_general(
                    a, t, (((nb,), (1,)), ((), ())),
                    preferred_element_type=dtype)

            EE = dot(ss, c2m)
            EO = dot(sd, v4m)
            ce = dot(u, c2m)
            se = dot(vq, c2fm)
            OE = ce - _shift_last(se, down=True)
            OO = _shift_last(ce, down=False) + se
            new[g] = EE * w[0]
            new[g + stride] = EO * w[1]
            new[g + 2 * stride] = OE * w[2]
            new[g + 3 * stride] = OO * w[3]
        cur = new
    return tuple(cur)


def idctn_quartered(blocks: Tuple[jax.Array, ...], quarters,
                    mat_dtype=None) -> Tuple[jax.Array, ...]:
    """Inverse of dctn_quartered (transpose pipeline): spectral quartered
    blocks -> M-layout natural blocks."""
    p = len(quarters)
    nb = blocks[0].ndim - p
    cur = list(blocks)
    dtype = blocks[0].dtype
    for jax_ax, (C2q, V4q, C2qf, c1, s1, alt, w) in enumerate(quarters):
        md = mat_dtype or C2q.dtype
        c2m, v4m, c2fm = C2q.astype(md), V4q.astype(md), C2qf.astype(md)
        nblk = blocks[0].ndim - nb
        dshape = (1,) * nb + (w[0].shape[0],) + (1,) * (nblk - 1)
        wb = [wv.reshape(dshape) for wv in w]
        stride = 4 ** (p - 1 - jax_ax)
        new = [None] * len(cur)
        groups = [g for g in range(len(cur))
                  if (g // stride) % 4 == 0]
        for g in groups:
            EEw = cur[g] * wb[0]
            EOw = cur[g + stride] * wb[1]
            OEw = cur[g + 2 * stride] * wb[2]
            OOw = cur[g + 3 * stride] * wb[3]
            ce_a = OEw + _shift_axis(OOw, nb, down=True)
            se_a = OOw - _shift_axis(OEw, nb, down=False)
            # (No optimization_barrier here: unlike the forward side, a
            # barrier on the inverse combos MEASURED SLOWER at 2048^2 —
            # XLA's own fusion choice wins on this side.)

            def dott(a, t):
                return jax.lax.dot_general(
                    a.astype(md), t, (((nb,), (0,)), ((), ())),
                    preferred_element_type=dtype)

            ss_a = dott(EEw, c2m)
            sd_a = dott(EOw, v4m)
            u_a = dott(ce_a, c2m)
            v_a = alt * dott(se_a, c2fm)
            # P^T: diagonals act along the LAST axis post-contraction
            spd = ss_a + sd_a
            smd = ss_a - sd_a
            cu = c1 * u_a
            su = s1 * u_a
            cv = c1 * v_a
            sv = s1 * v_a
            new[g] = spd + cu + sv
            new[g + stride] = smd + su - cv
            new[g + 2 * stride] = smd - su + cv
            new[g + 3 * stride] = spd - cu - sv
        cur = new
    return tuple(cur)
