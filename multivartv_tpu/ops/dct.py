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
