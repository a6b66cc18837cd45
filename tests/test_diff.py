"""Difference-operator tests: adjointness, Gram identities, reference
fixtures (code/test_utils.py:33-36), and dense cross-checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multivartv_tpu.ops import diff


def dense_block(m, b):
    """Dense matrix of one D block via iterated np.diff on basis vectors."""
    ntheta = int(np.prod(m))
    cols = []
    for k in range(ntheta):
        e = np.zeros(ntheta)
        e[k] = 1.0
        x = e.reshape(m)
        for j, bj in enumerate(b):
            if bj:
                x = np.diff(x, axis=j)
        cols.append(x.reshape(-1))
    return np.stack(cols, axis=1)


def test_fd_binaries_cpp_order():
    # C++ create_D stacks all-ones first (utils.cpp:225), then binaries
    # 1..2^p-2 big-endian (fd_binaries, utils.cpp:93-103).
    assert diff.fd_binaries(1) == ((1,),)
    assert diff.fd_binaries(2) == ((1, 1), (0, 1), (1, 0))
    assert diff.fd_binaries(3) == (
        (1, 1, 1), (0, 0, 1), (0, 1, 0), (0, 1, 1),
        (1, 0, 0), (1, 0, 1), (1, 1, 0),
    )


def test_fd_binaries_python_mode_drops_all_ones():
    # Reference Python create_D drops the all-ones block when deltas given
    # (code/utils.py:145).
    assert diff.fd_binaries(2, include_full_mixed=False) == ((0, 1), (1, 0))
    # p=1 keeps its only block.
    assert diff.fd_binaries(1, include_full_mixed=False) == ((1,),)


def test_delta_scales():
    deltas = jnp.asarray([2.0, 3.0])
    bins = diff.fd_binaries(2)
    s = diff.delta_scales(bins, deltas)
    # all-ones -> 1; (0,1) -> delta_0 = 2; (1,0) -> delta_1 = 3.
    assert np.allclose([float(v) for v in s], [1.0, 2.0, 3.0])


def test_apply_block_matches_numpy_diff(rng):
    # Padded representation: full lattice shape, valid region = iterated
    # np.diff, trailing edge of each differenced axis = exact zeros.
    m = (5, 4, 3)
    x = rng.randn(*m)
    for b in diff.fd_binaries(3):
        got = np.asarray(diff.apply_block(jnp.asarray(x), b))
        assert got.shape == m
        want = x
        sl = []
        for j, bj in enumerate(b):
            if bj:
                want = np.diff(want, axis=j)
            sl.append(slice(0, m[j] - bj))
        assert np.allclose(got[tuple(sl)], want, atol=1e-6)
        # padding zeros
        mask = np.ones(m, bool)
        mask[tuple(sl)] = False
        assert np.all(got[mask] == 0.0)


def test_adjoint_identity(rng):
    m = (6, 5)
    bins = diff.fd_binaries(2)
    deltas = jnp.asarray([0.7, 1.3])
    scales = diff.delta_scales(bins, deltas)
    theta = jnp.asarray(rng.randn(*m))
    blocks = diff.apply_D(theta, bins, scales)
    # random padded-representation duals: random values masked to the
    # valid region (the ADMM invariant).
    a = tuple(
        jnp.asarray(rng.randn(*blk.shape)) * diff.edge_mask(m, b, blk.dtype)
        for blk, b in zip(blocks, bins)
    )
    lhs = sum(float(jnp.sum(x * y)) for x, y in zip(blocks, a))
    rhs = float(jnp.sum(theta * diff.apply_Dt(a, bins, scales)))
    assert np.isclose(lhs, rhs, rtol=1e-5)


def test_gram_matches_composition(rng):
    m = (4, 5)
    bins = diff.fd_binaries(2)
    scales = diff.delta_scales(bins, jnp.asarray([0.5, 2.0]))
    theta = jnp.asarray(rng.randn(*m))
    g1 = diff.apply_gram(theta, bins, scales)
    g2 = diff.apply_Dt(diff.apply_D(theta, bins, scales), bins, scales)
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_gram_diag_closed_form(rng):
    m = (4, 3)
    bins = diff.fd_binaries(2)
    deltas = jnp.asarray([0.9, 1.7])
    scales = diff.delta_scales(bins, deltas)
    # Dense Gram diag via basis vectors.
    ntheta = int(np.prod(m))
    diag = np.zeros(ntheta)
    for k in range(ntheta):
        e = np.zeros(ntheta)
        e[k] = 1.0
        ge = diff.apply_gram(jnp.asarray(e.reshape(m)), bins, scales)
        diag[k] = float(ge.reshape(-1)[k])
    got = np.asarray(diff.gram_diag(m, bins, scales)).reshape(-1)
    assert np.allclose(got, diag, atol=1e-5)


def test_create_D_annihilates_alternating_pattern():
    # Reference test_create_D (code/test_utils.py:33-36): on a 3x3 lattice
    # with theta = tile([1,-1,1], 3) (reference flat order), sum(D theta)=0.
    from multivartv_tpu.mesh import unflatten_ref_order
    theta = unflatten_ref_order(jnp.asarray(np.tile([1.0, -1.0, 1.0], 3)), (3, 3))
    bins = diff.fd_binaries(2)
    scales = tuple(jnp.asarray(1.0) for _ in bins)  # deltas=None variant
    blocks = diff.apply_D(theta, bins, scales)
    total = sum(float(jnp.sum(b)) for b in blocks)
    assert total == 0.0


def test_num_rows():
    m = (4, 3)
    bins = diff.fd_binaries(2)
    # (1,1): 3*2=6; (0,1): 4*2=8; (1,0): 3*3=9 -> 23
    assert diff.num_rows(m, bins) == 23
