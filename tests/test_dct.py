"""DCT diagonalization tests: the spectral identities that replace the
reference's sparse direct solves."""

import jax.numpy as jnp
import numpy as np
import pytest

from multivartv_tpu.ops import dct, diff


@pytest.mark.parametrize("m,deltas", [
    ((8,), [0.5]),
    ((6, 5), [0.7, 1.1]),
    ((4, 3, 5), [0.9, 1.3, 0.4]),
])
def test_gram_diagonalization(m, deltas, rng):
    """dctn(D'D x) == Lambda * dctn(x) for random x — exact identity."""
    bins = diff.fd_binaries(len(m))
    d = jnp.asarray(deltas)
    scales = diff.delta_scales(bins, d)
    eigs = dct.gram_eigenvalues(m, d)
    x = jnp.asarray(rng.randn(*m).astype(np.float32))
    lhs = dct.dctn(diff.apply_gram(x, bins, scales))
    rhs = eigs * dct.dctn(x)
    assert np.allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_gram_diagonalization_python_blockset(rng):
    m = (6, 5)
    bins = diff.fd_binaries(2, include_full_mixed=False)
    d = jnp.asarray([0.7, 1.1])
    scales = diff.delta_scales(bins, d)
    eigs = dct.gram_eigenvalues(m, d, include_full_mixed=False)
    x = jnp.asarray(rng.randn(*m).astype(np.float32))
    lhs = dct.dctn(diff.apply_gram(x, bins, scales))
    rhs = eigs * dct.dctn(x)
    assert np.allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


@pytest.mark.parametrize("m", [(8,), (7, 5), (4, 6, 3)])
def test_matmul_dct_matches_fft(m, rng):
    x = jnp.asarray(rng.randn(*m).astype(np.float32))
    mats = dct.dct_matrices(m)
    a = dct.dctn_mat(x, mats)
    b = dct.dctn(x)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    back = dct.idctn_mat(a, mats)
    assert np.allclose(np.asarray(back), np.asarray(x), atol=1e-4)
    # leading batch dim
    xb = jnp.stack([x, 2 * x])
    ab = dct.dctn_mat(xb, mats)
    assert np.allclose(np.asarray(ab[1]), 2 * np.asarray(a), atol=1e-4)


def test_zero_mode():
    eigs = dct.gram_eigenvalues((5, 4), jnp.asarray([1.0, 2.0]))
    assert abs(float(eigs[0, 0])) < 1e-6
    assert float(jnp.min(eigs)) > -1e-6


def test_shifted_solve_exact(rng):
    m = (6, 4)
    bins = diff.fd_binaries(2)
    d = jnp.asarray([0.8, 1.2])
    scales = diff.delta_scales(bins, d)
    eigs = dct.gram_eigenvalues(m, d)
    b = jnp.asarray(rng.randn(*m).astype(np.float32))
    c = jnp.asarray(2.5, jnp.float32)
    rho = jnp.asarray(0.7, jnp.float32)
    x = dct.shifted_solve(b, c, rho, eigs)
    # Verify (c I + rho D'D) x == b.
    back = c * x + rho * diff.apply_gram(x, bins, scales)
    assert np.allclose(np.asarray(back), np.asarray(b), atol=1e-4)


def test_gram_pinv_is_projection(rng):
    m = (5, 7)
    bins = diff.fd_binaries(2)
    d = jnp.asarray([1.1, 0.6])
    scales = diff.delta_scales(bins, d)
    eigs = dct.gram_eigenvalues(m, d)
    b = jnp.asarray(rng.randn(*m).astype(np.float32))
    x = dct.gram_pinv_apply(b, eigs)
    # D'D x should equal b minus its mean (projection off the nullspace).
    back = diff.apply_gram(x, bins, scales)
    want = np.asarray(b) - np.asarray(b).mean()
    assert np.allclose(np.asarray(back), want, atol=1e-3)
    # And x itself is mean-free (pinv range).
    assert abs(float(jnp.mean(x))) < 1e-4


def test_packed_dct_matches_dense(rng):
    """Folded even/odd DCT (half-size matmuls, packed frequency order)
    is an exact reordering of the dense transform (ops/dct.py)."""
    m = (16, 24)
    v = jnp.asarray(rng.randn(*m).astype(np.float32))
    mats = dct.dct_matrices(m)
    halves = tuple(dct.dct_packed_halves(n) for n in m)
    got = dct.dct2_packed(v, halves[0], halves[1])
    want = dct.pack_spectrum(dct.dctn_mat(v, mats))
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    back = dct.idct2_packed(got, halves[0], halves[1])
    assert np.allclose(np.asarray(back), np.asarray(v), atol=1e-5)


@pytest.mark.parametrize("m", [(16,), (16, 24), (8, 6, 10)])
def test_dctn_packed_matches_dense(m, rng):
    """The p-dim folded transform (ops/dct.py::dctn_packed) is an exact
    per-axis packed reordering of the dense transform, for any p."""
    v = jnp.asarray(rng.randn(*m).astype(np.float32))
    mats = dct.dct_matrices(m)
    halves = tuple(dct.dct_packed_halves(n) for n in m)
    got = dct.dctn_packed(v, halves)
    want = dct.pack_spectrum(dct.dctn_mat(v, mats))
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    back = dct.idctn_packed(got, halves)
    assert np.allclose(np.asarray(back), np.asarray(v), atol=1e-5)
    # leading batch dim (the CV-fold / lambda-sweep vmap axis)
    vb = jnp.stack([v, 2 * v])
    gb = dct.dctn_packed(vb, halves)
    assert np.allclose(np.asarray(gb[1]), 2 * np.asarray(got), atol=1e-5)


def test_dctn_packed_agrees_with_dct2_packed(rng):
    """p=2 special case: the generic transform equals the 2-D one the
    Pallas kernels use."""
    m = (16, 24)
    v = jnp.asarray(rng.randn(*m).astype(np.float32))
    halves = tuple(dct.dct_packed_halves(n) for n in m)
    a = dct.dctn_packed(v, halves)
    b = dct.dct2_packed(v, halves[0], halves[1])
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dctn_packed_bf16_close(rng):
    """bf16 matmul dtype (the TPU production setting) stays within bf16
    rounding of the f32 transform."""
    m = (16, 24, 8)
    v = jnp.asarray(rng.randn(*m).astype(np.float32))
    halves = tuple(dct.dct_packed_halves(n) for n in m)
    a = dct.dctn_packed(v, halves)
    b = dct.dctn_packed(v, halves, mat_dtype=jnp.bfloat16)
    scale = float(jnp.max(jnp.abs(a)))
    assert np.allclose(np.asarray(a), np.asarray(b), atol=0.05 * scale)


def test_packed_spectral_solve_matches_dense(rng):
    """Elementwise spectral weighting commutes with the packed order."""
    m = (32, 16)
    deltas = jnp.asarray([0.3, 0.7], jnp.float32)
    v = jnp.asarray(rng.randn(*m).astype(np.float32))
    mats = dct.dct_matrices(m)
    halves = tuple(dct.dct_packed_halves(n) for n in m)
    eigs = dct.gram_eigenvalues(m, deltas)
    w = 1.5 + 0.2 * eigs
    want = dct.idctn_mat(dct.dctn_mat(v, mats) / w, mats)
    got = dct.idct2_packed(
        dct.dct2_packed(v, halves[0], halves[1]) / dct.pack_spectrum(w),
        halves[0], halves[1])
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4)


class TestBlocked:
    """Concat-free blocked transforms (ops/dct.py blocked section)."""

    @pytest.mark.parametrize("m", [(8,), (8, 12), (4, 6, 8)])
    def test_roundtrip_and_parity(self, m):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(*m), jnp.float32)
        p = len(m)
        halves = tuple(dct.dct_packed_halves(v, jnp.float32) for v in m)
        blocks = dct.to_blocks(x, p)
        assert len(blocks) == 2 ** p
        # layout roundtrip
        np.testing.assert_allclose(np.asarray(dct.from_blocks(blocks, p)),
                                   np.asarray(x), rtol=0, atol=0)
        # forward parity vs dense matmul DCT (blocked layout vs strided
        # frequency slices)
        mats = dct.dct_matrices(m, jnp.float32)
        want = np.asarray(dct.dctn_mat(x, mats))
        got = dct.dctn_blocked(blocks, halves)
        for bits in range(2 ** p):
            sel = tuple(
                slice((bits >> (p - 1 - j)) & 1, None, 2) for j in range(p))
            np.testing.assert_allclose(np.asarray(got[bits]), want[sel],
                                       rtol=2e-5, atol=2e-5)
        # inverse roundtrip through the blocked pair
        back = dct.from_blocks(dct.idctn_blocked(got, halves), p)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   rtol=2e-5, atol=2e-5)

    def test_blocked_spectrum_matches_layout(self):
        m = (6, 8)
        eigs = jnp.asarray(np.random.RandomState(0).rand(*m), jnp.float32)
        blocks = dct.blocked_spectrum(eigs)
        for bits in range(4):
            sel = tuple(slice((bits >> (1 - j)) & 1, None, 2)
                        for j in range(2))
            np.testing.assert_array_equal(np.asarray(blocks[bits]),
                                          np.asarray(eigs)[sel])

    def test_batched_blocked(self):
        m = (8, 12)
        halves = tuple(dct.dct_packed_halves(v, jnp.float32) for v in m)
        x = jnp.asarray(np.random.RandomState(1).randn(3, *m), jnp.float32)
        mats = dct.dct_matrices(m, jnp.float32)
        got = dct.from_blocks(
            dct.idctn_blocked(dct.dctn_blocked(dct.to_blocks(x, 2), halves),
                              halves), 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                                   rtol=2e-5, atol=2e-5)


class TestQuartered:
    """Depth-2 fast DCT (ops/dct.py quartered section)."""

    @pytest.mark.parametrize("m", [(16,), (16, 8), (8, 4, 12)])
    def test_roundtrip_and_parity(self, m):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(*m), jnp.float32)
        p = len(m)
        quarters = tuple(dct.dct_quarter_mats(v, jnp.float32) for v in m)
        blocks = dct.to_blocks4(x, p)
        assert len(blocks) == 4 ** p
        np.testing.assert_allclose(np.asarray(dct.from_blocks4(blocks, p)),
                                   np.asarray(x), rtol=0, atol=0)
        mats = dct.dct_matrices(m, jnp.float32)
        want = np.asarray(dct.dctn_mat(x, mats))
        got = dct.dctn_quartered(blocks, quarters)
        # per-block frequency pattern check
        for bits in range(4 ** p):
            sel = []
            bb = bits
            digits = []
            for j in range(p):
                digits.append((bits // 4 ** (p - 1 - j)) % 4)
            sel = tuple(
                slice(dct.QUARTER_FREQ_PATTERN[d], None, 4) for d in digits)
            np.testing.assert_allclose(np.asarray(got[bits]), want[sel],
                                       rtol=3e-5, atol=3e-5)
        back = dct.from_blocks4(dct.idctn_quartered(got, quarters), p)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   rtol=3e-5, atol=3e-5)

    def test_quartered_spectrum_matches_layout(self):
        m = (8, 16)
        eigs = jnp.asarray(np.random.RandomState(0).rand(*m), jnp.float32)
        blocks = dct.quartered_spectrum(eigs)
        for bits in range(16):
            d0, d1 = bits // 4, bits % 4
            sel = (slice(dct.QUARTER_FREQ_PATTERN[d0], None, 4),
                   slice(dct.QUARTER_FREQ_PATTERN[d1], None, 4))
            np.testing.assert_array_equal(np.asarray(blocks[bits]),
                                          np.asarray(eigs)[sel])

    def test_batched(self):
        m = (8, 16)
        quarters = tuple(dct.dct_quarter_mats(v, jnp.float32) for v in m)
        x = jnp.asarray(np.random.RandomState(1).randn(3, *m), jnp.float32)
        got = dct.from_blocks4(
            dct.idctn_quartered(
                dct.dctn_quartered(dct.to_blocks4(x, 2), quarters),
                quarters), 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                                   rtol=3e-5, atol=3e-5)
