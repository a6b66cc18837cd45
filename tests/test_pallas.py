"""Pallas kernel correctness vs the jnp reference path (interpreter mode —
the CPU backend runs the same kernel logic the TPU compiles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multivartv_tpu.ops import diff, pallas_kernels as pk
from multivartv_tpu.ops.prox import soft_threshold_blocks


@pytest.fixture(scope="module")
def setup(rng=None):
    rng = np.random.RandomState(3)
    m = (16, 24)
    bins = diff.fd_binaries(2)
    deltas = jnp.asarray([0.4, 0.9], jnp.float32)
    scales = diff.delta_scales(bins, deltas)
    theta = jnp.asarray(rng.randn(*m).astype(np.float32))
    counts = jnp.asarray(rng.poisson(3, m).astype(np.float32))
    u = tuple(
        jnp.asarray(rng.randn(*m).astype(np.float32)) * diff.edge_mask(m, b)
        for b in bins
    )
    return m, bins, scales, theta, counts, u


def test_gram_matvec_matches_jnp(setup):
    m, bins, scales, theta, counts, _ = setup
    rho = jnp.asarray(0.7, jnp.float32)
    got, dot = pk.gram_matvec_2d(theta, counts, rho, scales, interpret=True)
    want = counts * theta + rho * diff.apply_gram(theta, bins, scales)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    assert np.isclose(float(dot), float(jnp.sum(theta * want)), rtol=1e-4)


def test_dual_update_matches_jnp(setup):
    m, bins, scales, theta, counts, u = setup
    kappa = jnp.asarray(0.3, jnp.float32)
    alpha, u_new, stats = pk.dual_update_2d(theta, u, kappa, scales,
                                            interpret=True)
    d_theta = diff.apply_D(theta, bins, scales)
    alpha_ref = soft_threshold_blocks(
        tuple(dt - w for dt, w in zip(d_theta, u)), kappa)
    r_ref = tuple(a - dt for a, dt in zip(alpha_ref, d_theta))
    u_ref = tuple(w + r for w, r in zip(u, r_ref))
    for a, b_ in zip(alpha, alpha_ref):
        assert np.allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
    for a, b_ in zip(u_new, u_ref):
        assert np.allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
    want_stats = [
        float(diff.blocks_norm_sq(r_ref)),
        float(diff.blocks_norm_sq(d_theta)),
        float(diff.blocks_norm_sq(alpha_ref)),
        float(jnp.sum(jnp.square(diff.apply_Dt(r_ref, bins, scales)))),
        float(jnp.sum(jnp.square(diff.apply_Dt(u_ref, bins, scales)))),
    ]
    got_stats = np.asarray(stats)
    assert np.allclose(got_stats, want_stats, rtol=1e-4, atol=1e-4)


def test_dual_update_u_scale(setup):
    """u_scale folds the adaptive-rho dual rescale into the kernel load:
    dual_update(theta, u, u_scale=s) == dual_update(theta, s*u)."""
    m, bins, scales, theta, counts, u = setup
    kappa = jnp.asarray(0.3, jnp.float32)
    s = jnp.asarray(0.5, jnp.float32)
    a1, u1, st1 = pk.dual_update_2d(theta, u, kappa, scales, u_scale=s,
                                    interpret=True)
    a2, u2, st2 = pk.dual_update_2d(theta, tuple(s * w for w in u), kappa,
                                    scales, interpret=True)
    for x, y in zip(a1 + u1, a2 + u2):
        assert np.allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    assert np.allclose(np.asarray(st1), np.asarray(st2), rtol=1e-5)


def test_rhs_matches_jnp(setup):
    m, bins, scales, theta, counts, u = setup
    rng = np.random.RandomState(7)
    alpha = tuple(
        jnp.asarray(rng.randn(*m).astype(np.float32)) * diff.edge_mask(m, b)
        for b in bins
    )
    oty = jnp.asarray(rng.randn(*m).astype(np.float32))
    rho = jnp.asarray(0.7, jnp.float32)
    s = jnp.asarray(0.5, jnp.float32)
    got = pk.rhs_2d(alpha, u, oty, rho, s, scales, interpret=True)
    au = tuple(a + s * w for a, w in zip(alpha, u))
    want = oty + rho * diff.apply_Dt(au, bins, scales)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_xupdate_kernel_matches_pcg(setup):
    """One-kernel PCG x-update vs the jnp pcg_fixed reference (bf16 DCT
    transforms in the kernel => loose-ish tolerance on the solution)."""
    from multivartv_tpu.ops import dct as dct_ops
    from multivartv_tpu.solver.cg import pcg_fixed

    m, bins, scales, theta, counts, u = setup
    rng = np.random.RandomState(11)
    b = jnp.asarray(rng.randn(*m).astype(np.float32))
    x0 = jnp.zeros(m, jnp.float32)
    rho = jnp.asarray(0.7, jnp.float32)
    deltas = jnp.asarray([0.4, 0.9], jnp.float32)
    eigs = dct_ops.gram_eigenvalues(m, deltas, True, jnp.float32)
    mats = dct_ops.dct_matrices(m, jnp.float32)
    cbar = jnp.mean(counts)

    got, rsq = pk.xupdate_pcg_2d(b, x0, counts, mats, eigs, rho, cbar,
                                 scales, n_steps=3, interpret=True)

    def matvec(v):
        return counts * v + rho * diff.apply_gram(v, bins, scales)

    def precond(r):
        return dct_ops.idctn_mat(
            dct_ops.dctn_mat(r, mats) / (cbar + rho * eigs), mats)

    want = pcg_fixed(matvec, b, x0, precond=precond, n_iters=3)
    # Identical algorithm; the bf16 transform only perturbs the
    # preconditioner, so the solutions track each other tightly.
    assert np.allclose(np.asarray(got), np.asarray(want.x),
                       rtol=2e-2, atol=2e-2)
    # With enough steps the kernel's solve is accurate in its own right.
    got10, rsq10 = pk.xupdate_pcg_2d(b, x0, counts, mats, eigs, rho, cbar,
                                     scales, n_steps=10, interpret=True)
    res = matvec(got10) - b
    rel = float(jnp.linalg.norm(res) / jnp.linalg.norm(b))
    assert rel < 5e-3
    assert np.isfinite(float(rsq)) and np.isfinite(float(rsq10))


def test_supported_gate():
    bins2 = diff.fd_binaries(2)
    bins3 = diff.fd_binaries(3)
    assert pk.supported((512, 512), bins2)
    assert pk.supported((1024, 1024), bins2)
    assert not pk.supported((2048, 2048), bins2)
    assert not pk.supported((8, 8, 8), bins3)
    assert not pk.supported((16, 16), diff.fd_binaries(2, False))


def test_xupdate_packed_matches_dense(setup):
    """Folded-DCT one-kernel x-update == dense-DCT one-kernel x-update
    (identical PCG; only bf16 rounding order in the preconditioner
    differs)."""
    from multivartv_tpu.ops import dct as dct_ops

    m, bins, scales, theta, counts, u = setup
    rng = np.random.RandomState(13)
    b = jnp.asarray(rng.randn(*m).astype(np.float32))
    x0 = jnp.zeros(m, jnp.float32)
    rho = jnp.asarray(0.7, jnp.float32)
    deltas = jnp.asarray([0.4, 0.9], jnp.float32)
    eigs = dct_ops.gram_eigenvalues(m, deltas, True, jnp.float32)
    mats = dct_ops.dct_matrices(m, jnp.float32)
    halves = tuple(dct_ops.dct_packed_halves(n) for n in m)
    cbar = jnp.mean(counts)

    xd, rd = pk.xupdate_pcg_2d(b, x0, counts, mats, eigs, rho, cbar,
                               scales, n_steps=3, interpret=True)
    xp, rp = pk.xupdate_pcg_2d_packed(b, x0, counts, halves,
                                      dct_ops.pack_spectrum(eigs), rho,
                                      cbar, scales, n_steps=3,
                                      interpret=True)
    assert np.allclose(np.asarray(xp), np.asarray(xd), rtol=2e-2, atol=2e-2)
    # And it is an accurate solve in its own right with enough steps.
    xp10, _ = pk.xupdate_pcg_2d_packed(b, x0, counts, halves,
                                       dct_ops.pack_spectrum(eigs), rho,
                                       cbar, scales, n_steps=10,
                                       interpret=True)
    res = counts * xp10 + rho * diff.apply_gram(xp10, bins, scales) - b
    rel = float(jnp.linalg.norm(res) / jnp.linalg.norm(b))
    assert rel < 5e-3


def test_fused_admm_iterations_match_loop(setup):
    """K ADMM iterations in one kernel (admm_iters_2d) track K applications
    of the jnp per-iteration body: same rho/u_scale trajectory, same Boyd
    statistics, iterates equal up to bf16-preconditioner rounding."""
    from multivartv_tpu.config import SolverConfig
    from multivartv_tpu.ops import dct as dct_ops
    from multivartv_tpu.solver import admm
    from multivartv_tpu.solver.problem import Problem, build_operators

    m, bins, scales, theta, counts, u = setup
    rng = np.random.RandomState(17)
    cfg = SolverConfig(cg_fixed_iters=3)
    deltas = jnp.asarray([0.4, 0.9], jnp.float32)
    ops = build_operators(m, deltas, cfg, jnp.float32)
    oty = jnp.asarray(rng.randn(*m).astype(np.float32))
    problem = Problem(counts=counts, oty=oty, ybar=jnp.mean(oty),
                      flat_idx=jnp.zeros((1,), jnp.int32),
                      y=jnp.zeros((1,), jnp.float32))
    lam = jnp.asarray(0.08, jnp.float32)
    s0 = admm.initial_state(ops, problem, rho0=lam / 5.0)

    body = admm.make_admm_iteration(ops, problem, lam, cfg, batched=True)
    K = 7
    s = s0
    for _ in range(K):
        s = body(s)

    cbar = jnp.sum(counts) / ops.ntheta
    th, u_new, al, rho, uscale, stats = pk.admm_iters_2d(
        s0.theta, s0.u, s0.alpha, counts, oty, ops.dct_halves,
        ops.gram_eigs_packed, lam, s0.rho, s0.u_scale, cbar, ops.scales,
        k_iters=K, n_steps=3, adapt=cfg.adapt_rho, tau=cfg.adapt_tau,
        band=cfg.adapt_band, interpret=True)

    scale = float(jnp.max(jnp.abs(s.theta)))
    assert float(jnp.max(jnp.abs(th - s.theta))) < 5e-3 * scale
    assert np.isclose(float(rho), float(s.rho))
    assert np.isclose(float(uscale), float(s.u_scale))
    assert np.isclose(float(jnp.sqrt(stats[0])), float(s.primal_norm),
                      rtol=1e-2)
    assert np.isclose(float(rho * uscale * jnp.sqrt(stats[3])),
                      float(s.dual_norm), rtol=1e-2)


# ---------------------------------------------------------------------------
# Tiled row-panel kernels (7/8) for large lattices — interpret-mode parity
# vs the jnp reference stages.
# ---------------------------------------------------------------------------

class TestTiledKernels:
    M = (32, 128)

    def _setup(self, seed=5):
        from multivartv_tpu.ops import diff as diff_ops
        rng = np.random.RandomState(seed)
        m = self.M
        bins = diff_ops.fd_binaries(2)
        deltas = jnp.asarray([0.4, 0.9], jnp.float32)
        scales = diff_ops.delta_scales(bins, deltas)
        theta = jnp.asarray(rng.randn(*m), jnp.float32)
        u = tuple(
            jnp.asarray(rng.randn(*m), jnp.float32)
            * diff_ops.edge_mask(m, b, jnp.float32) for b in bins)
        return bins, scales, theta, u

    @pytest.mark.parametrize("tile_rows", [8, 16])
    def test_tiled_dual_matches_jnp(self, tile_rows):
        from multivartv_tpu.ops import diff as diff_ops
        from multivartv_tpu.ops.prox import soft_threshold_blocks
        bins, scales, theta, u = self._setup()
        kappa = jnp.asarray(0.3, jnp.float32)
        uscale = jnp.asarray(0.5, jnp.float32)

        alpha, un, stats = pk.dual_update_tiled_2d(
            theta, u, kappa, scales, u_scale=uscale, interpret=True,
            tile_rows=tile_rows)

        d_theta = diff_ops.apply_D(theta, bins, scales)
        u_eff = tuple(uscale * w for w in u)
        a_ref = soft_threshold_blocks(
            tuple(dt - w for dt, w in zip(d_theta, u_eff)), kappa)
        r_ref = tuple(a - dt for a, dt in zip(a_ref, d_theta))
        un_ref = tuple(w + r for w, r in zip(u_eff, r_ref))
        for got, want in zip(alpha, a_ref):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-6)
        for got, want in zip(un, un_ref):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-6)
        want_stats = [
            float(diff_ops.blocks_norm_sq(r_ref)),
            float(diff_ops.blocks_norm_sq(d_theta)),
            float(diff_ops.blocks_norm_sq(a_ref)),
            float(jnp.sum(jnp.square(
                diff_ops.apply_Dt(r_ref, bins, scales)))),
            float(jnp.sum(jnp.square(
                diff_ops.apply_Dt(un_ref, bins, scales)))),
        ]
        np.testing.assert_allclose(np.asarray(stats), want_stats, rtol=1e-4)

    def test_tiled_dual_adjoint_carries(self):
        """want_adjoints (r5): the exported dta/dtu equal D'alpha_new and
        D'u_new — the carries the next iteration's rhs consumes."""
        from multivartv_tpu.ops import diff as diff_ops
        from multivartv_tpu.ops.prox import soft_threshold_blocks
        bins, scales, theta, u = self._setup()
        kappa = jnp.asarray(0.3, jnp.float32)
        uscale = jnp.asarray(0.5, jnp.float32)
        alpha, un, stats, dta, dtu = pk.dual_update_tiled_2d(
            theta, u, kappa, scales, u_scale=uscale, want_adjoints=True,
            interpret=True, tile_rows=8)
        np.testing.assert_allclose(
            np.asarray(dta),
            np.asarray(diff_ops.apply_Dt(alpha, bins, scales)), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(dtu),
            np.asarray(diff_ops.apply_Dt(un, bins, scales)), atol=1e-5)

    @pytest.mark.parametrize("tile_rows", [8, 16])
    def test_tiled_gram_residual_rhs_fused(self, tile_rows):
        """rhs_parts (r5): r0 with the b-assembly fused in-kernel equals
        r0 computed against an explicitly materialized b."""
        from multivartv_tpu.ops import diff as diff_ops
        bins, scales, theta, u = self._setup(seed=31)
        rng = np.random.RandomState(33)
        m = self.M
        counts = jnp.asarray(rng.poisson(3, m).astype(np.float32))
        oty = jnp.asarray(rng.randn(*m).astype(np.float32))
        dta = jnp.asarray(rng.randn(*m).astype(np.float32))
        dtu = jnp.asarray(rng.randn(*m).astype(np.float32))
        rho = jnp.float32(0.3)
        usc = jnp.float32(0.7)
        b = oty + rho * (dta + usc * dtu)
        want = pk.gram_residual_tiled_2d(b, theta, counts, rho, scales,
                                         interpret=True,
                                         tile_rows=tile_rows)
        got = pk.gram_residual_tiled_2d(None, theta, counts, rho, scales,
                                        rhs_parts=(oty, dta, usc, dtu),
                                        interpret=True,
                                        tile_rows=tile_rows)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_tiled_dual_want_alpha_elided(self):
        """want_alpha=False (r5): u_new/stats/dta/dtu are bit-identical
        to the want_alpha=True call; the alpha slot is None (the writes
        are dead stores on the adjoint-carry ADMM route)."""
        bins, scales, theta, u = self._setup()
        kappa = jnp.asarray(0.3, jnp.float32)
        uscale = jnp.asarray(0.5, jnp.float32)
        a1, un1, st1, dta1, dtu1 = pk.dual_update_tiled_2d(
            theta, u, kappa, scales, u_scale=uscale, want_adjoints=True,
            interpret=True, tile_rows=8)
        a0, un0, st0, dta0, dtu0 = pk.dual_update_tiled_2d(
            theta, u, kappa, scales, u_scale=uscale, want_adjoints=True,
            want_alpha=False, interpret=True, tile_rows=8)
        assert a0 is None and a1 is not None
        for got, want in zip(un0, un1):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5)
        np.testing.assert_allclose(np.asarray(st0), np.asarray(st1),
                               rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dta0), np.asarray(dta1),
                               rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dtu0), np.asarray(dtu1),
                               rtol=1e-5, atol=1e-5)

    def test_admm_tiled_alpha_refreshed(self, monkeypatch):
        """On the alpha-eliding tiled route, admm_solve returns alpha ==
        soft(D theta - u_scale u, lam/rho) — the exact prox of the final
        state (_refresh_alpha)."""
        from multivartv_tpu.config import SolverConfig
        from multivartv_tpu.ops import diff as diff_ops
        from multivartv_tpu.ops.prox import soft_threshold_blocks
        from multivartv_tpu.solver import admm
        from multivartv_tpu.solver.problem import Problem, build_operators

        m = (32, 128)
        monkeypatch.setattr(pk, "_tile_rows", lambda mm: 8)
        monkeypatch.setattr(admm, "FORCE_FUSED_INTERPRET", True)
        rng = np.random.RandomState(23)
        deltas = jnp.asarray([0.4, 0.9], jnp.float32)
        counts = jnp.asarray(rng.poisson(2, m).astype(np.float32))
        oty = jnp.asarray(rng.randn(*m).astype(np.float32)) * counts
        problem = Problem(counts=counts, oty=oty,
                          ybar=jnp.sum(oty) / jnp.sum(counts),
                          flat_idx=jnp.zeros((1,), jnp.int32),
                          y=jnp.zeros((1,), jnp.float32))
        lam = jnp.asarray(0.08, jnp.float32)
        cfg = SolverConfig(chunk_iters=1, cg_fixed_iters=3, max_iters=25,
                           use_pallas=True)
        ops = build_operators(m, deltas, cfg, jnp.float32)
        s0 = admm.initial_state(ops, problem, rho0=lam / 5.0)
        out = admm.admm_solve(ops, problem, lam, s0, cfg)
        d_theta = ops.apply_D(out.theta)
        want = soft_threshold_blocks(
            tuple(dt - out.u_scale * w for dt, w in zip(d_theta, out.u)),
            lam / out.rho)
        for got, ref in zip(out.alpha, want):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-6)

    @pytest.mark.parametrize("tile_rows", [8, 16])
    def test_tiled_rhs_matches_jnp(self, tile_rows):
        from multivartv_tpu.ops import diff as diff_ops
        bins, scales, theta, u = self._setup(seed=9)
        alpha = tuple(
            jnp.asarray(np.random.RandomState(2).randn(*self.M), jnp.float32)
            * diff_ops.edge_mask(self.M, b, jnp.float32) for b in bins)
        oty = jnp.asarray(np.random.RandomState(3).randn(*self.M),
                          jnp.float32)
        rho = jnp.asarray(0.07, jnp.float32)
        uscale = jnp.asarray(0.5, jnp.float32)

        b = pk.rhs_tiled_2d(alpha, u, oty, rho, uscale, scales,
                            interpret=True, tile_rows=tile_rows)
        au = tuple(a + uscale * w for a, w in zip(alpha, u))
        want = oty + rho * diff_ops.apply_Dt(au, bins, scales)
        np.testing.assert_allclose(np.asarray(b), np.asarray(want),
                                   atol=1e-5)

    def test_tiled_gate(self):
        bins = (((1, 1), (0, 1), (1, 0)))
        assert pk.tiled_supported((2048, 2048), bins)
        assert pk.tiled_supported((4096, 4096), bins)
        assert not pk.tiled_supported((2048, 2049), bins)  # lane-unaligned
        assert not pk.tiled_supported((100,), bins)

    def test_admm_solve_through_tiled_path(self, monkeypatch):
        """make_admm_iteration routes large aligned lattices through the
        tiled kernels; the converged solve matches the jnp path."""
        from multivartv_tpu.config import SolverConfig
        from multivartv_tpu.solver import admm
        from multivartv_tpu.solver.problem import Problem, build_operators

        m = (32, 128)
        monkeypatch.setattr(pk, "_tile_rows", lambda mm: 8)
        monkeypatch.setattr(admm, "FORCE_FUSED_INTERPRET", True)
        rng = np.random.RandomState(11)
        deltas = jnp.asarray([0.4, 0.9], jnp.float32)
        counts = jnp.asarray(rng.poisson(2, m).astype(np.float32))
        oty = jnp.asarray(rng.randn(*m).astype(np.float32)) * counts
        problem = Problem(counts=counts, oty=oty,
                          ybar=jnp.sum(oty) / jnp.sum(counts),
                          flat_idx=jnp.zeros((1,), jnp.int32),
                          y=jnp.zeros((1,), jnp.float32))
        lam = jnp.asarray(0.08, jnp.float32)
        # chunk_iters=1 keeps the per-iteration body (kernel 5 would
        # otherwise take over under FORCE_FUSED_INTERPRET); max_iters
        # bounds the interpret-mode runtime.
        cfg = SolverConfig(chunk_iters=1, cg_fixed_iters=3, max_iters=40,
                           use_pallas=True)
        ops = build_operators(m, deltas, cfg, jnp.float32)
        assert pk.tiled_supported(m, ops.binaries)
        s0 = admm.initial_state(ops, problem, rho0=lam / 5.0)
        out = admm.admm_solve(ops, problem, lam, s0, cfg)

        monkeypatch.setattr(admm, "FORCE_FUSED_INTERPRET", False)
        cfg_ref = SolverConfig(chunk_iters=1, cg_fixed_iters=3,
                               max_iters=40, use_pallas=False)
        ref = admm.admm_solve(ops, problem, lam, s0, cfg_ref)
        assert int(out.counter) == int(ref.counter)
        np.testing.assert_allclose(np.asarray(out.theta),
                                   np.asarray(ref.theta), atol=2e-4)

    @pytest.mark.parametrize("tile_rows", [8, 16])
    def test_tiled_gram_matches_jnp(self, tile_rows):
        from multivartv_tpu.ops import diff as diff_ops
        bins, scales, theta, _ = self._setup(seed=13)
        counts = jnp.asarray(
            np.random.RandomState(4).poisson(2, self.M).astype(np.float32))
        rho = jnp.asarray(0.13, jnp.float32)
        got = pk.gram_matvec_tiled_2d(theta, counts, rho, scales,
                                      interpret=True, tile_rows=tile_rows)
        want = counts * theta + rho * diff_ops.apply_gram(theta, bins,
                                                          scales)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    @pytest.mark.parametrize("tile_rows", [8, 16])
    def test_tiled_gram_residual_matches_jnp(self, tile_rows):
        """r0 = b - A v with the subtraction fused in-kernel (r4)."""
        from multivartv_tpu.ops import diff as diff_ops
        bins, scales, theta, _ = self._setup(seed=17)
        rng = np.random.RandomState(5)
        counts = jnp.asarray(rng.poisson(2, self.M).astype(np.float32))
        b = jnp.asarray(rng.randn(*self.M).astype(np.float32))
        rho = jnp.asarray(0.13, jnp.float32)
        got = pk.gram_residual_tiled_2d(b, theta, counts, rho, scales,
                                        interpret=True,
                                        tile_rows=tile_rows)
        want = b - (counts * theta
                    + rho * diff_ops.apply_gram(theta, bins, scales))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
