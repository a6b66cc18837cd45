"""The grid=(B,) batched fused-ADMM kernel (kernel 6) and its drivers:
parity vs the unbatched kernel and vs vmapped jnp solves, activity-mask
freeze semantics, and the shared-problem (lambda sweep) variant.

All kernels run in Pallas interpret mode on the CPU harness; the lattice
(16, 128) satisfies the batched DMA alignment gate (sublane % 8,
lane % 128).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multivartv_tpu.config import SolverConfig
from multivartv_tpu.ops import pallas_kernels as pk
from multivartv_tpu.solver import admm
from multivartv_tpu.solver.problem import Problem, build_operators

M = (16, 128)
B = 3


@pytest.fixture()
def force_fused(monkeypatch):
    monkeypatch.setattr(admm, "FORCE_FUSED_INTERPRET", True)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(31)
    deltas = jnp.asarray([0.3, 0.8], jnp.float32)
    cfg = SolverConfig(cg_fixed_iters=3)
    ops = build_operators(M, deltas, cfg, jnp.float32)
    counts = jnp.asarray(rng.poisson(3, (B,) + M).astype(np.float32))
    oty = jnp.asarray(rng.randn(B, *M).astype(np.float32)) * counts
    problems = Problem(
        counts=counts, oty=oty,
        ybar=jnp.sum(oty, axis=(1, 2)) / jnp.sum(counts, axis=(1, 2)),
        flat_idx=jnp.zeros((B, 1), jnp.int32),
        y=jnp.zeros((B, 1), jnp.float32))
    lams = jnp.asarray([0.05, 0.1, 0.2], jnp.float32)
    return ops, problems, lams, cfg


def _batched_state(ops, problems, lams):
    return jax.vmap(
        lambda pr, lam: admm.initial_state(ops, pr, rho0=lam / 5.0)
    )(problems, lams)


def test_batched_kernel_matches_unbatched(setup):
    """Each grid step of kernel 6 must reproduce kernel 5 exactly (same
    math, same VMEM-resident chain)."""
    ops, problems, lams, cfg = setup
    s0 = _batched_state(ops, problems, lams)
    K = 5
    cbars = jnp.sum(problems.counts, axis=(1, 2)) / ops.ntheta

    th_b, u_b, al_b, rho_b, us_b, stats_b = pk.admm_iters_2d_batched(
        s0.theta, s0.u, s0.alpha, problems.counts, problems.oty,
        ops.dct_halves, ops.gram_eigs_packed, lams, s0.rho, s0.u_scale,
        cbars, ops.scales, k_iters=K, n_steps=3, interpret=True)

    for b in range(B):
        th, u, al, rho, us, stats = pk.admm_iters_2d(
            s0.theta[b], tuple(w[b] for w in s0.u),
            tuple(a[b] for a in s0.alpha), problems.counts[b],
            problems.oty[b], ops.dct_halves, ops.gram_eigs_packed,
            lams[b], s0.rho[b], s0.u_scale[b], cbars[b], ops.scales,
            k_iters=K, n_steps=3, interpret=True)
        np.testing.assert_allclose(np.asarray(th_b[b]), np.asarray(th),
                                   atol=1e-6)
        np.testing.assert_allclose(float(rho_b[b]), float(rho), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(stats_b[b]),
                                   np.asarray(stats), rtol=1e-5)


def test_batched_solve_matches_vmapped_jnp(setup, force_fused):
    """admm_solve_batched == jax.vmap(admm_solve) semantics: same fixed
    points (objective parity), freeze-at-convergence, counters within the
    chunk cadence."""
    ops, problems, lams, _ = setup
    s0 = _batched_state(ops, problems, lams)

    cfg = SolverConfig(cg_fixed_iters=3, chunk_iters=4)
    assert admm.fused_batched_available(ops, problems, cfg)
    out = admm.admm_solve_batched(ops, problems, lams, s0, cfg)

    cfg_ref = SolverConfig(cg_fixed_iters=3, chunk_iters=1,
                           use_pallas=False)
    ref = jax.vmap(
        lambda pr, lam, st: admm.admm_solve(ops, pr, lam, st, cfg_ref,
                                            batched=True)
    )(problems, lams, s0)

    for b in range(B):
        pr_b = jax.tree.map(lambda a: a[b], problems)
        lam = float(lams[b])
        fid, pen = admm.objective(ops, pr_b, out.theta[b])
        obj = float(fid + lam * pen)
        fid_r, pen_r = admm.objective(ops, pr_b, ref.theta[b])
        obj_r = float(fid_r + lam * pen_r)
        assert abs(obj - obj_r) <= 2e-3 * abs(obj_r), (b, obj, obj_r)
        # Converged by its own last-evaluated Boyd criterion.
        assert float(out.primal_norm[b]) <= float(out.eps_primal[b])
        assert float(out.dual_norm[b]) <= float(out.eps_dual[b])
        assert int(out.counter[b]) <= int(ref.counter[b]) + 4


def test_activity_mask_freezes_rows(setup, force_fused):
    ops, problems, lams, cfg = setup
    s0 = _batched_state(ops, problems, lams)
    act = jnp.asarray([True, False, True])
    out = admm.admm_fused_chunk_batched(ops, problems, lams, s0, cfg, 3,
                                        active=act)
    # Frozen row: bit-identical state, scalars, counter.
    np.testing.assert_array_equal(np.asarray(out.theta[1]),
                                  np.asarray(s0.theta[1]))
    assert int(out.counter[1]) == int(s0.counter[1])
    assert float(out.rho[1]) == float(s0.rho[1])
    # Active rows advanced.
    assert int(out.counter[0]) == 3
    assert not np.allclose(np.asarray(out.theta[0]), np.asarray(s0.theta[0]))


def test_shared_problem_lambda_sweep(setup):
    """counts/oty shared across the batch (one problem, B lambdas) must
    match the per-problem variant with broadcast counts."""
    ops, problems, lams, cfg = setup
    one = jax.tree.map(lambda a: a[0], problems)
    shared_batch = jax.tree.map(
        lambda a: jnp.broadcast_to(a[0], (B,) + a.shape[1:]), problems)
    s0 = _batched_state(ops, shared_batch, lams)
    cbar = jnp.broadcast_to(jnp.sum(one.counts) / ops.ntheta, (B,))

    th_s, _, _, rho_s, _, stats_s = pk.admm_iters_2d_batched(
        s0.theta, s0.u, s0.alpha, one.counts, one.oty, ops.dct_halves,
        ops.gram_eigs_packed, lams, s0.rho, s0.u_scale, cbar, ops.scales,
        k_iters=4, n_steps=3, interpret=True)
    th_p, _, _, rho_p, _, stats_p = pk.admm_iters_2d_batched(
        s0.theta, s0.u, s0.alpha, shared_batch.counts, shared_batch.oty,
        ops.dct_halves, ops.gram_eigs_packed, lams, s0.rho, s0.u_scale,
        cbar, ops.scales, k_iters=4, n_steps=3, interpret=True)
    np.testing.assert_allclose(np.asarray(th_s), np.asarray(th_p),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(rho_s), np.asarray(rho_p))
    np.testing.assert_allclose(np.asarray(stats_s), np.asarray(stats_p),
                               rtol=1e-6)


def test_batched_supported_gate():
    from multivartv_tpu.ops import diff
    bins2 = diff.fd_binaries(2)
    assert pk.batched_supported((512, 512), bins2)
    assert pk.batched_supported((16, 128), bins2)
    assert not pk.batched_supported((16, 24), bins2)    # lane % 128
    assert not pk.batched_supported((12, 128), bins2)   # sublane % 8
    assert not pk.batched_supported((1024, 1024), bins2)  # VMEM scratch
    assert not pk.batched_supported((8, 8, 8), diff.fd_binaries(3))


def test_solve_path_batch_fused_matches_vmap(setup, force_fused):
    """cross_validate's engine: solve_path_batch through the fused batched
    kernel must match the vmapped jnp path (same warm-started lambda scan,
    same per-element stopping) up to kernel numerics."""
    import dataclasses
    from multivartv_tpu.config import PathConfig
    from multivartv_tpu.solver import path as path_lib

    ops, problems, lams, _ = setup
    lambdas = jnp.asarray([0.4, 0.2, 0.1, 0.05], jnp.float32)
    pcfg = PathConfig(n_lambda=4, store="mse")

    cfg_fused = SolverConfig(cg_fixed_iters=3, chunk_iters=4)
    assert admm.fused_batched_available(ops, problems, cfg_fused)
    res_f = path_lib.solve_path_batch(ops, problems, lambdas, cfg_fused,
                                      pcfg)

    cfg_ref = SolverConfig(cg_fixed_iters=3, use_pallas=False)
    assert not admm.fused_batched_available(ops, problems, cfg_ref)
    res_v = path_lib.solve_path_batch(ops, problems, lambdas, cfg_ref,
                                      pcfg)

    assert res_f.train_mse.shape == res_v.train_mse.shape == (B, 4)
    # Same fixed points along the path: compare the final-lambda thetas'
    # objectives per fold.
    for b in range(B):
        pr_b = jax.tree.map(lambda a: a[b], problems)
        lam = float(lambdas[-1])
        fid_f, pen_f = admm.objective(ops, pr_b, res_f.final_state.theta[b])
        fid_v, pen_v = admm.objective(ops, pr_b, res_v.final_state.theta[b])
        obj_f = float(fid_f + lam * pen_f)
        obj_v = float(fid_v + lam * pen_v)
        assert abs(obj_f - obj_v) <= 2e-3 * abs(obj_v), (b, obj_f, obj_v)
        # Counter parity within the chunk cadence per lambda.
        for i in range(4):
            assert int(res_f.iters[b, i]) <= int(res_v.iters[b, i]) + 4


# ---------------------------------------------------------------------------
# Alignment padding (solver/pad.py): unaligned lattices reach kernel 6.
# ---------------------------------------------------------------------------

MU = (13, 100)   # reference-default-style mesh; pads to (16, 128)


@pytest.fixture(scope="module")
def setup_unaligned():
    rng = np.random.RandomState(7)
    deltas = jnp.asarray([0.3, 0.8], jnp.float32)
    cfg = SolverConfig(cg_fixed_iters=3)
    ops = build_operators(MU, deltas, cfg, jnp.float32)
    counts = jnp.asarray(rng.poisson(3, (B,) + MU).astype(np.float32))
    oty = jnp.asarray(rng.randn(B, *MU).astype(np.float32)) * counts
    problems = Problem(
        counts=counts, oty=oty,
        ybar=jnp.sum(oty, axis=(1, 2)) / jnp.sum(counts, axis=(1, 2)),
        flat_idx=jnp.zeros((B, 1), jnp.int32),
        y=jnp.zeros((B, 1), jnp.float32))
    lams = jnp.asarray([0.05, 0.1, 0.2], jnp.float32)
    return ops, problems, lams, cfg


def _pseudo_obj(ops, counts, oty, theta, lam):
    from multivartv_tpu.ops import diff as diff_ops
    fid = 0.5 * (jnp.sum(counts * jnp.square(theta))
                 - 2.0 * jnp.sum(oty * theta))
    pen = diff_ops.blocks_abs_sum(ops.apply_D(theta))
    return float(fid + lam * pen)


def test_unaligned_gate_via_padding(setup_unaligned):
    """Odd/unaligned meshes qualify for the fused batched path (the
    reference-default m = floor(sqrt(N)) case, MultivarTV.R:44-48)."""
    ops, problems, lams, cfg = setup_unaligned
    from multivartv_tpu.solver import pad as pad_lib
    assert pad_lib.pad_target_m(MU) == (16, 128)
    assert not pk.batched_supported(MU, ops.binaries)
    try:
        admm.FORCE_FUSED_INTERPRET = True
        assert admm.fused_batched_available(ops, problems, cfg)
    finally:
        admm.FORCE_FUSED_INTERPRET = False


def test_padded_batched_solve_matches_vmapped_jnp(setup_unaligned,
                                                  force_fused):
    """Padded fused solve converges to the same objective as the unpadded
    vmapped jnp solve at f32 convergence tolerance: the r5 exact route
    masks the TV penalty to the true problem's rows at the prox
    (solver/pad.py accuracy note), eliminating the former ~1e-4
    pad-distortion window (measured relative gap ~5e-7 here)."""
    ops, problems, lams, cfg = setup_unaligned
    s0 = _batched_state(ops, problems, lams)
    out = admm.admm_solve_batched(ops, problems, lams, s0, cfg)
    assert out.theta.shape == (B,) + MU

    ref = jax.vmap(
        lambda pr, lam, st: admm.admm_solve(ops, pr, lam, st, cfg,
                                            batched=True)
    )(problems, lams, s0)

    for b in range(B):
        obj_pad = _pseudo_obj(ops, problems.counts[b], problems.oty[b],
                              out.theta[b], float(lams[b]))
        obj_ref = _pseudo_obj(ops, problems.counts[b], problems.oty[b],
                              ref.theta[b], float(lams[b]))
        scale = max(abs(obj_ref), 1e-6)
        assert abs(obj_pad - obj_ref) <= 2e-5 * scale, (b, obj_pad, obj_ref)
        # Cropped blocks keep the real-lattice edge-zero convention.
        from multivartv_tpu.ops import diff as diff_ops
        for a, bits in zip(out.alpha, ops.binaries):
            mask = np.broadcast_to(
                np.asarray(diff_ops.edge_mask(MU, bits)), MU)
            assert np.all(np.asarray(a[b])[mask == 0] == 0.0)
    # Both converged within the cap.
    assert np.all(np.asarray(out.counter) < cfg.max_iters)
