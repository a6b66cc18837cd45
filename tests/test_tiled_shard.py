"""shard_map tiled-kernel variants (parallel/tiled_shard.py): the
row-sharded lattice runs the tiled dual/rhs/gram-residual Pallas kernels
per shard with explicit ppermute halo exchange.  Validated on the
8-virtual-CPU-device mesh in interpret mode against the single-chip
tiled kernels (bit-level contract: same math, same masks, global stats
via psum)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multivartv_tpu.config import SolverConfig
from multivartv_tpu.ops import diff as diff_ops
from multivartv_tpu.ops import pallas_kernels as pk
from multivartv_tpu.parallel import tiled_shard as ts
from multivartv_tpu.solver import admm
from multivartv_tpu.solver.problem import Problem, build_operators

M = (256, 128)
NSX = 4


@pytest.fixture()
def small_tiles(monkeypatch):
    # Shrink the panel target so the 64-row local slabs hold >= 2 tiles.
    monkeypatch.setattr(pk, "_tile_target", lambda m1: 16)


@pytest.fixture()
def row_mesh():
    devs = jax.devices()[:NSX]
    return Mesh(np.asarray(devs), ("sx",))


def _blocks(seed=3):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(*M).astype(np.float32))
    binaries = diff_ops.fd_binaries(2, True)
    theta = mk()
    # u/alpha respect the padded-block edge-zero convention.
    u = tuple(mk() * diff_ops.edge_mask(M, b) for b in binaries)
    alpha = tuple(mk() * diff_ops.edge_mask(M, b) for b in binaries)
    return theta, u, alpha


def test_sharded_dual_matches_single(row_mesh, small_tiles):
    theta, u, _ = _blocks()
    scales = (jnp.float32(1.0), jnp.float32(0.4), jnp.float32(0.7))
    kappa = jnp.float32(0.05)
    usc = jnp.float32(0.5)
    a_ref, u_ref, st_ref = pk.dual_update_tiled_2d(
        theta, u, kappa, scales, u_scale=usc, interpret=True)
    key = ts.register_shard_mesh(row_mesh, "sx")
    a_sh, u_sh, st_sh = jax.jit(
        lambda th, uu: ts.dual_update_tiled_2d_sharded(
            key, th, uu, kappa, scales, u_scale=usc, interpret=True)
    )(theta, u)
    for a, b in zip(a_ref + u_ref, a_sh + u_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_ref), np.asarray(st_sh),
                               rtol=1e-5)


def test_sharded_dual_want_alpha_elided(row_mesh, small_tiles):
    """want_alpha=False through the shard_map wrapper: u_new/stats/dta/
    dtu match the want_alpha=True call; alpha slot is None."""
    theta, u, _ = _blocks(seed=3)
    scales = (jnp.float32(1.0), jnp.float32(0.4), jnp.float32(0.7))
    kappa = jnp.float32(0.05)
    usc = jnp.float32(0.5)
    key = ts.register_shard_mesh(row_mesh, "sx")
    a1, u1, st1, dta1, dtu1 = jax.jit(
        lambda th, uu: ts.dual_update_tiled_2d_sharded(
            key, th, uu, kappa, scales, u_scale=usc, want_adjoints=True,
            interpret=True))(theta, u)
    a0, u0, st0, dta0, dtu0 = jax.jit(
        lambda th, uu: ts.dual_update_tiled_2d_sharded(
            key, th, uu, kappa, scales, u_scale=usc, want_adjoints=True,
            want_alpha=False, interpret=True))(theta, u)
    assert a0 is None and a1 is not None
    for a, b in zip(u1, u0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
    np.testing.assert_allclose(np.asarray(st1), np.asarray(st0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dta1), np.asarray(dta0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dtu1), np.asarray(dtu0),
                               rtol=1e-5, atol=1e-5)


def test_sharded_dual_with_true_m(row_mesh, small_tiles):
    """Exact-padding masks use GLOBAL rows under sharding."""
    theta, u, _ = _blocks(seed=5)
    scales = (jnp.float32(1.0), jnp.float32(0.4), jnp.float32(0.7))
    kappa = jnp.float32(0.05)
    tm = (250, 100)
    a_ref, u_ref, st_ref = pk.dual_update_tiled_2d(
        theta, u, kappa, scales, true_m=tm, interpret=True)
    key = ts.register_shard_mesh(row_mesh, "sx")
    a_sh, u_sh, st_sh = jax.jit(
        lambda th, uu: ts.dual_update_tiled_2d_sharded(
            key, th, uu, kappa, scales, true_m=tm, interpret=True)
    )(theta, u)
    for a, b in zip(a_ref + u_ref, a_sh + u_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_ref), np.asarray(st_sh),
                               rtol=1e-5)


def test_sharded_rhs_matches_single(row_mesh, small_tiles):
    _, u, alpha = _blocks(seed=7)
    rng = np.random.RandomState(11)
    oty = jnp.asarray(rng.randn(*M).astype(np.float32))
    scales = (jnp.float32(1.0), jnp.float32(0.4), jnp.float32(0.7))
    rho = jnp.float32(0.3)
    usc = jnp.float32(1.5)
    b_ref = pk.rhs_tiled_2d(alpha, u, oty, rho, usc, scales,
                            interpret=True)
    key = ts.register_shard_mesh(row_mesh, "sx")
    b_sh = jax.jit(
        lambda a, uu, o: ts.rhs_tiled_2d_sharded(
            key, a, uu, o, rho, usc, scales, interpret=True)
    )(alpha, u, oty)
    np.testing.assert_allclose(np.asarray(b_ref), np.asarray(b_sh),
                               rtol=1e-6, atol=1e-6)


def test_sharded_gram_residual_matches_single(row_mesh, small_tiles):
    rng = np.random.RandomState(13)
    v = jnp.asarray(rng.randn(*M).astype(np.float32))
    b = jnp.asarray(rng.randn(*M).astype(np.float32))
    counts = jnp.asarray(rng.poisson(3, M).astype(np.float32))
    scales = (jnp.float32(1.0), jnp.float32(0.4), jnp.float32(0.7))
    rho = jnp.float32(0.3)
    r_ref = pk.gram_residual_tiled_2d(b, v, counts, rho, scales,
                                      interpret=True)
    key = ts.register_shard_mesh(row_mesh, "sx")
    r_sh = jax.jit(
        lambda bb, vv, cc: ts.gram_residual_tiled_2d_sharded(
            key, bb, vv, cc, rho, scales, interpret=True)
    )(b, v, counts)
    np.testing.assert_allclose(np.asarray(r_ref), np.asarray(r_sh),
                               rtol=1e-6, atol=1e-6)


def test_sharded_gram_residual_rhs_fused(row_mesh, small_tiles):
    """rhs_parts through the shard_map wrapper matches an explicit b."""
    rng = np.random.RandomState(29)
    v = jnp.asarray(rng.randn(*M).astype(np.float32))
    counts = jnp.asarray(rng.poisson(3, M).astype(np.float32))
    oty = jnp.asarray(rng.randn(*M).astype(np.float32))
    dta = jnp.asarray(rng.randn(*M).astype(np.float32))
    dtu = jnp.asarray(rng.randn(*M).astype(np.float32))
    scales = (jnp.float32(1.0), jnp.float32(0.4), jnp.float32(0.7))
    rho = jnp.float32(0.3)
    usc = jnp.float32(0.7)
    b = oty + rho * (dta + usc * dtu)
    key = ts.register_shard_mesh(row_mesh, "sx")
    want = jax.jit(
        lambda bb, vv, cc: ts.gram_residual_tiled_2d_sharded(
            key, bb, vv, cc, rho, scales, interpret=True))(b, v, counts)
    got = jax.jit(
        lambda ot, da, du, vv, cc: ts.gram_residual_tiled_2d_sharded(
            key, None, vv, cc, rho, scales,
            rhs_parts=(ot, da, usc, du), interpret=True)
    )(oty, dta, dtu, v, counts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_shard_supported_gate(row_mesh, small_tiles):
    key = ts.register_shard_mesh(row_mesh, "sx")
    binaries = diff_ops.fd_binaries(2, True)
    assert ts.shard_supported(M, binaries, key)
    assert not ts.shard_supported((250, 128), binaries, key)  # rows % nsx
    assert not ts.shard_supported((256, 100), binaries, key)  # lanes
    assert not ts.shard_supported(M, binaries, None)
    assert not ts.shard_supported((16, 16, 16), binaries, key)


def test_sharded_admm_objective_parity(row_mesh, small_tiles, monkeypatch):
    """admm_solve with tiled_shard_key converges to the plain-jnp
    objective (full iteration loop through the shard_map kernels)."""
    monkeypatch.setattr(admm, "FORCE_FUSED_INTERPRET", True)
    rng = np.random.RandomState(17)
    counts = jnp.asarray(rng.poisson(3, M).astype(np.float32))
    oty = jnp.asarray(rng.randn(*M).astype(np.float32)) * counts
    problem = Problem(counts=counts, oty=oty,
                      ybar=jnp.sum(oty) / jnp.sum(counts),
                      flat_idx=jnp.zeros((1,), jnp.int32),
                      y=jnp.zeros((1,), jnp.float32))
    deltas = jnp.asarray((0.4, 0.8), jnp.float32)
    lam = jnp.float32(0.08)
    key = ts.register_shard_mesh(row_mesh, "sx")
    cfg = SolverConfig(use_pallas=False, tiled_shard_key=key,
                       chunk_iters=1)
    ops = build_operators(M, deltas, cfg, jnp.float32)
    s0 = admm.initial_state(ops, problem, rho0=lam / 5.0)
    out = jax.jit(
        lambda o, p, l, s: admm.admm_solve(o, p, l, s, cfg))(
        ops, problem, lam, s0)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(admm, "FORCE_FUSED_INTERPRET", False)
        ref_cfg = SolverConfig(use_pallas=False, chunk_iters=1)
        ref = admm.admm_solve(ops, problem, lam, s0, ref_cfg)
    fid, pen = admm.objective(ops, problem, out.theta)
    obj = float(fid + float(lam) * pen)
    fid_r, pen_r = admm.objective(ops, problem, ref.theta)
    obj_r = float(fid_r + float(lam) * pen_r)
    assert int(out.counter) < cfg.max_iters
    assert abs(obj - obj_r) <= 2e-5 * abs(obj_r)
