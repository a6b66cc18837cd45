"""Explicit shard_map halo-exchange solver vs the single-device solver,
on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from multivartv_tpu.config import SolverConfig
from multivartv_tpu.ops import diff
from multivartv_tpu.parallel import halo
from multivartv_tpu.solver.admm import admm_solve, initial_state
from multivartv_tpu.solver.problem import build_operators
from test_admm import make_2d_problem


def _mesh(shape, names):
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (1, 8), (2, 1)])
def test_sharded_matches_single_device(mesh_shape):
    data, y, _, spec = make_2d_problem(n=2000, m=(16, 24))
    cfg = SolverConfig(x_solver="jacobi_pcg", cg_fixed_iters=10,
                       use_pallas=False)
    ops = build_operators(spec.m, spec.deltas, cfg)
    from multivartv_tpu.solver.problem import build_problem
    problem = build_problem(spec, jnp.asarray(data, jnp.float32),
                            jnp.asarray(y, jnp.float32))
    lam = jnp.asarray(0.08, jnp.float32)
    rho0 = lam / 5.0

    ref_state = admm_solve(ops, problem, lam,
                           initial_state(ops, problem, rho0), cfg)

    mesh = _mesh(mesh_shape, ("sx", "sy"))
    scales = tuple(float(s) for s in ops.scales)
    res = halo.sharded_admm_solve(
        mesh, problem.counts, problem.oty, ops.gram_diagonal,
        float(problem.ybar), scales, lam, rho0, cfg)

    assert int(res.iters) == int(ref_state.counter)
    got = np.asarray(res.theta)
    want = np.asarray(ref_state.theta)
    assert np.allclose(got, want, atol=5e-3), np.abs(got - want).max()


def test_dist_shifts_match_global():
    mesh = _mesh((4,), ("sx",))
    x = jnp.asarray(np.random.RandomState(0).randn(16, 8).astype(np.float32))

    from functools import partial
    from jax.sharding import PartitionSpec as P

    @partial(jax.shard_map, mesh=mesh, in_specs=P("sx"), out_specs=P("sx"))
    def down(v):
        return halo.dist_shift_down(v, 0, "sx", 4)

    @partial(jax.shard_map, mesh=mesh, in_specs=P("sx"), out_specs=P("sx"))
    def up(v):
        return halo.dist_shift_up(v, 0, "sx", 4)

    assert np.allclose(np.asarray(down(x)), np.roll(np.asarray(x), -1, 0))
    assert np.allclose(np.asarray(up(x)), np.roll(np.asarray(x), 1, 0))
