"""Interpolation-operator tests: gather/scatter semantics of O."""

import jax.numpy as jnp
import numpy as np

from multivartv_tpu import mesh as mesh_lib
from multivartv_tpu.ops import interp


def _simple_spec():
    return mesh_lib.MeshSpec(
        knots=(jnp.asarray([0.0, 0.5, 1.0]),),
        deltas=jnp.asarray([0.5]),
        m=(3,),
        regular=True,
    )


def test_nearest_interp_matrix_fixture():
    # Reference test_nearest_interp_matrix (code/test_utils.py:52-57):
    # data [0.1, 0.9], mesh [0, .5, 1], theta = mesh * [1,2,3] ->
    # O theta = [0, 3].
    spec = _simple_spec()
    theta = jnp.asarray([0.0, 0.5, 1.0]) * jnp.asarray([1.0, 2.0, 3.0])
    idx = interp.flat_knot_indices(spec, jnp.asarray([[0.1], [0.9]]))
    fits = interp.gather_fitted(theta, idx)
    assert np.allclose(np.asarray(fits), [0.0, 3.0])


def test_counts_and_oty(rng):
    data = rng.uniform(-1, 1, (500, 2))
    y = rng.randn(500).astype(np.float32)
    spec = mesh_lib.make_mesh_spec(jnp.asarray(data), [6, 4])
    idx = np.asarray(interp.flat_knot_indices(spec, jnp.asarray(data)))
    counts = np.asarray(interp.knot_counts(jnp.asarray(idx), spec.m))
    oty = np.asarray(interp.scatter_to_lattice(jnp.asarray(y), jnp.asarray(idx), spec.m))
    want_counts = np.bincount(idx, minlength=24).reshape(6, 4)
    want_oty = np.bincount(idx, weights=y, minlength=24).reshape(6, 4)
    assert np.allclose(counts, want_counts)
    assert np.allclose(oty, want_oty, atol=1e-4)
    assert counts.sum() == 500


def test_masked_counts(rng):
    data = rng.uniform(0, 1, (100, 1))
    spec = mesh_lib.make_mesh_spec(jnp.asarray(data), [5])
    idx = interp.flat_knot_indices(spec, jnp.asarray(data))
    mask = jnp.asarray((np.arange(100) % 2).astype(np.float32))
    counts = interp.knot_counts(idx, spec.m, weights=mask)
    assert float(jnp.sum(counts)) == 50.0


def test_pointcloud_matches_lattice(rng):
    data = rng.uniform(-1, 1, (300, 2)).astype(np.float32)
    spec = mesh_lib.make_mesh_spec(jnp.asarray(data), [5, 7])
    pts = mesh_lib.lattice_points(spec.knots, spec.m)
    # Point-cloud brute force returns indices into the reference-order
    # point list; convert lattice multi-indices to the same order.
    multi = mesh_lib.nearest_knot_multi_index(spec, jnp.asarray(data))
    want = np.asarray(mesh_lib.flat_index_ref(multi, spec.m))
    got = np.asarray(interp.nearest_pointcloud_indices(jnp.asarray(data), pts))
    assert (got == want).mean() > 0.999  # float32 distance ties excepted
    # chunked path
    got2 = np.asarray(interp.nearest_pointcloud_indices(jnp.asarray(data), pts, chunk=64))
    assert (got2 == got).all()
