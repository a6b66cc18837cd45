"""Mesh + indexing tests, modeled on the reference's hand-checkable pytest
fixtures (code/test_utils.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multivartv_tpu import mesh as mesh_lib
from multivartv_tpu.config import MeshConfig


def test_mesh_spacing_matches_reference_python():
    # Reference test_mesh_coords (code/test_utils.py:61-64): 6 knots over
    # [0.01, 0.99] padded by eps=0.01 -> knot spacing 0.20.
    data = np.linspace(0.01, 0.99, 10).reshape(10, 1)
    spec = mesh_lib.make_mesh_spec(
        jnp.asarray(data), [6], config=MeshConfig(eps=0.01, delta_mode="py"))
    assert np.round(float(spec.deltas[0]), 2) == 0.20
    knots = np.asarray(spec.knots[0])
    assert np.allclose(knots, np.linspace(0.0, 1.0, 6), atol=1e-6)


def test_deltas_cpp_mode_divides_by_m():
    # C++ create_deltas (utils.cpp:256-263): (range + 2 eps) / m.
    data = np.linspace(0.0, 1.0, 10).reshape(10, 1)
    spec = mesh_lib.make_mesh_spec(
        jnp.asarray(data), [5], config=MeshConfig(eps=1e-4, delta_mode="cpp"))
    assert np.isclose(float(spec.deltas[0]), (1.0 + 2e-4) / 5, atol=1e-6)


def test_lattice_points_reference_order():
    # create_mesh linearization: axis 0 fastest (utils.cpp:245-252).
    knots = (jnp.asarray([0.0, 1.0, 2.0]), jnp.asarray([10.0, 20.0]))
    pts = np.asarray(mesh_lib.lattice_points(knots, (3, 2)))
    expected = np.array([
        [0, 10], [1, 10], [2, 10],
        [0, 20], [1, 20], [2, 20],
    ], float)
    assert np.allclose(pts, expected)


def test_flat_index_ref_matches_tensor2vector():
    # Reference t2v on a (3,3,3) lattice: (0,0,0)->0, (2,2,2)->26
    # (code/test_utils.py:10-29).
    m = (3, 3, 3)
    idx = jnp.asarray([[0, 0, 0], [2, 2, 2], [1, 0, 0], [0, 1, 0]])
    flat = np.asarray(mesh_lib.flat_index_ref(idx, m))
    assert flat.tolist() == [0, 26, 1, 3]


def test_flatten_ref_order_roundtrip():
    m = (3, 4, 2)
    x = jnp.arange(24.0).reshape(m)
    v = mesh_lib.flatten_ref_order(x)
    back = mesh_lib.unflatten_ref_order(v, m)
    assert np.allclose(np.asarray(back), np.asarray(x))
    # Spot-check the ordering against flat_index_ref.
    multi = jnp.asarray([[1, 2, 1]])
    k = int(mesh_lib.flat_index_ref(multi, m)[0])
    assert float(v[k]) == float(x[1, 2, 1])


def test_nearest_knot_regular_matches_bruteforce(rng):
    data = rng.uniform(-1, 1, size=(200, 2))
    spec = mesh_lib.make_mesh_spec(jnp.asarray(data), [7, 5])
    pts = np.asarray(mesh_lib.lattice_points(spec.knots, spec.m))
    multi = np.asarray(mesh_lib.nearest_knot_multi_index(spec, jnp.asarray(data)))
    flat_ref = np.asarray(mesh_lib.flat_index_ref(jnp.asarray(multi), spec.m))
    # brute force in float64 (reference nearest1, utils.cpp:280-287)
    d = ((data[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    brute = d.argmin(1)
    assert (flat_ref == brute).all()


def test_nearest_knot_tie_breaks_low():
    # Reference index_min picks the first (lowest) index on exact ties.
    spec = mesh_lib.MeshSpec(
        knots=(jnp.asarray([0.0, 1.0]),),
        deltas=jnp.asarray([1.0]),
        m=(2,),
        regular=True,
    )
    idx = np.asarray(mesh_lib.nearest_knot_multi_index(spec, jnp.asarray([[0.5]])))
    assert idx[0, 0] == 0


def test_nearest_knot_irregular_knots():
    spec = mesh_lib.MeshSpec(
        knots=(jnp.asarray([0.0, 0.1, 1.0]),),
        deltas=jnp.asarray([0.5]),
        m=(3,),
        regular=False,
    )
    data = jnp.asarray([[-5.0], [0.04], [0.06], [0.54], [0.56], [2.0]])
    idx = np.asarray(mesh_lib.nearest_knot_multi_index(spec, data))[:, 0]
    assert idx.tolist() == [0, 0, 1, 1, 2, 2]


def test_nearest1_reference_fixture():
    # Reference test_nearest1 (code/test_utils.py:46-50).
    spec = mesh_lib.MeshSpec(
        knots=(jnp.asarray([0.0, 0.5, 1.0]),),
        deltas=jnp.asarray([0.5]),
        m=(3,),
        regular=True,
    )
    idx = np.asarray(
        mesh_lib.nearest_knot_multi_index(spec, jnp.asarray([[0.1], [0.9]])))
    assert idx[:, 0].tolist() == [0, 2]


def test_mesh_spec_from_points_roundtrip():
    data = np.random.RandomState(0).uniform(0, 1, (50, 2))
    import jax.numpy as jnp2
    spec = mesh_lib.make_mesh_spec(jnp2.asarray(data), [4, 3])
    pts = np.asarray(mesh_lib.lattice_points(spec.knots, spec.m))
    spec2 = mesh_lib.mesh_spec_from_points(pts, (4, 3))
    for a, b in zip(spec.knots, spec2.knots):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert spec2.regular


def test_mesh_spec_from_points_rejects_nonlattice():
    pts = np.random.RandomState(1).randn(12, 2)
    with pytest.raises(ValueError):
        mesh_lib.mesh_spec_from_points(pts, (4, 3))
