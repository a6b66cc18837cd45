"""Native C++ engine tests (kd-tree NN, brute NN, regular binning)."""

import numpy as np
import pytest

from multivartv_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)")


def _brute_ref(data, mesh):
    d = ((data[:, None, :] - mesh[None, :, :]) ** 2).sum(-1)
    return d.argmin(1)  # first minimum = lowest index


def test_kdtree_matches_bruteforce(rng):
    data = rng.uniform(-1, 1, (2000, 3))
    mesh = rng.uniform(-1, 1, (500, 3))
    got = native.nearest_kdtree(data, mesh)
    want = _brute_ref(data, mesh)
    assert (got == want).all()


def test_native_brute_matches_numpy(rng):
    data = rng.uniform(-1, 1, (300, 2))
    mesh = rng.uniform(-1, 1, (120, 2))
    got = native.nearest_brute(data, mesh)
    assert (got == _brute_ref(data, mesh)).all()


def test_kdtree_tie_break_low_index():
    # Two coincident mesh points: the lower index must win.
    mesh = np.array([[0.0, 0.0], [1.0, 1.0], [1.0, 1.0], [0.0, 0.0]])
    data = np.array([[0.1, 0.1], [0.9, 0.9]])
    got = native.nearest_kdtree(data, mesh)
    assert got.tolist() == [0, 1]


def test_kdtree_1d():
    mesh = np.linspace(0, 1, 11)[:, None]
    data = np.array([[0.0], [0.24], [0.26], [1.5]])
    got = native.nearest_kdtree(data, mesh)
    assert got.tolist() == [0, 2, 3, 10]


def test_bin_regular_matches_jax_path(rng):
    import jax.numpy as jnp
    from multivartv_tpu import mesh as mesh_lib
    from multivartv_tpu.ops import interp
    data = rng.uniform(-2, 3, (1500, 2))
    spec = mesh_lib.make_mesh_spec(jnp.asarray(data), (9, 13))
    want = np.asarray(interp.flat_knot_indices(spec, jnp.asarray(data)))
    knot0 = np.array([float(k[0]) for k in spec.knots])
    spacing = np.array([
        (float(k[-1]) - float(k[0])) / (len(k) - 1) for k in spec.knots])
    got = native.bin_regular(data, knot0, spacing, spec.m)
    assert (got == want).all()


def test_kdtree_speed_vs_brute(rng):
    """kd-tree should comfortably beat brute force at scale (and both must
    agree) — the reference's O(n*ntheta*p) scan is the baseline."""
    import time
    data = rng.uniform(-1, 1, (20000, 2))
    mesh = rng.uniform(-1, 1, (4000, 2))
    t0 = time.perf_counter()
    a = native.nearest_kdtree(data, mesh)
    t_tree = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = native.nearest_brute(data, mesh)
    t_brute = time.perf_counter() - t0
    assert (a == b).all()
    assert t_tree < t_brute
