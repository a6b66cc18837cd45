"""TPU timing + numerics: dense-DCT vs folded(packed)-DCT x-update kernel."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multivartv_tpu.ops import dct
from multivartv_tpu.ops import pallas_kernels as pk

M = (512, 512)
LO, HI = 200, 2200


def slope(fn, s0):
    def chain(n):
        def run(s):
            return jax.lax.fori_loop(0, n, lambda _, x: fn(x), s)
        return jax.jit(run)

    lo, hi = chain(LO), chain(HI)
    jax.block_until_ready(lo(s0))
    jax.block_until_ready(hi(s0))

    def best(f):
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(s0))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(hi) - best(lo)) / (HI - LO)


def main():
    rng = np.random.RandomState(117)
    dtype = jnp.float32
    b = jnp.asarray(rng.randn(*M), dtype)
    x0 = jnp.zeros(M, dtype)
    counts = jnp.asarray(rng.poisson(4, M).astype(np.float32))
    deltas = jnp.asarray([2.0 / M[0], 2.0 / M[1]], dtype)
    eigs = dct.gram_eigenvalues(M, deltas)
    mats = dct.dct_matrices(M)
    halves = tuple(dct.dct_packed_halves(v) for v in M)
    eigsp = dct.pack_spectrum(eigs)
    scales = (jnp.ones((), dtype), deltas[1], deltas[0])
    rho = jnp.asarray(0.01, dtype)
    cbar = jnp.mean(counts)

    def dense(s):
        x, _ = pk.xupdate_pcg_2d(b, s, counts, mats, eigs, rho, cbar,
                                 scales, 3)
        return x

    def packed(s):
        x, _ = pk.xupdate_pcg_2d_packed(b, s, counts, halves, eigsp, rho,
                                        cbar, scales, 3)
        return x

    xd = jax.jit(dense)(x0)
    xp = jax.jit(packed)(x0)
    jax.block_until_ready((xd, xp))
    print("max|dense-packed| =", float(jnp.max(jnp.abs(xd - xp))),
          " max|x| =", float(jnp.max(jnp.abs(xd))))
    td = slope(dense, x0)
    tp = slope(packed, x0)
    print(f"dense : {td*1e6:8.2f} us/solve")
    print(f"packed: {tp*1e6:8.2f} us/solve   speedup {td/tp:.2f}x")


if __name__ == "__main__":
    main()
