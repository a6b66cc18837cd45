"""Round-4 probe: achievable HBM bandwidth baselines at 4096^2.

CAVEAT (measured): these standalone micro-loops return nonsense over the
axon tunnel (t_hi ~= t_lo, i.e. per-call ~0) — unlike the admm-level
slope probes, which are reliable.  Kept for a local-backend rerun; do
NOT trust its numbers from a tunneled session.

(a) XLA elementwise pass (y = x * c + d): the fusion-engine ceiling.
(b) Minimal Pallas tiled copy (tiled in -> tiled out, auto BlockSpecs).
(c) Pallas copy with manual ping-pong halo DMA (the r3 kernel skeleton).

Separates "v5e streams at X GB/s" from "our kernel structure loses Y%".

Usage: python scripts/probe_r4_bw.py
"""

import functools
import time
from functools import partial

import numpy as np

M = (4096, 4096)


def slope(run, x0, lo, hi):
    import jax
    def timed(n):
        out = run(x0, n)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(x0, n)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best
    return (hi - lo) / (timed(hi) - timed(lo))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from multivartv_tpu.ops import pallas_kernels as pk

    x = jnp.asarray(np.random.RandomState(0).randn(*M).astype(np.float32))
    nbytes = x.size * 4

    @partial(jax.jit, static_argnums=(1,))
    def run_xla(v, n):
        def body(_, c):
            return c * 1.0000001 + 0.0000001
        return jax.lax.fori_loop(0, n, body, v)

    r = slope(run_xla, x, 50, 550)
    print(f"xla_elementwise: {1e6/r:.0f} us -> "
          f"{2*nbytes*r/1e9:.0f} GB/s", flush=True)

    T = pk._tile_rows(M)
    n_tiles = M[0] // T

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 1.0000001

    tile_spec = pl.BlockSpec((T, M[1]), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)

    @partial(jax.jit, static_argnums=(1,))
    def run_copy(v, n):
        def body(_, c):
            return pl.pallas_call(
                copy_kernel, grid=(n_tiles,),
                out_shape=jax.ShapeDtypeStruct(M, jnp.float32),
                in_specs=[tile_spec], out_specs=tile_spec,
                compiler_params=pk._params())(c)
        return jax.lax.fori_loop(0, n, body, v)

    r = slope(run_copy, x, 50, 550)
    print(f"pallas_tiled_copy: {1e6/r:.0f} us -> "
          f"{2*nbytes*r/1e9:.0f} GB/s", flush=True)

    H = pk.HALO

    def halo_copy_kernel(x_hbm, o_ref, x_s, sems):
        t = pl.program_id(0)
        cur = pk._halo_pingpong(t, n_tiles, T, [x_hbm], [x_s], sems)
        o_ref[:] = x_s[cur][H:T + H] * 1.0000001

    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    @partial(jax.jit, static_argnums=(1,))
    def run_halo(v, n):
        def body(_, c):
            return pl.pallas_call(
                halo_copy_kernel, grid=(n_tiles,),
                out_shape=jax.ShapeDtypeStruct(M, jnp.float32),
                in_specs=[any_spec], out_specs=tile_spec,
                scratch_shapes=[pltpu.VMEM((2, T + 2 * H, M[1]),
                                           jnp.float32),
                                pltpu.SemaphoreType.DMA((2, 1))],
                compiler_params=pk._params())(c)
        return jax.lax.fori_loop(0, n, body, v)

    r = slope(run_halo, x, 50, 550)
    print(f"pallas_halo_copy: {1e6/r:.0f} us -> "
          f"{2*nbytes*r/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
