"""r5 probe: pure-copy streaming rates through the ping-pong/BlockSpec pallas
paths vs jnp at 67MB (VMEM-residency trap demo; see CLAUDE.md r5 notes)."""
import time, sys, functools
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from multivartv_tpu.ops import pallas_kernels as pk

def slope(fn, args, lo, hi):
    float(fn(*args, lo))
    tlo = min([(lambda t0: (float(fn(*args, lo)), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(3)])
    float(fn(*args, hi))
    thi = min([(lambda t0: (float(fn(*args, hi)), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(3)])
    return (thi - tlo)/(hi - lo)

rows, m2 = 65536, 256
x = jnp.asarray(np.random.randn(rows, m2).astype(np.float32))

def make_copy_tiled(T, H):
    n_tiles = rows // T
    def _k(x_h, out_ref, x_s, sems):
        t = pl.program_id(0)
        cur = pk._halo_pingpong(t, n_tiles, T, [x_h], [x_s], sems, H=H, H_bot=0)
        out_ref[:] = x_s[cur][H:]
    def copy(v):
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        tile_spec = pl.BlockSpec((T, m2), lambda t: (t, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(_k, grid=(n_tiles,),
            out_shape=jax.ShapeDtypeStruct((rows, m2), jnp.float32),
            in_specs=[any_spec], out_specs=tile_spec,
            scratch_shapes=[pltpu.VMEM((2, T + H, m2), jnp.float32),
                            pltpu.SemaphoreType.DMA((2, 1))],
            compiler_params=pk._params())(v)
    return copy

def make_copy_bs(T):
    n_tiles = rows // T
    def _k(x_ref, o_ref):
        o_ref[:] = x_ref[:]
    def copy(v):
        tile_spec = pl.BlockSpec((T, m2), lambda t: (t, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(_k, grid=(n_tiles,),
            out_shape=jax.ShapeDtypeStruct((rows, m2), jnp.float32),
            in_specs=[tile_spec], out_specs=tile_spec,
            compiler_params=pk._params())(v)
    return copy

def mk(copy):
    @partial(jax.jit, static_argnums=(1,))
    def chain(x0, k):
        def body(i, v):
            return copy(v.at[0, 0].add(jnp.float32(1.0) + i))
        return jnp.sum(jax.lax.fori_loop(0, k, body, x0))
    return chain

gb = rows*m2*4*2/1e9
for name, c in (("pingpong T=2048 H=264", make_copy_tiled(2048, 264)),
                ("pingpong T=2048 H=8", make_copy_tiled(2048, 8)),
                ("blockspec T=2048", make_copy_bs(2048)),
                ("blockspec T=512", make_copy_bs(512))):
    dt = slope(mk(c), (x,), 50, 450)
    print(f"{name}: {dt*1e3:.3f} ms  -> {gb/dt:.0f} GB/s"); sys.stdout.flush()

# jnp copy ceiling
@partial(jax.jit, static_argnums=(1,))
def chain_jnp(x0, k):
    def body(i, v):
        return (v.at[0, 0].add(jnp.float32(1.0) + i)) * jnp.float32(1.0000001)
    return jnp.sum(jax.lax.fori_loop(0, k, body, x0))
dt = slope(chain_jnp, (x,), 50, 450)
print(f"jnp mul: {dt*1e3:.3f} ms -> {gb/dt:.0f} GB/s")
