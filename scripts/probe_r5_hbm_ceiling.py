"""r5 probe: practical HBM streaming ceiling via a 512MB fold-proof copy chain
(traced-scalar multiplier).  Measured 660 GB/s = 0.81x book on one v5e."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from functools import partial

def slope(fn, args, lo, hi):
    float(fn(*args, lo))
    tlo = min([(lambda t0: (float(fn(*args, lo)), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(3)])
    float(fn(*args, hi))
    thi = min([(lambda t0: (float(fn(*args, hi)), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(3)])
    return (thi - tlo)/(hi - lo)

rows, m2 = 16384, 8192   # 512 MB f32
x = jax.jit(lambda s: jax.random.normal(jax.random.PRNGKey(s), (rows, m2), jnp.float32))(0)
gb = rows*m2*4*2/1e9

@partial(jax.jit, static_argnums=(1,))
def chain_jnp(x0, k):
    def body(i, carry):
        v, s = carry
        return v * s, s + jnp.float32(1e-12)
    v, s = jax.lax.fori_loop(0, k, body, (x0, jnp.float32(1.0)))
    return jnp.sum(v)
dt = slope(chain_jnp, (x,), 20, 120)
print(f"jnp 512MB mul: {dt*1e3:.3f} ms -> {gb/dt:.0f} GB/s total traffic")

# pallas blockspec copy on the 512MB array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from multivartv_tpu.ops import pallas_kernels as pk
T = 512
n_tiles = rows // T
def _k(x_ref, o_ref):
    o_ref[:] = x_ref[:]
def copy(v):
    tile_spec = pl.BlockSpec((T, m2), lambda t: (t, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(_k, grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((rows, m2), jnp.float32),
        in_specs=[tile_spec], out_specs=tile_spec,
        compiler_params=pk._params())(v)
@partial(jax.jit, static_argnums=(1,))
def chain_p(x0, k):
    def body(i, carry):
        v, s = carry
        return copy(v * s), s + jnp.float32(1e-12)
    v, s = jax.lax.fori_loop(0, k, body, (x0, jnp.float32(1.0)))
    return jnp.sum(v)
gb2 = rows*m2*4*4/1e9
dt = slope(chain_p, (x,), 20, 120)
print(f"pallas copy + jnp mul 512MB: {dt*1e3:.3f} ms -> {gb2/dt:.0f} GB/s total")
