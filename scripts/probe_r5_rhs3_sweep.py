"""r5 probe: panel-height sweep for the tiled p=3 rhs kernel at 256^3."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from multivartv_tpu.config import SolverConfig
from multivartv_tpu.ops import pallas_kernels as pk
from multivartv_tpu.ops import diff as diff_ops
from multivartv_tpu.solver.problem import build_operators

M = (256, 256, 256)
cfg = SolverConfig()
dt32 = jnp.float32

def slope(fn, args, lo, hi):
    bl = lambda r: jax.tree.map(lambda x: x.block_until_ready(), r)
    bl(fn(*args, lo))
    t0=time.perf_counter(); bl(fn(*args, lo)); t1=time.perf_counter()
    bl(fn(*args, hi))
    t2=time.perf_counter(); bl(fn(*args, hi)); t3=time.perf_counter()
    return ((t3-t2)-(t1-t0))/(hi-lo)

ops = jax.jit(lambda d: build_operators(M, d, cfg, dt32))(jnp.asarray([0.1,0.1,0.1], dt32))

@jax.jit
def mkstate(seed):
    k = jax.random.split(jax.random.PRNGKey(seed), 16)
    a = tuple(jax.random.normal(k[i], M, dt32) * diff_ops.edge_mask(M, b, dt32)
              for i, b in enumerate(ops.binaries))
    u = tuple(jax.random.normal(k[7+i], M, dt32) * diff_ops.edge_mask(M, b, dt32)
              for i, b in enumerate(ops.binaries))
    oty = jax.random.normal(k[15], M, dt32)
    return a, u, oty

alpha, u, oty = mkstate(0)
rho = jnp.float32(0.3)
usc = jnp.float32(1.0)

for T in (512, 1024, 2048):
    try:
        @partial(jax.jit, static_argnums=(4, 5))
        def chain(o, a, uu, ot, k, T):
            def body(i, b):
                a2 = tuple(x + 1e-12*b for x in a)
                return pk.rhs_tiled_3d(a2, uu, ot, rho, usc, o.scales, tile_rows=T)
            return jax.lax.fori_loop(0, k, body, ot)
        print(f"T={T} rhs_tiled3 ms:", slope(lambda o,a,uu,ot,k: chain(o,a,uu,ot,k,T), (ops, alpha, u, oty), 30, 230)*1e3)
        sys.stdout.flush()
    except Exception as e:
        print(f"T={T} failed: {type(e).__name__} {str(e)[:140]}")
