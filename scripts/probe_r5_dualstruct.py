"""r5 probe: is the tiled 2-D dual kernel's ~66%-of-streaming efficiency a
stream-STRUCTURE cost (4 ping-pong ins + 8 blockspec outs + SMEM stats) or
a COMPUTE cost?  Variants at 4096^2, honest host-materialization barrier,
traced-scalar multiplier to defeat affine collapsing.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r5_dualstruct.py
"""
import sys
import time
import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multivartv_tpu.ops import pallas_kernels as pk

M = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (4096, 4096)
m0, m1 = M
T = pk._tile_rows(M)
H = pk.HALO
n_tiles = m0 // T
print(f"m={M} T={T} n_tiles={n_tiles}")


def slope(fn, args, lo, hi):
    float(fn(*args, lo))
    t_lo = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, lo))
        t_lo = min(t_lo, time.perf_counter() - t0)
    float(fn(*args, hi))
    t_hi = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, hi))
        t_hi = min(t_hi, time.perf_counter() - t0)
    return (t_hi - t_lo) / (hi - lo)


def make_struct(n_in, n_out, compute):
    """n_in ping-pong extended-panel inputs, n_out blockspec outputs,
    one SMEM stats row per tile; compute in {'none','prox','full'}."""
    def kern(*refs):
        ins_hbm = refs[:n_in]
        outs = refs[n_in:n_in + n_out]
        stats_ref = refs[n_in + n_out]
        scr = refs[n_in + n_out + 1:n_in + n_out + 1 + n_in]
        sems = refs[-1]
        t = pl.program_id(0)
        cur = pk._halo_pingpong(t, n_tiles, T, list(ins_hbm), list(scr),
                                sems)
        sl = slice(H, T + H)
        panels = [s[cur] for s in scr]
        if compute == "none":
            for i, o in enumerate(outs):
                o[:] = panels[i % n_in][sl]
            stats_ref[t, 0] = panels[0][0, 0]
        elif compute == "prox":
            th = panels[0]
            d0 = (pk._shift_down(th, 0) - th)
            d1 = (pk._shift_down(th, 1) - th)
            for i, o in enumerate(outs):
                u = panels[1 + (i % (n_in - 1))]
                z = (d0 if i % 2 else d1) - u
                a = jnp.sign(z) * jnp.maximum(jnp.abs(z) - 0.01, 0.0)
                o[:] = a[sl]
            stats_ref[t, 0] = jnp.sum(d0[sl] ** 2)

    def run(*arrs):
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        tile_spec = pl.BlockSpec((T, m1), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM)
        smem_stat = pl.BlockSpec(memory_space=pltpu.SMEM)
        shp = jax.ShapeDtypeStruct(M, jnp.float32)
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            out_shape=tuple([shp] * n_out) + (
                jax.ShapeDtypeStruct((n_tiles, 2), jnp.float32),),
            in_specs=[any_spec] * n_in,
            out_specs=tuple([tile_spec] * n_out) + (smem_stat,),
            scratch_shapes=[pltpu.VMEM((2, T + 2 * H, m1), jnp.float32)]
            * n_in + [pltpu.SemaphoreType.DMA((2, n_in))],
            compiler_params=pk._params(),
        )(*arrs)
    return run


x = [jax.device_put(jnp.zeros(M, jnp.float32)) for _ in range(4)]


def bench(n_in, n_out, compute, lo=30, hi=230):
    run = make_struct(n_in, n_out, compute)

    @partial(jax.jit, static_argnums=(0,))
    def chain(k, *ins):
        # pallas_call is opaque to XLA, so feeding output 0 back as
        # input 0 is an honest dependency chain (no affine collapse).
        def body(i, arrs):
            outs = run(*arrs)
            return tuple([outs[0]] + list(arrs[1:n_in]))
        arrs = jax.lax.fori_loop(0, k, body, tuple(ins[:n_in]))
        return sum(jnp.sum(a) for a in arrs)

    dt = slope(lambda k: chain(k, *x), (), lo, hi)
    gb = (n_in + n_out) * m0 * m1 * 4 / 1e9
    print(f"in={n_in} out={n_out} {compute}: {dt*1e3:.3f} ms "
          f"= {gb/dt:.0f} GB/s on {gb:.2f} GB kernel streams "
          f"(660 practical)")
    sys.stdout.flush()
    return dt


# The chain multiplies each input once per step (n_in extra read+write
# pairs) — report raw times; compare across variants, not to absolute BW.
bench(4, 8, "none")
bench(4, 8, "prox")
bench(4, 6, "none")
bench(1, 1, "none")
bench(4, 1, "none")
bench(1, 8, "none")
