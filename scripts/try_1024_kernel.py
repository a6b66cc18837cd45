"""Experiment: raise the one-kernel ADMM gate to 1024^2 (v5e VMEM is
96 MB per the compiler params, the gate still assumes ~16 MB) and check
(a) Mosaic compiles, (b) parity vs the jnp path, (c) iters/s."""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from bench import _make, _slope_time
from multivartv_tpu.config import SolverConfig
from multivartv_tpu.ops import pallas_kernels as pk
from multivartv_tpu.solver import admm
from multivartv_tpu.solver.admm import admm_fixed_iterations, initial_state

# Raise the whole-lattice gates to 4 MB lattices (1024^2 f32).
def _gate(m, binaries):
    if len(m) != 2 or len(binaries) != 3:
        return False
    return int(np.prod(m)) * 4 <= (4 << 20) and \
        2 * (m[0] * m[0] + m[1] * m[1]) <= (16 << 20)

pk.xupdate_supported = _gate

M = (1024, 1024)
cfg = SolverConfig()
ops, problem = _make(M, 1 << 21, cfg)
lam = jnp.asarray(0.05, jnp.float32)
state0 = initial_state(ops, problem, rho0=lam / 5.0)
assert admm.fused_iterations_available(ops, problem, cfg, False)

@partial(jax.jit, static_argnums=(1,))
def run(st, n):
    return admm_fixed_iterations(ops, problem, lam, st, cfg, n).theta

# parity vs the XLA packed path over 12 iterations
import dataclasses
cfg_ref = dataclasses.replace(cfg, use_pallas=False, xla_packed=False,
                              chunk_iters=1)

@jax.jit
def run_ref(st):
    return admm_fixed_iterations(ops, problem, lam, st, cfg_ref, 12,
                                 batched=False).theta

t_kernel = np.asarray(jax.block_until_ready(run(state0, 12)))
t_ref = np.asarray(jax.block_until_ready(run_ref(state0)))
err = np.max(np.abs(t_kernel - t_ref)) / max(1e-9, np.abs(t_ref).max())
print(f"parity rel err over 12 iters: {err:.2e}", flush=True)

per_s, dt, _ = _slope_time(run, state0, 100, 1100, repeats=2)
print(f"1024^2 one-kernel: {per_s:.1f} iters/s ({1e6/per_s:.1f} us/iter)",
      flush=True)
