"""r5.3 probe: decompose the 512^2 fused-ADMM iteration (kernel 5).

Questions and MEASURED answers (one v5e, slope method, adapt=False):

1. How much do the in-kernel fold FLIP matmuls cost?  The packed DCT's
   fold needs a half-lattice reversal per axis per transform; Mosaic
   cannot lower lax.rev, so each flip runs as an exchange-matrix matmul
   (ops/dct.py::exchange_matrix) — nominally 1/3 of the kernel's MXU
   FLOPs (16 flips x n^3/4 MACs per iteration).  MEASURED: 1.33 us of a
   28.5 us iteration (4.7%) — the flips overlap with the kernel's VPU
   work almost completely; the nominal-FLOPs view is wrong here.

2. Would a FOLDED state layout (both axes' second halves stored
   reversed, making every fold flip-free and every stencil shift a
   2-roll + seam-patch select) win?  MEASURED: 34.1 us/iter = 20%
   SLOWER.  The extra rolls/selects cost far more than the flips they
   remove.  The folded-layout implementation (exact-parity-validated on
   the CPU harness) was REVERTED on this result — layout games lose to
   Mosaic's MXU/VPU overlap at VMEM-resident sizes.

3. Per-CG-step cost: 5.9-6.2 us (n_steps sweep) vs ~4.1 us of pure MXU
   transform time at peak — the stencil matvec and axpys largely hide
   under the matmuls.  Explicitly skipping the dead last-step
   preconditioner apply (beta/p are never read after the loop) measured
   NEUTRAL: the lowering already DCEs the dead dots.  The explicit
   step+1 < n_steps guard was kept anyway (matches solver/xupdate.py,
   keeps the FLOP accounting honest), but it is not a speedup.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/probe_r5_flips.py [m0 m1]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from multivartv_tpu.ops import dct as dct_ops
from multivartv_tpu.ops import pallas_kernels as pk

M = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (512, 512)
N_STEPS = 3
dt = jnp.float32


def make_state(key):
    ks = jax.random.split(key, 9)
    sh = M
    theta = jax.random.normal(ks[0], sh, dt)
    u = tuple(jax.random.normal(ks[1 + i], sh, dt) * 0.1 for i in range(3))
    al = tuple(jax.random.normal(ks[4 + i], sh, dt) * 0.1 for i in range(3))
    counts = (jax.random.uniform(ks[7], sh, dt) * 3).astype(dt)
    oty = jax.random.normal(ks[8], sh, dt)
    return theta, u, al, counts, oty


halves = (dct_ops.dct_packed_halves(M[0], dt),
          dct_ops.dct_packed_halves(M[1], dt))
eigs = jnp.abs(jax.random.normal(jax.random.PRNGKey(7), M, dt)) + 0.1
scales = (jnp.asarray(0.01, dt), jnp.asarray(0.1, dt), jnp.asarray(0.1, dt))


def run(k_iters, n_steps):
    @jax.jit
    def go(theta, u, al, counts, oty):
        out = pk.admm_iters_2d(
            theta, u, al, counts, oty, halves, eigs,
            jnp.asarray(0.3, dt), jnp.asarray(1.0, dt), jnp.asarray(1.0, dt),
            jnp.asarray(1.0, dt), scales, k_iters, n_steps, adapt=False)
        return jnp.sum(out[0])

    return go


def slope(lo=200, hi=2200, n_steps=None):
    st = make_state(jax.random.PRNGKey(0))
    ns = N_STEPS if n_steps is None else n_steps
    f_lo, f_hi = run(lo, ns), run(hi, ns)
    float(f_lo(*st)); float(f_hi(*st))     # compile both
    t = {}
    for name, f in (("lo", f_lo), ("hi", f_hi)):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(f(*st))
            best = min(best, time.perf_counter() - t0)
        t[name] = best
        if not np.isfinite(v):
            print(f"  (non-finite checksum in {name} arm — timing only)")
    return (t["hi"] - t["lo"]) / (hi - lo)


if __name__ == "__main__":
    print(f"m={M} n_steps={N_STEPS}")
    per = slope()
    print(f"baseline: {per*1e6:.2f} us/iter  ({1.0/per:.0f} iters/s)")

    # --- no-flip arm: identity flips (wrong math, same structure) -------
    _orig0, _orig1 = dct_ops._flip0, dct_ops._flip1
    dct_ops._flip0 = lambda x, f, md, odt: x
    dct_ops._flip1 = lambda x, f, md, odt: x
    try:
        per_nf = slope()
    finally:
        dct_ops._flip0, dct_ops._flip1 = _orig0, _orig1
    print(f"no-flip:  {per_nf*1e6:.2f} us/iter  ({1.0/per_nf:.0f} iters/s)")
    print(f"flip cost: {(per-per_nf)*1e6:.2f} us/iter = "
          f"{100*(per-per_nf)/per:.1f}% of the iteration")

    # --- n_steps=0 arm: isolates the per-CG-step cost -------------------
    per_s0 = slope(n_steps=0)
    print(f"n_steps=0: {per_s0*1e6:.2f} us/iter  "
          f"(per-CG-step cost {(per-per_s0)/3*1e6:.2f} us)")
