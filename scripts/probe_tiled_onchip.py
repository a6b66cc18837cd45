import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from multivartv_tpu.ops import pallas_kernels as pk
from multivartv_tpu.ops import diff as diff_ops
from multivartv_tpu.ops.prox import soft_threshold_blocks

m = (1024, 1024)
bins = diff_ops.fd_binaries(2)
deltas = jnp.asarray([2.0/m[0], 2.0/m[1]], jnp.float32)
scales = diff_ops.delta_scales(bins, deltas)
rng = np.random.RandomState(5)
theta = jnp.asarray(rng.randn(*m), jnp.float32)
u = tuple(jnp.asarray(rng.randn(*m), jnp.float32)
          * diff_ops.edge_mask(m, b, jnp.float32) for b in bins)
counts = jnp.asarray(rng.poisson(2, m).astype(np.float32))
oty = jnp.asarray(rng.randn(*m).astype(np.float32))
kappa = jnp.asarray(0.3, jnp.float32)
uscale = jnp.asarray(0.5, jnp.float32)
rho = jnp.asarray(0.07, jnp.float32)

@jax.jit
def run_dual():
    a, un, stats = pk.dual_update_tiled_2d(theta, u, kappa, scales, u_scale=uscale)
    d_theta = diff_ops.apply_D(theta, bins, scales)
    u_eff = tuple(uscale * w for w in u)
    a_ref = soft_threshold_blocks(tuple(dt - w for dt, w in zip(d_theta, u_eff)), kappa)
    r_ref = tuple(x - dt for x, dt in zip(a_ref, d_theta))
    un_ref = tuple(w + r for w, r in zip(u_eff, r_ref))
    errs = [jnp.max(jnp.abs(x - y)) for x, y in zip(a, a_ref)]
    errs += [jnp.max(jnp.abs(x - y)) for x, y in zip(un, un_ref)]
    stats_ref = jnp.stack([
        diff_ops.blocks_norm_sq(r_ref),
        diff_ops.blocks_norm_sq(d_theta),
        diff_ops.blocks_norm_sq(a_ref),
        jnp.sum(jnp.square(diff_ops.apply_Dt(r_ref, bins, scales))),
        jnp.sum(jnp.square(diff_ops.apply_Dt(un_ref, bins, scales))),
    ])
    return jnp.stack(errs), stats, stats_ref

@jax.jit
def run_rhs():
    b = pk.rhs_tiled_2d(u, u, oty, rho, uscale, scales)
    au = tuple(a + uscale * w for a, w in zip(u, u))
    want = oty + rho * diff_ops.apply_Dt(au, bins, scales)
    return jnp.max(jnp.abs(b - want))

@jax.jit
def run_gram():
    g = pk.gram_matvec_tiled_2d(theta, counts, rho, scales)
    want = counts * theta + rho * diff_ops.apply_gram(theta, bins, scales)
    return jnp.max(jnp.abs(g - want))

errs, stats, stats_ref = jax.block_until_ready(run_dual())
print("dual block errs:", np.asarray(errs))
print("stats     :", np.asarray(stats))
print("stats ref :", np.asarray(stats_ref))
print("rhs err   :", float(run_rhs()))
print("gram err  :", float(run_gram()))
