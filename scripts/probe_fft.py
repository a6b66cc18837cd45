import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from functools import partial
import numpy as np

for n in (2048, 4096):
    x0 = jnp.asarray(np.random.RandomState(0).randn(n, n), jnp.float32)
    @partial(jax.jit, static_argnums=(1,))
    def run(x, k):
        def body(_, v):
            w = jax.scipy.fft.dctn(v, type=2, norm="ortho")
            return jax.scipy.fft.idctn(w * 1.0000001, type=2, norm="ortho")
        return jax.lax.fori_loop(0, k, body, x)
    # correctness: one roundtrip ~ identity
    y = run(x0, 1)
    jax.block_until_ready(y)
    err = float(jnp.max(jnp.abs(y - x0)))
    ts = {}
    for k in (10, 110):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x0, k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    per = (ts[110] - ts[10]) / 100
    print(f"n={n}: roundtrip {per*1e6:.1f} us  (t10={ts[10]*1e3:.1f}ms t110={ts[110]*1e3:.1f}ms, err={err:.2e})", flush=True)
