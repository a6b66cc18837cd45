"""Quick scale probe: iters/s at 2048^2 / 4096^2 / 128^3 on the real TPU
(the lattices above the whole-lattice-VMEM kernel gate).  Reuses bench.py's
slope-method measurement."""

import sys
import time

sys.path.insert(0, ".")
from bench import measure_scale  # noqa: E402
from multivartv_tpu.config import SolverConfig  # noqa: E402

cfg = SolverConfig()
for name, m, n, lo, hi in [
    ("2048^2", (2048, 2048), 1 << 22, 20, 220),
    ("4096^2", (4096, 4096), 1 << 22, 10, 60),
    ("128^3", (128, 128, 128), 1 << 21, 20, 220),
    ("8192^2", (8192, 8192), 1 << 23, 3, 18),
]:
    t0 = time.perf_counter()
    try:
        r = measure_scale(cfg, m, n, lo, hi)
        print(f"{name}: {r:.1f} iters/s  [{time.perf_counter()-t0:.0f}s]",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
