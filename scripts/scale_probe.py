import sys, time
sys.path.insert(0, '/root/repo')
from multivartv_tpu.config import SolverConfig
import bench
cfg = SolverConfig()
for m, n, lo, hi in [((2048,2048), 1<<22, 20, 120),
                     ((4096,4096), 1<<22, 5, 30),
                     ((128,128,128), 1<<21, 20, 120)]:
    t0 = time.time()
    v = bench.measure_scale(cfg, m, n, lo, hi)
    print(f"{m}: {v:.1f} iters/s [{time.time()-t0:.0f}s]", flush=True)
