import sys, time
sys.path.insert(0, "/root/repo")
from multivartv_tpu.config import SolverConfig
import bench
cfg = SolverConfig()
v = bench.measure_scale(cfg, (8192, 8192), 1 << 23, 3, 18)
print(f"8192^2: {v:.1f} iters/s", flush=True)
