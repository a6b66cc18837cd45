"""Run the live-TPU test suite and write a committed artifact.

The on-chip numerics tests (tests/test_tpu_live.py: matched objective on
chip, batched-vs-unbatched kernels on real DMA/SMEM) are gated behind
MVTV_TPU_TESTS=1 and used to leave no evidence of having run (VERDICT r2
weak #4).  This script runs them and records pass/fail counts + the
pytest tail into TPU_TESTS_r<N>.json at the repo root.

Usage (repo root, TPU env, nothing else using the chip):
    python scripts/run_tpu_tests.py [round_number]
"""

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "03"
    env = dict(os.environ, MVTV_TPU_TESTS="1")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_tpu_live.py", "-q",
         "--no-header", "-p", "no:cacheprovider"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=3600)
    out = proc.stdout + proc.stderr
    tail = "\n".join(out.strip().splitlines()[-15:])
    m = re.search(r"(\d+) passed", out)
    passed = int(m.group(1)) if m else 0
    m = re.search(r"(\d+) failed", out)
    failed = int(m.group(1)) if m else 0
    m = re.search(r"(\d+) skipped", out)
    skipped = int(m.group(1)) if m else 0
    result = {
        "suite": "tests/test_tpu_live.py",
        "backend": "tpu",
        "rc": proc.returncode,
        "passed": passed,
        "failed": failed,
        "skipped": skipped,
        "elapsed_s": round(time.time() - t0, 1),
        "tail": tail,
    }
    path = os.path.join(ROOT, f"TPU_TESTS_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "tail"}))
    print(f"wrote {path}")
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
