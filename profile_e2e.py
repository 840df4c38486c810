"""Ad-hoc: profile bench_e2e host/device split. Not part of the package."""
import cProfile
import pstats
import sys
import time

import bench

bench._setup_cache()
t0 = time.time()
pr = cProfile.Profile()
pr.enable()
warm, cold = bench.bench_e2e(verbose=True, n_reads=102_400)
pr.disable()
print(f"e2e warm {warm:.1f} / cold {cold:.1f} reads/s, "
      f"wall {time.time() - t0:.1f}s", file=sys.stderr)
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(35)
