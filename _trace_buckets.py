import time
import numpy as np

from hypo_tpu.poa import full_runner
from hypo_tpu.poa.full_runner import FullDeviceRunner

orig_dispatch = FullDeviceRunner._dispatch_full
orig_collect = FullDeviceRunner._collect_full

def dispatch(self, grp, scores, N, L, K):
    t0 = time.time()
    h = orig_dispatch(self, grp, scores, N, L, K)
    print(f"[trace] dispatch B={len(grp)} scores={scores} N={N} L={L} "
          f"K={K} pack={time.time()-t0:.2f}s", flush=True)
    return h

def collect(self, grp, handle):
    t0 = time.time()
    out = orig_collect(self, grp, handle)
    print(f"[trace] collect B={len(grp)} wait+host={time.time()-t0:.2f}s "
          f"spawned={len(out)}", flush=True)
    return out

FullDeviceRunner._dispatch_full = dispatch
FullDeviceRunner._collect_full = collect

from hypo_tpu.cli import main
import sys
sys.argv = ["hypo_tpu", "-r", "/tmp/bench1m/reads.fq.gz",
            "-d", "/tmp/bench1m/draft.fa", "-b", "/tmp/bench1m/sr.bam",
            "-c", "30", "-s", "1m", "-t", "8", "--device-poa",
            "-o", "/tmp/bench1m/polished_trace.fa"]
main()
