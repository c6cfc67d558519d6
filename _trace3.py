import time
import numpy as np
from hypo_tpu.poa import full_runner
from hypo_tpu.poa.full_runner import FullDeviceRunner

orig_dt = FullDeviceRunner._dispatch_tile
orig_cf = FullDeviceRunner._collect_full

def dispatch(self, grp, ci, scores):
    t0 = time.time()
    h = orig_dt(self, grp, ci, scores)
    print(f"[t] dispatch tile B={len(grp)} class={ci} "
          f"kmax={max(len(j.seqs) for j in grp)} {time.time()-t0:.2f}s",
          flush=True)
    return h

def collect(self, grp, h):
    t0 = time.time()
    out = orig_cf(self, grp, h)
    print(f"[t] collect B={len(grp)} {time.time()-t0:.2f}s", flush=True)
    return out

FullDeviceRunner._dispatch_tile = dispatch
FullDeviceRunner._collect_full = collect

import sys
from hypo_tpu.cli import main
sys.argv = ["x", "-r", "/tmp/bench1m/reads.fq.gz", "-d",
            "/tmp/bench1m/draft.fa", "-b", "/tmp/bench1m/sr.bam",
            "-c", "30", "-s", "1m", "-t", "8", "--device-poa",
            "-o", "/tmp/bench1m/polished_t3.fa"]
main()
