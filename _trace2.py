import numpy as np
from hypo_tpu.poa.full_runner import FullDeviceRunner
from hypo_tpu.poa.jax_poa import encode_global

orig = FullDeviceRunner._dispatch_full
count = [0]

def dispatch(self, grp, scores, N, L, K):
    if count[0] == 0:
        B = len(grp)
        Bp = 1 << max(0, (B - 1).bit_length())
        arms = np.zeros((Bp, K, L), np.int32)
        alen = np.zeros((Bp, K), np.int32)
        amode = np.zeros((Bp, K), np.int32)
        narms = np.zeros(Bp, np.int32)
        for b, job in enumerate(grp):
            narms[b] = len(job.seqs)
            for k, (s, md) in enumerate(job.seqs):
                codes = encode_global(s)
                arms[b, k, :len(codes)] = codes
                alen[b, k] = len(codes)
                amode[b, k] = md
        np.savez("/tmp/bucket0.npz", arms=arms, alen=alen, amode=amode,
                 narms=narms, caps=np.array([N, L, K]),
                 scores=np.array(scores))
        print("[saved bucket0]", flush=True)
        raise SystemExit(0)
    count[0] += 1
    return orig(self, grp, scores, N, L, K)

FullDeviceRunner._dispatch_full = dispatch
from hypo_tpu.cli import main
import sys
sys.argv = ["hypo_tpu", "-r", "/tmp/bench1m/reads.fq.gz",
            "-d", "/tmp/bench1m/draft.fa", "-b", "/tmp/bench1m/sr.bam",
            "-c", "30", "-s", "1m", "-t", "8", "--device-poa",
            "-o", "/tmp/bench1m/polished_x.fa"]
main()
