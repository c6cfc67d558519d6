import time
import numpy as np
from hypo_tpu.poa.device_full import poa_full_batch_packed

d = np.load("/tmp/bucket0.npz")
N, L, K = [int(x) for x in d["caps"]]
m, n, g = [int(x) for x in d["scores"]]
for i in range(3):
    t0 = time.time()
    poa_full_batch_packed(d["arms"], d["alen"], d["amode"], d["narms"],
                          N=N, L=L, K=K, P=8, m=m, n=n,
                          g=g).block_until_ready()
    print(f"run{i}: {time.time()-t0:.2f}s", flush=True)
