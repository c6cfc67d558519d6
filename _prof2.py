import time
import numpy as np
from hypo_tpu.poa.device_full import poa_full_batch_packed

rng = np.random.default_rng(0)
def run_shape(B, K, L, N, P=8, reps=3):
    arms = rng.integers(0, 4, size=(B, K, L)).astype(np.int32)
    alen = np.full((B, K), L, np.int32)
    amode = np.zeros((B, K), np.int32)
    narms = np.full(B, K, np.int32)
    t0 = time.time()
    poa_full_batch_packed(arms, alen, amode, narms, N=N, L=L, K=K,
                          P=P, m=5, n=-4, g=-8).block_until_ready()
    print(f"B={B} K={K} L={L} N={N}: compile+1st={time.time()-t0:.1f}s",
          flush=True)
    for i in range(reps):
        t0 = time.time()
        poa_full_batch_packed(arms, alen, amode, narms, N=N, L=L, K=K,
                              P=P, m=5, n=-4, g=-8).block_until_ready()
        print(f"  steady={time.time()-t0:.3f}s "
              f"({B/(time.time()-t0):,.0f} w/s)", flush=True)

run_shape(4096, 32, 64, 64)
