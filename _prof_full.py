import time, sys
import numpy as np
import jax

from hypo_tpu.poa.device_full import poa_full_batch_packed

rng = np.random.default_rng(0)

def run_shape(B, K, L, N, P=8):
    arms = rng.integers(0, 4, size=(B, K, L)).astype(np.int32)
    alen = np.full((B, K), L, np.int32)
    amode = np.zeros((B, K), np.int32)
    narms = np.full(B, K, np.int32)
    t0 = time.time()
    out = poa_full_batch_packed(arms, alen, amode, narms, N=N, L=L, K=K,
                                P=P, m=5, n=-4, g=-8)
    out.block_until_ready()
    t_compile = time.time() - t0
    t0 = time.time()
    out = poa_full_batch_packed(arms, alen, amode, narms, N=N, L=L, K=K,
                                P=P, m=5, n=-4, g=-8)
    out.block_until_ready()
    t_run = time.time() - t0
    wps = B / t_run
    print(f"B={B} K={K} L={L} N={N}: compile+1st={t_compile:.1f}s "
          f"steady={t_run:.3f}s -> {wps:,.0f} windows/s", flush=True)

print("backend:", jax.default_backend(), file=sys.stderr)
run_shape(1024, 32, 128, 256)
run_shape(1024, 32, 128, 256)  # cached
