import time
import numpy as np
from hypo_tpu.poa.device_full import build_chunk_programs

rng = np.random.default_rng(0)

def prof(L, N, Kc, B, arm_real=None, reps=3):
    arm_real = arm_real or L
    init, chunk, finish = build_chunk_programs(
        N=N, L=L, Kc=Kc, P=8, m=5, n=-4, g=-8, B=B, dp_impl="pallas",
        ndev=1)
    def mk():
        arms = np.zeros((B, Kc, L), np.int8)
        arms[:, :, :arm_real] = rng.integers(0, 4, (B, Kc, arm_real))
        alen = np.full((B, Kc), arm_real, np.int32)
        amode = np.zeros((B, Kc), np.int8)
        return arms, alen, amode
    t0 = time.time()
    st = init()
    st = chunk(st, *mk())
    th = np.zeros(B, np.int32)
    finish(st, th).block_until_ready()
    print(f"L={L} N={N} Kc={Kc} B={B}: compile+1st={time.time()-t0:.1f}s",
          flush=True)
    for _ in range(reps):
        st = init()
        t0 = time.time()
        st = chunk(st, *mk())
        st2 = chunk(st, *mk())
        tch = time.time() - t0
        t0 = time.time()
        out = finish(st2, th)
        out.block_until_ready()
        tf = time.time() - t0
        wps = B / (tch + tf)
        print(f"  2xchunk={tch:.2f}s finish={tf:.2f}s -> {wps:,.0f} w/s "
              f"(2*{Kc} arms)", flush=True)

prof(126, 256, 32, 2048, arm_real=100)
prof(126, 128, 32, 2048, arm_real=60)
prof(62, 64, 32, 4096, arm_real=30)
