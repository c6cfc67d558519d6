import time
import numpy as np
from hypo_tpu.poa.device_full import build_chunk_programs

rng = np.random.default_rng(0)
L, N, Kc, B = 126, 256, 32, 2048
init, chunk, finish = build_chunk_programs(
    N=N, L=L, Kc=Kc, P=8, m=5, n=-4, g=-8, B=B, dp_impl="pallas", ndev=1)

def mk():
    arms = np.zeros((B, Kc, L), np.int8)
    arms[:, :, :100] = rng.integers(0, 4, (B, Kc, 100))
    return arms, np.full((B, Kc), 100, np.int32), np.zeros((B, Kc), np.int8)

th = np.zeros(B, np.int32)
st = init(); st = chunk(st, *mk()); finish(st, th).block_until_ready()

for depth in (1, 2, 4):
    t0 = time.time()
    handles = []
    outs = []
    for tile in range(8):
        st = init()
        st = chunk(st, *mk())
        st = chunk(st, *mk())
        handles.append(finish(st, th))
        while len(handles) > depth:
            outs.append(np.asarray(handles.pop(0)))
    while handles:
        outs.append(np.asarray(handles.pop(0)))
    dt = time.time() - t0
    print(f"depth={depth}: {dt:.2f}s for 8 tiles "
          f"({8*B/dt:,.0f} w/s incl pack)", flush=True)
