import time
import numpy as np
import jax, jax.numpy as jnp

# honest timing: asarray (D2H) is the only trustworthy sync
x = jax.device_put(np.ones((256, 256), np.float32))
f = jax.jit(lambda a: a @ a)
_ = np.asarray(f(x))
for i in range(3):
    t0 = time.time()
    _ = np.asarray(f(x))
    print(f"tiny matmul asarray: {time.time()-t0:.3f}s", flush=True)

# cost of K sequential tiny programs then one readback
for K in (1, 4, 16):
    y = x
    t0 = time.time()
    for _ in range(K):
        y = f(y)
    _ = np.asarray(y)
    print(f"{K} matmuls + 1 readback: {time.time()-t0:.3f}s", flush=True)

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
st = init(); st = chunk(st, *mk()); _ = np.asarray(finish(st, th))
for trial in range(3):
    t0 = time.time()
    st = init()
    st = chunk(st, *mk())
    st = chunk(st, *mk())
    out = np.asarray(finish(st, th))
    dt = time.time() - t0
    print(f"1 tile (4 progs) honest: {dt:.2f}s -> {B/dt:,.0f} w/s",
          flush=True)
