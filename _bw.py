import time
import numpy as np
import jax, jax.numpy as jnp

dev = jax.devices()[0]
for mb in (1, 4, 16):
    x = np.zeros(mb * 1024 * 1024, np.int8)
    t0 = time.time()
    xd = jax.device_put(x, dev)
    xd.block_until_ready()
    up = time.time() - t0
    t0 = time.time()
    _ = np.asarray(xd)
    down = time.time() - t0
    print(f"{mb} MB: H2D {mb/up:.1f} MB/s, D2H {mb/down:.1f} MB/s",
          flush=True)
