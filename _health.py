import time
import numpy as np
import jax, jax.numpy as jnp

x = jax.device_put(np.ones((1024, 1024), np.float32))
f = jax.jit(lambda a: a @ a)
f(x).block_until_ready()
for i in range(5):
    t0 = time.time()
    f(x).block_until_ready()
    print(f"matmul {i}: {time.time()-t0:.3f}s", flush=True)
