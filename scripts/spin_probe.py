#!/usr/bin/env python
"""Does the axon client burn CPU (spin) during transfers/waits?

Measures process CPU time vs wall across upload / device_get / idle wait.
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import numpy as np

from methyldackel_tpu.parallel import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp


def measure(name, fn):
    w0, c0 = time.perf_counter(), time.process_time()
    fn()
    w, c = time.perf_counter() - w0, time.process_time() - c0
    print(f"{name}: wall={w:.3f}s cpu={c:.3f}s ({100*c/max(w,1e-9):.0f}%)",
          flush=True)


print("devices:", jax.devices(), flush=True)
x = jnp.asarray(np.random.randint(0, 255, (64 << 20,), np.uint8))


@jax.jit
def f(a):
    return (a.astype(jnp.int32) * 3 + 1).astype(jnp.uint8)


_ = np.asarray(jax.device_get(f(x)[:16]))
measure("idle sleep 2s", lambda: time.sleep(2))
for rep in range(2):
    up = np.random.randint(0, 255, (64 << 20,), np.uint8)
    measure(f"upload 64MB rep{rep}",
            lambda: jnp.asarray(up).block_until_ready())
    y = f(f(x))
    measure(f"device_get 64MB rep{rep}", lambda: jax.device_get(y))
    measure("idle sleep 2s", lambda: time.sleep(2))
