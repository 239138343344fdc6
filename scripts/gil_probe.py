#!/usr/bin/env python
"""Does jax.device_get / block_until_ready hold the GIL under axon?

Thread B increments a Python counter; thread A performs device ops. If
B's rate collapses during A's blocking call, that call holds the GIL.
"""
import os
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import numpy as np

from methyldackel_tpu.parallel import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)


def count_rate(stop, out):
    n = 0
    t0 = time.perf_counter()
    while not stop:
        n += 1
    out.append(n / (time.perf_counter() - t0))


def measure(name, fn):
    stop, out = [], []
    th = threading.Thread(target=count_rate, args=(stop, out))
    th.start()
    time.sleep(0.2)
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    stop.append(True)
    th.join()
    print(f"{name}: {dt:.3f}s, counter {out[0]/1e6:.2f} M/s", flush=True)


# baseline counter rate
stop, out = [], []
th = threading.Thread(target=count_rate, args=(stop, out))
th.start()
time.sleep(1.0)
stop.append(True)
th.join()
print(f"baseline counter: {out[0]/1e6:.2f} M/s", flush=True)

x = jnp.asarray(np.random.randint(0, 255, (64 << 20,), np.uint8))  # 64 MB


@jax.jit
def f(a):
    return (a.astype(jnp.int32) * 3 + 1).astype(jnp.uint8)


y = f(x)
_ = np.asarray(jax.device_get(y[:16]))  # force compile+load
for rep in range(2):
    y = f(f(x))
    measure(f"block_until_ready rep{rep}", lambda: y.block_until_ready())
    measure(f"device_get(64MB) rep{rep}", lambda: jax.device_get(y))
    z = f(x)
    z.copy_to_host_async()
    measure(f"get after async copy rep{rep}", lambda: jax.device_get(z))
    up = np.random.randint(0, 255, (64 << 20,), np.uint8)
    measure(f"upload(64MB) rep{rep}", lambda: jnp.asarray(up).block_until_ready())
