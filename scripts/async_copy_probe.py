#!/usr/bin/env python
"""Does arr.copy_to_host_async() start the D2H transfer early under the
axon tunnel? Compare: dispatch K programs then (a) serial device_get;
(b) copy_to_host_async all, then serial device_get."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    from methyldackel_tpu.parallel import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    @jax.jit
    def bump(x):
        return x + np.uint8(1)

    rng = np.random.default_rng(0)
    sz = 1 << 21
    bufs = [rng.integers(0, 200, sz, dtype=np.uint8) for _ in range(12)]
    outs = [bump(jnp.asarray(b)) for b in bufs]
    jax.device_get(outs[0])  # warm

    t0 = time.perf_counter()
    for o in outs[1:5]:
        jax.device_get(o)
    serial = time.perf_counter() - t0

    quad = outs[5:9]
    t0 = time.perf_counter()
    ok = True
    for o in quad:
        try:
            o.copy_to_host_async()
        except Exception as e:  # noqa: BLE001
            print("copy_to_host_async unsupported:", type(e).__name__, e)
            ok = False
            break
    tasync = time.perf_counter() - t0
    t0 = time.perf_counter()
    for o in quad:
        jax.device_get(o)
    after = time.perf_counter() - t0
    print(f"serial 4x get: {serial*1e3:.1f} ms")
    if ok:
        print(f"async issue: {tasync*1e3:.1f} ms; gets after async: {after*1e3:.1f} ms")

    # sleep-then-get: if async truly started the copy, a get after a pause
    # should be near-instant
    o = outs[9]
    o.copy_to_host_async()
    time.sleep(1.0)
    t0 = time.perf_counter()
    jax.device_get(o)
    print(f"get after async+1s sleep: {(time.perf_counter()-t0)*1e3:.1f} ms "
          f"(vs ~80 ms cold)")


if __name__ == "__main__":
    main()
