#!/usr/bin/env python
"""Probe the axon tunnel's transfer characteristics: readback wall time vs
size (latency vs bandwidth split), upload cost, and per-dispatch overhead.
Rotates distinct buffers so the client's content-addressed upload cache
cannot fake transfer costs (CLAUDE.md axon sync semantics).

Run on the TPU box: python scripts/tunnel_probe.py
"""
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

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev}", flush=True)

    @jax.jit
    def bump(x):
        return x + np.uint8(1)

    # warm compile for each size
    sizes = [1 << 14, 1 << 17, 1 << 19, 1 << 20, 1 << 21, 1 << 22, 1 << 23]
    rng = np.random.default_rng(0)
    for reps in range(2):
        for sz in sizes:
            bufs = [rng.integers(0, 200, sz, dtype=np.uint8) for _ in range(5)]
            # upload timing (distinct content each time)
            up_w = []
            devs = []
            for b in bufs:
                t0 = time.perf_counter()
                d = jnp.asarray(b)
                d.block_until_ready()  # fire-and-forget under axon; cheap
                up_w.append(time.perf_counter() - t0)
                devs.append(d)
            outs = [bump(d) for d in devs]
            # readback timing (the only true sync)
            rb_w = []
            for o in outs:
                t0 = time.perf_counter()
                jax.device_get(o)
                rb_w.append(time.perf_counter() - t0)
            if reps:
                print(f"size={sz/1e6:8.3f} MB  up_median={np.median(up_w)*1e3:8.1f} ms"
                      f"  readback_median={np.median(rb_w)*1e3:8.1f} ms"
                      f"  rb_bw={sz/np.median(rb_w)/1e6:7.1f} MB/s", flush=True)

    # concurrent readbacks: do 4 in-flight gets pipeline?
    import threading
    sz = 1 << 21
    bufs = [rng.integers(0, 200, sz, dtype=np.uint8) for _ in range(8)]
    outs = [bump(jnp.asarray(b)) for b in bufs]
    t0 = time.perf_counter()
    for o in outs[:4]:
        jax.device_get(o)
    serial = time.perf_counter() - t0
    ths = []
    t0 = time.perf_counter()
    for o in outs[4:]:
        th = threading.Thread(target=jax.device_get, args=(o,))
        th.start()
        ths.append(th)
    for th in ths:
        th.join()
    par = time.perf_counter() - t0
    print(f"4x {sz/1e6:.1f}MB readbacks: serial={serial*1e3:.1f} ms  "
          f"4-thread={par*1e3:.1f} ms", flush=True)

    # dispatch overhead: tiny program, many dispatches, one final readback
    x = jnp.asarray(np.zeros(128, np.uint8))
    bump(x).block_until_ready()
    t0 = time.perf_counter()
    y = x
    for _ in range(100):
        y = bump(y)
    enq = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(y)
    fin = time.perf_counter() - t0
    print(f"100 tiny dispatches: enqueue={enq*1e3:.1f} ms "
          f"({enq*10:.2f} ms/dispatch)  final get={fin*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
