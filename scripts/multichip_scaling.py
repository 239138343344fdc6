#!/usr/bin/env python
"""Multi-chip weak-scaling measurement on the virtual CPU mesh
(VERDICT r4 #6): relative wall-clock of the sharded window step at
dp = 1, 2, 4, 8 with FIXED per-device load, plus the bytes-over-ICI model
for the psum counter merge.

No multi-chip hardware exists in this environment (one real TPU chip via
a tunnel), so absolute ICI timings are unmeasurable; what IS measurable
and falsifiable:

- the sharded program compiles and executes at every dp with the same
  per-device read load (weak scaling): if the psum-merged design
  serialized anywhere (a gather to one device, a replicated scatter), the
  per-step wall would grow ~linearly in dp even on CPU devices, because
  the work would pile onto one device's lane. Flat-ish wall = the program
  keeps per-device compute constant and the merge is the only cross-
  device term.
- the communication model: ring all-reduce of the counter tensor.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python scripts/multichip_scaling.py [out.json]
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("MDTPU_FORCE_PLATFORM", "cpu")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from methyldackel_tpu.parallel import mesh as pm
    from methyldackel_tpu.utils.simulate import random_reference, \
        simulate_batch_fast

    n_dev = len(jax.devices())
    assert n_dev >= 8, f"need 8 virtual devices, got {n_dev}"

    W = 1 << 18          # window (small: CPU devices)
    PAIRS_PER_DEV = 4000  # fixed per-device load (weak scaling)
    L = 150
    rng = np.random.default_rng(0)
    ref_ascii, ref_codes = random_reference(rng, W + 64)

    results = []
    for dp in (1, 2, 4, 8):
        mesh = pm.make_mesh(dp, sp=1)
        n_pairs = PAIRS_PER_DEV * dp
        batch = simulate_batch_fast(rng, ref_codes, n_pairs, L)
        n = batch.n
        ovw = ((2 * L + 127) // 128) * 128
        step = pm.sharded_window_pipeline(mesh, wpad=W, ovw=ovw,
                                          min_phred=5, min_conv_eff=0.0,
                                          use_overlaps=True)
        zeros16 = np.zeros(16, np.int32)
        args = (jnp.asarray(batch.seq), jnp.asarray(batch.qual),
                jnp.asarray(batch.refpos.astype(np.int32)),
                jnp.asarray(batch.flag.astype(np.uint16)),
                jnp.asarray(batch.xg), jnp.asarray(batch.l_qseq),
                jnp.ones(n, bool), jnp.asarray(ref_ascii),
                jnp.asarray(zeros16), jnp.asarray(zeros16),
                jnp.int32(0), jnp.int32(0))
        out = step(*args)
        out.block_until_ready()  # compile
        iters = 5
        best = 1e18
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step(*args)
            out.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / iters)
        reads_per_s = n / best
        results.append({"dp": dp, "n_reads": n, "step_s": round(best, 4),
                        "reads_per_s": round(reads_per_s, 1),
                        "reads_per_s_per_dev": round(reads_per_s / dp, 1)})
        print(json.dumps(results[-1]), flush=True)

    # On virtual devices the dp shards SHARE this host's 2 cores, so
    # per-device rates necessarily fall ~1/dp and classic weak-scaling
    # efficiency is unmeasurable. What IS measurable and falsifiable:
    # sharding OVERHEAD — wall(dp) / (dp * wall(1)) at fixed per-device
    # load. >1 would mean the sharded program serializes or duplicates
    # work somewhere (a gather to one device, a replicated recompute);
    # ~1 means per-device compute stays constant and the psum merge is
    # the only cross-device term (and it costs ~nothing even when
    # CPU-emulated, which upper-bounds the ICI version).
    base = results[0]["step_s"]
    for r in results:
        r["sharding_overhead"] = round(r["step_s"] / (r["dp"] * base), 3)

    # --- ICI byte model: ring all-reduce of the [W, 4] u32 counters ---
    counter_bytes = W * 4 * 4
    model = []
    for dp in (1, 2, 4, 8):
        ring = 2 * counter_bytes * (dp - 1) / dp  # ring all-reduce traffic
        model.append({"dp": dp, "counter_mb": round(counter_bytes / 2**20, 2),
                      "psum_mb_per_window_per_dev":
                          round(ring / 2**20, 2)})
    # Comparison point: the read tensors a window ships over DCN in the
    # host-sharded path (~49 B/read packed, bench measurement: 21.8 MB per
    # 477k-read group).
    read_mb_per_100k = round(100_000 * 49 / 2**20, 2)

    out_doc = {
        "weak_scaling": results,
        "ici_model": model,
        "read_tensor_mb_per_100k_reads": read_mb_per_100k,
        "notes": "virtual 8-device CPU mesh (no multi-chip hardware in "
                 "this environment); fixed per-device read load; the dp "
                 "shards share 2 physical cores so per-device rates fall "
                 "~1/dp by construction — the falsifiable number is "
                 "sharding_overhead = wall(dp)/(dp*wall(1)), ~1.0 "
                 "meaning zero serialization/duplication as dp grows; "
                 "psum = ring all-reduce of [W,4] u32",
    }
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(ROOT, "artifacts", "multichip_scaling_r05.json")
    with open(out_path, "w") as fh:
        json.dump(out_doc, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
