#!/usr/bin/env python
"""K-window batching sweep (VERDICT r4 #2 artifact): the fused window
step's throughput vs windows-per-dispatch, on the real TPU.

Usage: python scripts/k_sweep.py [n_pairs_per_window] [iters]
Writes artifacts/k_sweep_r05.json and prints one JSON line per K.
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from methyldackel_tpu.parallel import enable_persistent_cache

    enable_persistent_cache()
    from methyldackel_tpu.utils.simulate import random_reference, \
        simulate_batch_fast
    from bench import bench_e2e_fused, host_baseline

    rng = np.random.default_rng(0)
    W = 1 << 20
    L = 150
    ref_ascii, ref_codes = random_reference(rng, W + 64)
    from bench import blobify_qnames

    batch = blobify_qnames(simulate_batch_fast(rng, ref_codes, n_pairs, L))
    extra = [blobify_qnames(simulate_batch_fast(
        np.random.default_rng(s), ref_codes, n_pairs, L))
        for s in (1, 2, 3)]

    rows = []
    host_rps = host_baseline(batch, ref_ascii, W)
    print(json.dumps({"host_window_reads_per_s": round(host_rps, 1)}),
          flush=True)
    for k in (1, 2, 4, 8):
        os.environ["MDTPU_BATCH_WINDOWS"] = str(k)
        dt = bench_e2e_fused(batch, ref_ascii, W, iters, batches=extra)
        rps = batch.n / dt
        rows.append({"K": k, "reads_per_s": round(rps, 1),
                     "window_step_ms": round(1e3 * dt, 1),
                     "vs_host_window": round(rps / host_rps, 3)})
        print(json.dumps(rows[-1]), flush=True)
    # re-measure host at the end too (phase drift bracket)
    host2 = host_baseline(batch, ref_ascii, W)
    out = {"sweep": rows, "host_window_reads_per_s": round(host_rps, 1),
           "host_window_reads_per_s_post": round(host2, 1),
           "n_reads_per_window": batch.n}
    path = os.path.join(ROOT, "artifacts", "k_sweep_r05.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
