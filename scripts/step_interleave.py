"""Interleaved K-vs-host window step (phase-drift controlled): rotate
(host, K=2, K=4) measurements within each of 4 chunks, report medians."""
import json, os, sys, time
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import numpy as np
from methyldackel_tpu.parallel import enable_persistent_cache
enable_persistent_cache()
from methyldackel_tpu.utils.simulate import random_reference, simulate_batch_fast
from bench import bench_e2e_fused, host_baseline, blobify_qnames

rng = np.random.default_rng(0)
W = 1 << 20
ref_ascii, ref_codes = random_reference(rng, W + 64)
batch = blobify_qnames(simulate_batch_fast(rng, ref_codes, 50000, 150))
extra = [blobify_qnames(simulate_batch_fast(np.random.default_rng(s), ref_codes, 50000, 150)) for s in (1,2,3)]

res = {"host": [], 1: [], 2: [], 4: []}
for chunk in range(4):
    res["host"].append(host_baseline(batch, ref_ascii, W, reps=1))
    for k in (1, 2, 4):
        dt = bench_e2e_fused(batch, ref_ascii, W, 12, batches=extra, group_k=k)
        res[k].append(batch.n / dt)
    print("chunk", chunk, {k: round(v[-1]/1e3, 1) for k, v in res.items()}, flush=True)
med = {str(k): round(float(np.median(v)), 1) for k, v in res.items()}
out = {"medians": med,
       "ratios": {str(k): round(float(np.median(res[k]))/float(np.median(res["host"])), 3)
                  for k in (1, 2, 4)}}
print(json.dumps(out))
