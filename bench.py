#!/usr/bin/env python
"""Benchmark: extract hot-path throughput on one chip.

Measures the full device window pipeline (strand inference → trimming →
mate-overlap arbitration → 4-channel scatter-add pileup over a 1 Mb
window) on simulated WGBS reads — the workload of the reference's
extractCalls hot loop (extract.c:399-441).

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
speedup over this repo's exact host (numpy) implementation of the same
semantics measured on the same machine — a stand-in for the
single-thread-C-like baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from methyldackel_tpu.parallel.device import window_pipeline
    from methyldackel_tpu.ops import semantics as sem
    from methyldackel_tpu.utils.simulate import random_reference, simulate_batch_fast

    rng = np.random.default_rng(0)
    W = 1 << 20
    n_pairs = int(os.environ.get("MDTPU_BENCH_PAIRS", 50_000))
    L = int(os.environ.get("MDTPU_BENCH_READLEN", 150))
    ref_ascii, ref_codes = random_reference(rng, W + 64)
    batch = simulate_batch_fast(rng, ref_codes, n_pairs, L)
    n = batch.n

    ovw = ((2 * L + 127) // 128) * 128
    pair_a = np.arange(0, n, 2, dtype=np.int32)
    pair_b = pair_a + 1
    pair_valid = np.ones(len(pair_a), dtype=bool)
    zeros16 = np.zeros(16, np.int32)

    dev_args = [
        jnp.asarray(batch.seq), jnp.asarray(batch.qual),
        jnp.asarray(batch.refpos.astype(np.int32)),
        jnp.asarray(batch.flag.astype(np.uint16)), jnp.asarray(batch.xg),
        jnp.asarray(batch.l_qseq), jnp.asarray(batch.mapq),
        jnp.ones(n, bool), jnp.ones((n, L), bool),
        jnp.asarray(pair_a), jnp.asarray(pair_b), jnp.asarray(pair_valid),
        jnp.asarray(ref_ascii), jnp.asarray(zeros16), jnp.asarray(zeros16),
        jnp.int32(0), jnp.int32(0),
    ]

    def run():
        return window_pipeline(
            *dev_args, wpad=W, ovw=ovw, min_phred=5, min_conv_eff=0.0,
            use_overlaps=True,
        )

    # warmup / compile
    out = run()
    out.block_until_ready()
    iters = int(os.environ.get("MDTPU_BENCH_ITERS", 10))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    reads_per_s = n / dt

    # Host baseline: exact numpy semantics on a subsample, extrapolated.
    m = min(n, 20_000)
    sub_seq = batch.seq[:m].copy()
    sub_qual = batch.qual[:m].copy()
    sub_rp = batch.refpos[:m]
    st = sem.strand(batch.flag[:m], batch.xg[:m])
    t0 = time.perf_counter()
    a_idx = np.arange(0, m, 2)
    b_idx = a_idx + 1
    sem.arbitrate_overlaps(sub_seq, sub_qual, sub_rp, st, a_idx, b_idx)
    sem.pileup_channels(sub_seq, sub_qual, sub_rp, st,
                        np.ones(sub_seq.shape, bool), ref_ascii, 0, 0, W, 5)
    host_dt = time.perf_counter() - t0
    host_reads_per_s = m / host_dt

    print(json.dumps({
        "metric": "extract_pileup_throughput",
        "value": round(reads_per_s, 1),
        "unit": "reads/s/chip",
        "vs_baseline": round(reads_per_s / host_reads_per_s, 3),
    }))


if __name__ == "__main__":
    main()
