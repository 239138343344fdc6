#!/usr/bin/env python
"""Device-engine -@ scaling table (VERDICT r4 #1): the full extract CLI on
the attached TPU at -@ 1/2/4 for MDTPU_ENGINE=jax and host.

Round-5 protocol: N full passes (default 5) over the whole table; within
each pass the two engines run back-to-back per thread count with the order
ROTATED per (pass, thread-count) so neither engine systematically samples
the depressed CPU state that follows the other's burst (this VM's
effective CPU speed drifts 2-5x over minutes — CLAUDE.md "Gotchas").
Reported: per-cell medians, plus per-pass pairwise jax/host ratios and
their median (the pairwise ratio cancels slow phases that hit both
engines in the same pass).

Usage: python scripts/thread_scaling.py [n_pairs] [passes] [outfile.json]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    outfile = sys.argv[3] if len(sys.argv) > 3 else None
    import numpy as np

    from methyldackel_tpu.parallel import enable_persistent_cache

    enable_persistent_cache()
    from bench import bench_cli, make_cli_input, run_cli

    _d, fa, bam = make_cli_input(n_pairs, 150, 1 << 23)
    run_cli(fa, bam, "jax")  # warm: compiles / executable loads
    threads_list = (1, 2, 4)
    # rates[threads][engine] -> list over passes
    rates = {t: {"jax": [], "host": []} for t in threads_list}
    for p in range(passes):
        for ti, threads in enumerate(threads_list):
            order = ("jax", "host") if (p + ti) % 2 == 0 else ("host", "jax")
            for engine in order:
                rps, _n = bench_cli(n_pairs, 150, 1 << 23, engine=engine,
                                    threads=threads)
                rates[threads][engine].append(rps)
                print(json.dumps({"pass": p, "engine": engine,
                                  "threads": threads,
                                  "reads_per_s": round(rps, 1)}), flush=True)
    table = []
    for threads in threads_list:
        j = rates[threads]["jax"]
        h = rates[threads]["host"]
        pairwise = [a / b for a, b in zip(j, h)]
        table.append({
            "threads": threads,
            "jax_median": round(float(np.median(j)), 1),
            "host_median": round(float(np.median(h)), 1),
            "median_ratio": round(float(np.median(j)) / float(np.median(h)), 3),
            "pairwise_ratios": [round(r, 3) for r in pairwise],
            "pairwise_median": round(float(np.median(pairwise)), 3),
            "jax_all": [round(x, 1) for x in j],
            "host_all": [round(x, 1) for x in h],
        })
        print(json.dumps(table[-1]), flush=True)
    result = {"n_pairs": n_pairs, "passes": passes, "table": table}
    print(json.dumps(result))
    if outfile:
        with open(outfile, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
