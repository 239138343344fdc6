#!/usr/bin/env python
"""Device-engine -@ scaling table (VERDICT r2 #5): the full extract CLI on
the attached TPU at -@ 1/2/4 for MDTPU_ENGINE=jax and host, printed as a
small JSON table for BENCH/PARITY. Run alone on an idle box (the numbers
are host-CPU sensitive).

Usage: python scripts/thread_scaling.py [n_pairs]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    from methyldackel_tpu.parallel import enable_persistent_cache

    enable_persistent_cache()
    from bench import bench_cli, make_cli_input, run_cli

    _d, fa, bam = make_cli_input(n_pairs, 150, 1 << 23)
    run_cli(fa, bam, "jax")  # warm: compiles / executable loads
    rows = []
    # interleave engines per thread count (this host's CPU speed drifts);
    # alternate order to cancel position bias (see bench.py)
    for ti, threads in enumerate((1, 2, 4)):
        for engine in (("jax", "host") if ti % 2 == 0
                       else ("host", "jax")):
            rps, n = bench_cli(n_pairs, 150, 1 << 23, engine=engine,
                               threads=threads)
            rows.append({"engine": engine, "threads": threads,
                         "reads_per_s": round(rps, 1)})
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    main()
