#!/usr/bin/env python
"""One instrumented extract run per engine on a persistent synthetic input.

Usage: python scripts/r5_stats.py [n_pairs] [engine[,engine...]] [threads]
Env knobs pass through (MDTPU_BATCH_WINDOWS, MDTPU_STEAL, ...).
Input persists in /tmp/mdtpu_r5_input_<shape> so repeated probes skip setup.
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def get_input(n_pairs, read_len=150, glen=1 << 23):
    d = f"/tmp/mdtpu_r5_input_{n_pairs}_{read_len}_{glen}"
    fa = os.path.join(d, "ref.fa")
    bam = os.path.join(d, "reads.bam")
    if not os.path.exists(bam + ".bai"):
        os.makedirs(d, exist_ok=True)
        from methyldackel_tpu.utils.simulate import write_synthetic_input
        from methyldackel_tpu.io.bam import BamFile
        from methyldackel_tpu.io.bai import build_bai

        fa, bam = write_synthetic_input(d, n_pairs, read_len, glen, seed=0)
        build_bai(BamFile(bam), bam + ".bai")
    return fa, bam


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    engines = (sys.argv[2] if len(sys.argv) > 2 else "jax").split(",")
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    from methyldackel_tpu.parallel import enable_persistent_cache

    enable_persistent_cache()
    fa, bam = get_input(n_pairs)
    import tempfile

    from methyldackel_tpu import cli as mdcli

    for eng in engines:
        outdir = tempfile.mkdtemp(prefix="r5_stats_")
        os.environ["MDTPU_ENGINE"] = eng
        targs = ["-@", str(threads)] if threads > 1 else []
        t0 = time.perf_counter()
        rc = mdcli.main(["extract", *targs, fa, bam,
                         "-o", os.path.join(outdir, "out")])
        dt = time.perf_counter() - t0
        assert rc == 0
        print(f"[{eng} -@{threads}] {dt:.2f}s  "
              f"{2*n_pairs/dt:,.0f} reads/s", flush=True)
        import shutil

        shutil.rmtree(outdir, ignore_errors=True)


if __name__ == "__main__":
    main()
