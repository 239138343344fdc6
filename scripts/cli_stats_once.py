#!/usr/bin/env python
"""One warm in-process CLI run per engine with STATS + dispatch profile.
Usage: python scripts/cli_stats_once.py [jax|host|mesh ...]"""
import os
import resource
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FIXED = "/tmp/mdtpu_bench_fixed"
fa = os.path.join(FIXED, "ref.fa")
bam = os.path.join(FIXED, "reads.bam")


def cpu_now():
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime + r.ru_stime


def run(engine, warm=False):
    import tempfile

    from methyldackel_tpu import cli as mdcli
    from methyldackel_tpu.utils.profiling import STATS

    outdir = tempfile.mkdtemp(prefix=f"mdtpu_stats_{engine}_")
    os.environ["MDTPU_ENGINE"] = engine
    t_before = dict(STATS.t)
    t0 = time.perf_counter()
    c0 = cpu_now()
    rc = mdcli.main(["extract", fa, bam, "-o", os.path.join(outdir, "out")])
    wall = time.perf_counter() - t0
    cpu = cpu_now() - c0
    assert rc == 0
    tag = "warm" if warm else "timed"
    print(f"[{tag}] {engine}: wall={wall:.2f}s cpu={cpu:.2f}s "
          f"reads/s={1_000_000/wall:,.0f} util={cpu/wall:.2f}", flush=True)
    for k in sorted(STATS.t):
        d = STATS.t[k] - t_before.get(k, 0.0)
        if d > 0.005:
            print(f"    {k:<22s} {d:7.3f}s", flush=True)


def main():
    engines = sys.argv[1:] or ["jax", "host"]
    os.environ["MDTPU_STATS"] = "1"
    os.environ["MDTPU_PROFILE_DISPATCH"] = "1"
    from methyldackel_tpu.parallel import enable_persistent_cache
    enable_persistent_cache()
    if any(e != "host" for e in engines):
        run(next(e for e in engines if e != "host"), warm=True)
    for e in engines:
        run(e)


if __name__ == "__main__":
    main()
