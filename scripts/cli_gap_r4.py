#!/usr/bin/env python
"""Round-4 CLI gap analysis: run the real extract CLI (jax vs host),
interleaved, with per-stage STATS and process CPU accounting, over a
fixed synthetic input reused across runs. Each engine run happens in a
fresh subprocess (like the driver's bench) so compile-cache loads and
platform pinning behave as in production.

python scripts/cli_gap_r4.py [reps=2] [pairs=500000]
"""
import json
import os
import resource
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FIXED = "/tmp/mdtpu_bench_fixed"


def build_input(pairs, L=150, glen=1 << 23):
    os.makedirs(FIXED, exist_ok=True)
    tag = os.path.join(FIXED, f"ready_{pairs}_{L}_{glen}")
    fa = os.path.join(FIXED, "ref.fa")
    bam = os.path.join(FIXED, "reads.bam")
    if os.path.exists(tag):
        return fa, bam
    os.environ.setdefault("MDTPU_FORCE_PLATFORM", "cpu")
    from methyldackel_tpu.utils.simulate import write_synthetic_input
    from methyldackel_tpu.io.bam import BamFile
    from methyldackel_tpu.io.bai import build_bai

    fa2, bam2 = write_synthetic_input(FIXED, pairs, L, glen, seed=0)
    os.replace(fa2, fa) if fa2 != fa else None
    os.replace(bam2, bam) if bam2 != bam else None
    for ext in (".fai",):
        if os.path.exists(fa2 + ext) and fa2 != fa:
            os.replace(fa2 + ext, fa + ext)
    build_bai(BamFile(bam), bam + ".bai")
    open(tag, "w").close()
    return fa, bam


def run_one(fa, bam, engine, threads=1, stats=True):
    outdir = os.path.join(FIXED, f"out_{engine}")
    os.makedirs(outdir, exist_ok=True)
    env = dict(os.environ)
    env["MDTPU_ENGINE"] = engine
    env["PYTHONPATH"] = ROOT + ":" + env.get("PYTHONPATH", "")
    if stats:
        env["MDTPU_STATS"] = "1"
    cmd = [sys.executable, "-m", "methyldackel_tpu.cli", "extract"]
    if threads > 1:
        cmd += ["-@", str(threads)]
    cmd += [fa, bam, "-o", os.path.join(outdir, "out")]
    t0 = time.perf_counter()
    r0 = resource.getrusage(resource.RUSAGE_CHILDREN)
    p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=1800)
    wall = time.perf_counter() - t0
    r1 = resource.getrusage(resource.RUSAGE_CHILDREN)
    cpu = (r1.ru_utime - r0.ru_utime) + (r1.ru_stime - r0.ru_stime)
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:] + "\n")
        raise SystemExit(f"{engine} run failed rc={p.returncode}")
    stats_lines = [l for l in p.stderr.splitlines()
                   if "STATS" in l or "reads/s" in l or l.startswith("[")]
    return wall, cpu, stats_lines


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    threads = int(os.environ.get("MDTPU_GAP_THREADS", "1"))
    fa, bam = build_input(pairs)
    n = 2 * pairs
    print(f"input ready: {pairs} pairs, threads={threads}", flush=True)
    # warm: one untimed jax pass (executable loads)
    run_one(fa, bam, "jax", threads, stats=False)
    print("warm pass done", flush=True)
    results = {"jax": [], "host": []}
    for rep in range(reps):
        for eng in ("jax", "host"):
            wall, cpu, lines = run_one(fa, bam, eng, threads)
            results[eng].append((wall, cpu))
            print(f"rep{rep} {eng:5s} wall={wall:7.2f}s cpu={cpu:7.2f}s "
                  f"reads/s={n/wall:9.0f} cpu_util={cpu/wall:4.2f}", flush=True)
            for l in lines:
                print("   " + l, flush=True)
    import numpy as np
    for eng in ("jax", "host"):
        med = float(np.median([w for w, _ in results[eng]]))
        print(f"{eng}: median {n/med:.0f} reads/s over {reps} reps", flush=True)


if __name__ == "__main__":
    main()
