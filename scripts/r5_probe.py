#!/usr/bin/env python
"""Round-5 hardware probe: byte-validate + time the hybrid scheduler and
the K-window batched dispatch on the attached TPU.

Usage: python scripts/r5_probe.py [n_pairs] [reps]
Env: R5_THREADS="1,2,4"  R5_ENGINES="jax,host"  R5_KNOBS (extra env per run)
"""
import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def rows(path):
    return [l for l in open(path) if not l.startswith("track")]


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from methyldackel_tpu.parallel import enable_persistent_cache

    enable_persistent_cache()
    from bench import make_cli_input, run_cli

    _d, fa, bam = make_cli_input(n_pairs, 150, 1 << 23)

    # --- byte validation: host vs jax (group path default) on hardware
    import shutil
    from methyldackel_tpu import cli as mdcli

    vd = tempfile.mkdtemp(prefix="r5_val_")
    os.environ["MDTPU_ENGINE"] = "host"
    assert mdcli.main(["extract", fa, bam, "-o", os.path.join(vd, "h")]) == 0
    os.environ["MDTPU_ENGINE"] = "jax"
    t0 = time.perf_counter()
    assert mdcli.main(["extract", fa, bam, "-o", os.path.join(vd, "j")]) == 0
    print(f"[warm+validate] jax first run {time.perf_counter()-t0:.1f}s",
          flush=True)
    h = rows(os.path.join(vd, "h_CpG.bedGraph"))
    j = rows(os.path.join(vd, "j_CpG.bedGraph"))
    assert h == j, f"BYTE MISMATCH: {len(h)} vs {len(j)} rows"
    print(f"[validate] jax == host ({len(h)} rows)", flush=True)
    shutil.rmtree(vd, ignore_errors=True)

    threads = [int(t) for t in os.environ.get("R5_THREADS", "1").split(",")]
    engines = os.environ.get("R5_ENGINES", "jax,host").split(",")
    out = []
    for rep in range(reps):
        for ti, t in enumerate(threads):
            order = engines if (rep + ti) % 2 == 0 else engines[::-1]
            for eng in order:
                dt = run_cli(fa, bam, eng, threads=t)
                rec = {"rep": rep, "threads": t, "engine": eng,
                       "reads_per_s": round(2 * n_pairs / dt, 1)}
                out.append(rec)
                print(json.dumps(rec), flush=True)
    print(json.dumps({"table": out}))


if __name__ == "__main__":
    main()
