#!/usr/bin/env python
"""At-scale soak: a multi-contig, multi-million-read synthetic WGBS input
through the full extract CLI on the attached TPU — streaming BAM ingest,
jax engine vs exact host engine, outputs byte-compared. Validates the
device path's stability beyond toy window counts (shape-bucket reuse over
many windows, overflow hysteresis, pipeline drain) and records the
at-scale rates.

Usage: python scripts/soak_scale.py [n_pairs] [glen_log2]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_500_000
    glen = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 25)
    from methyldackel_tpu.parallel import enable_persistent_cache

    enable_persistent_cache()
    import tempfile

    from methyldackel_tpu.utils.simulate import write_synthetic_input
    from methyldackel_tpu.io.bam import BamFile
    from methyldackel_tpu.io.bai import build_bai
    from methyldackel_tpu import cli as mdcli

    # Reuse the synthetic input across soak invocations (building 5M reads
    # costs 4-6 min of host CPU; the soak measures the pipeline, not the
    # generator).
    d = os.path.join(tempfile.gettempdir(),
                     f"mdtpu_soak_{n_pairs}_{glen.bit_length()}")
    os.makedirs(d, exist_ok=True)
    tag = os.path.join(d, "ready")
    t0 = time.perf_counter()
    if os.path.exists(tag):
        fa = os.path.join(d, "sim.fa")
        bam = os.path.join(d, "sim.bam")
    else:
        fa, bam = write_synthetic_input(d, n_pairs, 150, glen, seed=3)
        build_bai(BamFile(bam), bam + ".bai")
        open(tag, "w").close()
    print(f"# input: {2*n_pairs} reads over {glen>>20} Mb "
          f"({os.path.getsize(bam)>>20} MB BAM) in "
          f"{time.perf_counter()-t0:.0f}s", flush=True)

    outs = {}
    rates = {}
    order = ("jax", "host")
    if os.environ.get("MDTPU_SOAK_ORDER") == "host_first":
        order = ("host", "jax")
    for engine in order:
        od = os.path.join(d, engine)
        os.makedirs(od, exist_ok=True)
        os.environ["MDTPU_ENGINE"] = engine
        # production-scale ingest mode by default; MDTPU_SOAK_STREAM=0
        # records the in-memory ingest variant instead
        os.environ["MDTPU_STREAM"] = os.environ.get("MDTPU_SOAK_STREAM", "1")
        cwd = os.getcwd()
        os.chdir(od)
        try:
            t0 = time.perf_counter()
            rc = mdcli.main(["extract", fa, bam, "-o", "out"])
            dt = time.perf_counter() - t0
        finally:
            os.chdir(cwd)
            os.environ.pop("MDTPU_STREAM", None)
        assert rc == 0, engine
        outs[engine] = open(os.path.join(od, "out_CpG.bedGraph"),
                            "rb").read()
        rates[engine] = round(2 * n_pairs / dt, 1)
        print(json.dumps({"engine": engine, "reads_per_s": rates[engine],
                          "bytes_out": len(outs[engine])}), flush=True)
    ident = outs["jax"] == outs["host"]
    print(json.dumps({"soak_reads": 2 * n_pairs,
                      "byte_identical": ident, **{
                          f"{k}_reads_per_s": v for k, v in rates.items()}}))
    if not ident:
        sys.exit(1)


if __name__ == "__main__":
    main()
