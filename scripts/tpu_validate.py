#!/usr/bin/env python
"""On-hardware validation: run the reference CI extract scenarios
(/root/reference/tests/test.py:18-146 equivalents) plus synthetic
indel/overlap suites through the REAL CLI with MDTPU_ENGINE=jax on the
attached TPU, and byte-compare every output file against the exact host
engine. Also exercises MDTPU_ENGINE=mesh on the same chip.

Writes a PASS/FAIL log (one line per scenario) to stdout and exits nonzero
on any divergence. Intended to run in background with generous timeouts
(TPU compiles go through a slow remote tunnel; the persistent compile cache
makes reruns fast — CLAUDE.md "Gotchas").

Usage: python scripts/tpu_validate.py [logfile]
"""
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = "/root/reference/tests"

SCENARIOS = [
    # (name, args, outputs) — mirrors tests/test.py:18-146 + feature surface
    ("ct_converted", ["ct100.fa", "ct_aln.bam", "-q", "2", "-o", "v1"],
     ["v1_CpG.bedGraph"]),
    ("cg_calls", ["cg100.fa", "cg_aln.bam", "-q", "2", "-o", "v2"],
     ["v2_CpG.bedGraph"]),
    ("mapq", ["cg100.fa", "cg_aln.bam", "-q", "10", "-o", "v3"],
     ["v3_CpG.bedGraph"]),
    ("methylKit", ["--methylKit", "--CHH", "--CHG", "cg100.fa", "cg_aln.bam",
                   "-q", "2", "-o", "v4"],
     ["v4_CpG.methylKit", "v4_CHG.methylKit", "v4_CHH.methylKit"]),
    ("minDepth", ["--minDepth", "2", "cg100.fa", "cg_aln.bam", "-q", "2",
                  "-o", "v5"], ["v5_CpG.bedGraph"]),
    ("ignoreFlags", ["--ignoreFlags", "0xD00", "cg100.fa", "cg_aln.bam",
                     "-q", "2", "-o", "v6"], ["v6_CpG.bedGraph"]),
    ("requireFlags", ["--requireFlags", "0xD00", "cg100.fa", "cg_aln.bam",
                      "-q", "2", "-o", "v7"], ["v7_CpG.bedGraph"]),
    ("nOT", ["--nOT", "50,50,40,40", "cg100.fa", "cg_aln.bam", "-q", "2",
             "-o", "v8"], ["v8_CpG.bedGraph"]),
    ("variants", ["--minOppositeDepth", "3", "--maxVariantFrac", "0.25",
                  "cg100.fa", "cg_with_variants.bam", "-q", "2", "-o", "v9"],
     ["v9_CpG.bedGraph"]),
    ("convEff0.9", ["--minConversionEfficiency", "0.9", "--CHH", "--CHG",
                    "chgchh.fa", "chgchh_aln.bam", "-o", "v10"],
     ["v10_CpG.bedGraph", "v10_CHG.bedGraph", "v10_CHH.bedGraph"]),
    ("convEff1.0", ["--minConversionEfficiency", "1.0", "--CHH", "--CHG",
                    "chgchh.fa", "chgchh_aln.bam", "-o", "v11"],
     ["v11_CpG.bedGraph", "v11_CHG.bedGraph", "v11_CHH.bedGraph"]),
    ("NH", ["cg100.fa", "NH.bam", "-q", "2", "-o", "v12"],
     ["v12_CpG.bedGraph"]),
    ("NH_ignore", ["--ignoreNH", "cg100.fa", "NH.bam", "-q", "2", "-o", "v13"],
     ["v13_CpG.bedGraph"]),
    ("mergeContext", ["--mergeContext", "cg100.fa", "cg_aln.bam", "-q", "2",
                      "-o", "v14"], ["v14_CpG.bedGraph"]),
    ("cytosine", ["--cytosine_report", "--CHH", "--CHG", "cg100.fa",
                  "cg_aln.bam", "-q", "2", "-o", "v15"],
     ["v15.cytosine_report.txt"]),
    ("counts_all", ["--CHG", "--CHH", "--counts", "chgchh.fa",
                    "chgchh_aln.bam", "-o", "v16"],
     ["v16_CpG.counts.bedGraph", "v16_CHG.counts.bedGraph",
      "v16_CHH.counts.bedGraph"]),
]

# Device-backend coverage beyond extract (VERDICT r2 missing #1): the mbias
# and perRead device paths (parallel/device.py mbias_device/perread_device)
# byte-compared across engines on hardware. "@stdout" compares captured
# stdout instead of a file.
SUBCOMMAND_SCENARIOS = [
    ("mbias_txt", "mbias",
     ["--txt", "--noSVG", "-q", "2", "cg100.fa", "cg_aln.bam"], ["@stdout"]),
    ("mbias_chgchh", "mbias",
     ["--txt", "--noSVG", "--CHG", "--CHH", "chgchh.fa", "chgchh_aln.bam"],
     ["@stdout"]),
    ("perread_cg", "perRead", ["-q", "2", "cg100.fa", "cg_aln.bam"],
     ["@stdout"]),
    ("perread_ct", "perRead", ["-q", "2", "ct100.fa", "ct_aln.bam"],
     ["@stdout"]),
]


def gen_synthetic(d):
    """Synthetic suites: indels + heavy overlap (tests/test_synthetic_e2e
    style) via tests/util_bam + utils/simulate; plus BED-region scenarios
    (incl. --keepStrand, whose per-base strand masks route the device
    engine through the XLA dense fallback — otherwise hardware-uncovered)."""
    sys.path.insert(0, REPO)
    from methyldackel_tpu.utils.simulate import write_synthetic_input
    from methyldackel_tpu.io.bam import BamFile
    from methyldackel_tpu.io.bai import build_bai

    fa, bam = write_synthetic_input(d, 20_000, 100, 1 << 20, seed=11)
    build_bai(BamFile(bam), bam + ".bai")
    # GC-rich genome (75% GC): candidate count exceeds the compacted
    # readback's NCAND budget, forcing the DENSE readback fallback —
    # otherwise hardware-uncovered.
    os.makedirs(os.path.join(d, "gc"), exist_ok=True)
    fa_gc, bam_gc = write_synthetic_input(
        os.path.join(d, "gc"), 20_000, 100, 1 << 20, seed=13, gc=0.75)
    build_bai(BamFile(bam_gc), bam_gc + ".bai")
    import shutil as _sh
    for p in (fa_gc, fa_gc + ".fai", bam_gc, bam_gc + ".bai"):
        if os.path.exists(p):
            _sh.copy(p, os.path.join(d, "gc_" + os.path.basename(p)))
    with open(os.path.join(d, "regions.bed"), "w") as fh:
        fh.write("chrSim\t1000\t200000\t.\t0\t+\n")
        fh.write("chrSim\t300000\t500000\t.\t0\t-\n")
        fh.write("chrSim\t600000\t900000\t.\t0\t+\n")
    return [
        ("synthetic40k", [os.path.basename(fa), os.path.basename(bam),
                          "-o", "vs1"], ["vs1_CpG.bedGraph"]),
        ("gc_rich_dense", ["gc_" + os.path.basename(fa),
                           "gc_" + os.path.basename(bam),
                           "-o", "vs4"], ["vs4_CpG.bedGraph"]),
        # all three contexts on the 75%-GC genome: the C|G candidate mask
        # (~75% of coords) exceeds the 5/8 NCAND cap, forcing the DENSE
        # readback fallback — the CpG-only default now compacts here
        # (~28% of coords), so this variant keeps the fallback validated
        ("gc_rich_allctx", ["--CHH", "--CHG",
                            "gc_" + os.path.basename(fa),
                            "gc_" + os.path.basename(bam),
                            "-o", "vs5"], ["vs5_CpG.bedGraph",
                                           "vs5_CHG.bedGraph",
                                           "vs5_CHH.bedGraph"]),
        ("bed_regions", ["-l", "regions.bed", os.path.basename(fa),
                         os.path.basename(bam), "-o", "vs2"],
         ["vs2_CpG.bedGraph"]),
        ("bed_keepStrand", ["-l", "regions.bed", "--keepStrand",
                            os.path.basename(fa), os.path.basename(bam),
                            "-o", "vs3"], ["vs3_CpG.bedGraph"]),
    ]


RETRIED = []  # (scenario, engine) that only passed on a retry


def run_scenarios(scenarios, workdir, engines):
    fails = []
    for entry in scenarios:
        if len(entry) == 4:
            name, subcmd, args, outputs = entry
        else:
            name, args, outputs = entry
            subcmd = "extract"
        outs = {}
        stdouts = {}
        for engine in engines:
            d = os.path.join(workdir, f"{name}.{engine}")
            os.makedirs(d, exist_ok=True)
            for f in os.listdir(workdir):
                p = os.path.join(workdir, f)
                if os.path.isfile(p):
                    try:
                        os.link(p, os.path.join(d, f))
                    except FileExistsError:
                        pass
            env = dict(os.environ, MDTPU_ENGINE=engine,
                       PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
            r = None
            # Only the device engines ride the remote-compile tunnel; a
            # host-engine crash is a product bug and must not be retried
            # into a green run.
            attempts = 2 if engine in ("jax", "mesh") else 1
            for attempt in range(attempts):
                r = subprocess.run(
                    [sys.executable, "-m", "methyldackel_tpu.cli", subcmd] + args,
                    cwd=d, env=env, capture_output=True, text=True, timeout=1800,
                )
                if r.returncode == 0:
                    if attempt:
                        print(f"NOTE {name} [{engine}] passed on retry "
                              f"(first attempt crashed — tunnel flake?)")
                        RETRIED.append((name, engine))
                    break
                sys.stderr.write(f"--- {name} [{engine}] attempt {attempt} "
                                 f"rc={r.returncode} stderr ---\n{r.stderr}\n")
            if r.returncode != 0:
                print(f"FAIL {name} [{engine}] rc={r.returncode}: {r.stderr[-300:]}")
                fails.append((name, engine))
                outs = None
                break
            outs[engine] = d
            stdouts[engine] = r.stdout
        if not outs:
            continue
        ok = True
        base = engines[0]
        for other in engines[1:]:
            for out in outputs:
                if out == "@stdout":
                    a, b = stdouts[base], stdouts[other]
                else:
                    a = open(os.path.join(outs[base], out), "rb").read()
                    b = open(os.path.join(outs[other], out), "rb").read()
                if a != b:
                    print(f"FAIL {name}: {out} differs host vs {other}")
                    fails.append((name, other))
                    ok = False
        if ok:
            print(f"PASS {name} [{subcmd}] ({', '.join(engines[1:])} == host, "
                  f"{len(outputs)} output(s))")
        sys.stdout.flush()
    return fails


def main():
    import jax

    platform = jax.devices()[0].platform
    print(f"# platform: {platform} devices: {len(jax.devices())}")
    workdir = tempfile.mkdtemp(prefix="mdtpu_tpu_validate_")
    for f in os.listdir(FIXTURES):
        if f.endswith((".fa", ".bam", ".bai", ".fai")):
            shutil.copy(os.path.join(FIXTURES, f), workdir)
    scenarios = SCENARIOS + gen_synthetic(workdir) + SUBCOMMAND_SCENARIOS
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        keys = sys.argv[2].split(",")
        scenarios = [s for s in scenarios if any(k in s[0] for k in keys)]
    fails = run_scenarios(scenarios, workdir, ["host", "jax", "mesh"])
    shutil.rmtree(workdir, ignore_errors=True)
    if RETRIED:
        # Retried passes are tallied separately: a scenario that only ever
        # passes on retry is not the same evidence as a clean pass.
        names = ", ".join(f"{n}[{e}]" for n, e in RETRIED)
        print(f"# RETRIED-PASS: {len(RETRIED)} scenario-engine pair(s) "
              f"passed only on retry: {names}")
    if fails:
        print(f"# RESULT: {len(fails)} FAILURES")
        return 1
    print(f"# RESULT: ALL {len(scenarios)} SCENARIOS PASS "
          f"(jax+mesh byte-identical to host on {platform}; "
          f"{len(RETRIED)} retried)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
