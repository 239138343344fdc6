"""End-to-end extract tests: the reference's own CI scenarios
(/root/reference/tests/test.py:18-146) run against our CLI, asserting the
same line counts, plus content-level checks of the emitted bedGraphs."""
import os
import subprocess
import sys

import pytest

ENV = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
           + os.pathsep + os.environ.get("PYTHONPATH", ""),
           MDTPU_ENGINE=os.environ.get("MDTPU_ENGINE", "host"))


def md(args, cwd):
    return subprocess.run(
        [sys.executable, "-m", "methyldackel_tpu.cli"] + args,
        cwd=cwd, env=ENV, capture_output=True, text=True,
    )


def nlines(path):
    with open(path) as fh:
        return sum(1 for _ in fh)


def run_extract(fixture_dir, args, out, suffix="_CpG.bedGraph"):
    r = md(["extract"] + args, fixture_dir)
    assert r.returncode == 0, r.stderr
    return nlines(fixture_dir / (out + suffix))


def test_ct_fully_converted(fixture_dir):
    assert run_extract(fixture_dir, ["ct100.fa", "ct_aln.bam", "-q", "2", "-o", "t1"], "t1") == 1


def test_cg_calls(fixture_dir):
    assert run_extract(fixture_dir, ["cg100.fa", "cg_aln.bam", "-q", "2", "-o", "t2"], "t2") == 49


def test_mapq_filter(fixture_dir):
    assert run_extract(fixture_dir, ["cg100.fa", "cg_aln.bam", "-q", "10", "-o", "t3"], "t3") == 1


def test_methylkit(fixture_dir):
    r = md(["extract", "--methylKit", "--CHH", "--CHG", "cg100.fa", "cg_aln.bam",
            "-q", "2", "-o", "t4"], fixture_dir)
    assert r.returncode == 0, r.stderr
    assert nlines(fixture_dir / "t4_CpG.methylKit") == 49
    assert nlines(fixture_dir / "t4_CHG.methylKit") == 1
    assert nlines(fixture_dir / "t4_CHH.methylKit") == 2


def test_min_depth(fixture_dir):
    assert run_extract(
        fixture_dir, ["--minDepth", "2", "cg100.fa", "cg_aln.bam", "-q", "2", "-o", "t5"], "t5"
    ) == 1


def test_ignore_flags_atoi_quirk(fixture_dir):
    # "0xD00" parses as 0 through atoi → nothing ignored → QC pair included
    assert run_extract(
        fixture_dir, ["--ignoreFlags", "0xD00", "cg100.fa", "cg_aln.bam", "-q", "2", "-o", "t6"], "t6"
    ) == 49


def test_require_flags(fixture_dir):
    assert run_extract(
        fixture_dir, ["--requireFlags", "0xD00", "cg100.fa", "cg_aln.bam", "-q", "2", "-o", "t7"], "t7"
    ) == 49


def test_absolute_trimming(fixture_dir):
    assert run_extract(
        fixture_dir, ["--nOT", "50,50,40,40", "cg100.fa", "cg_aln.bam", "-q", "2", "-o", "t8"], "t8"
    ) == 12


def test_variant_filtering(fixture_dir):
    assert run_extract(
        fixture_dir,
        ["-p", "1", "-q", "0", "-o", "t9", "--minOppositeDepth", "3",
         "--maxVariantFrac", "0.25", "cg100.fa", "cg_with_variants.bam"],
        "t9",
    ) == 48


def test_conversion_efficiency_ladder(fixture_dir):
    assert run_extract(fixture_dir, ["-o", "t10", "chgchh.fa", "chgchh_aln.bam"], "t10") == 2
    assert run_extract(fixture_dir, ["-o", "t11", "-q", "5", "chgchh.fa", "chgchh_aln.bam"], "t11") == 3
    assert run_extract(
        fixture_dir,
        ["-o", "t12", "-q", "5", "--minConversionEfficiency", "0.9", "chgchh.fa", "chgchh_aln.bam"],
        "t12",
    ) == 2
    assert run_extract(
        fixture_dir,
        ["-o", "t13", "-q", "5", "--minConversionEfficiency", "1.0", "chgchh.fa", "chgchh_aln.bam"],
        "t13",
    ) == 1


def test_nh_filter(fixture_dir):
    assert run_extract(fixture_dir, ["-o", "t14", "-q", "1", "cg100.fa", "NH.bam"], "t14") == 1
    assert run_extract(
        fixture_dir, ["-o", "t15", "--ignoreNH", "-q", "1", "cg100.fa", "NH.bam"], "t15"
    ) == 49


def test_bedgraph_content(fixture_dir):
    """Content-level check of the primary output: header format, coordinates,
    truncated percentages, and the overlap-arbitration outcomes."""
    md(["extract", "cg100.fa", "cg_aln.bam", "-q", "2", "-o", "tc"], fixture_dir)
    lines = open(fixture_dir / "tc_CpG.bedGraph").read().splitlines()
    assert lines[0] == 'track type="bedGraph" description="tc CpG methylation levels"'
    assert lines[1] == "chrCG\t0\t1\t100\t1\t0"
    positions = [int(l.split("\t")[1]) for l in lines[1:]]
    # pos 16: mates disagree (T vs C) with equal quals → both zeroed → dropped
    assert 16 not in positions
    # pos 98 is CHH (ref ends ...CA), not CpG
    assert 98 not in positions
    assert positions == sorted(positions)


def test_merge_context_flag(fixture_dir):
    """--mergeContext folds the G-strand calls onto the C start (width 2)."""
    r = md(["extract", "--mergeContext", "cg100.fa", "cg_aln.bam", "-q", "2", "-o", "tm"],
           fixture_dir)
    assert r.returncode == 0, r.stderr
    lines = open(fixture_dir / "tm_CpG.bedGraph").read().splitlines()
    assert "merged" in lines[0]
    for line in lines[1:]:
        f = line.split("\t")
        assert int(f[2]) - int(f[1]) == 2


def test_fraction_counts_logit(fixture_dir):
    for flag, suffix, col_check in [
        ("--fraction", "_CpG.meth.bedGraph", lambda v: v == "1.000000"),
        ("--counts", "_CpG.counts.bedGraph", lambda v: v == "1"),
        ("--logit", "_CpG.logit.bedGraph", lambda v: v == "inf"),
    ]:
        r = md(["extract", flag, "cg100.fa", "cg_aln.bam", "-q", "2", "-o", "tf"], fixture_dir)
        assert r.returncode == 0, r.stderr
        lines = open(fixture_dir / ("tf" + suffix)).read().splitlines()
        assert col_check(lines[1].split("\t")[3])


def test_cytosine_report(fixture_dir):
    r = md(["extract", "--cytosine_report", "--CHG", "--CHH", "cg100.fa", "cg_aln.bam",
            "-q", "2", "-o", "tr"], fixture_dir)
    assert r.returncode == 0, r.stderr
    lines = open(fixture_dir / "tr.cytosine_report.txt").read().splitlines()
    # every C/G position of the 100bp contig is present (1-based):
    # positions 0..98 alternate c/g (99 rows); the final base is 'A'
    assert len(lines) == 99
    first = lines[0].split("\t")
    assert first[0] == "chrCG" and first[1] == "1" and first[2] == "+"
    assert first[5] == "CG"
    # zero-coverage rows exist for the excluded position 17 (0-based 16)
    pos17 = [l for l in lines if l.split("\t")[1] == "17"][0]
    assert pos17.split("\t")[3:5] == ["0", "0"]
