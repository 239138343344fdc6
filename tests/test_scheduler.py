"""Window scheduler + chunk-size invariance tests."""
import os
import subprocess
import sys

import numpy as np
import pytest

from methyldackel_tpu.engine.scheduler import windows, parse_region, adjust_bounds
from methyldackel_tpu.io.bam import BamHeader
from methyldackel_tpu.io.fasta import FastaFile

ENV = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
           + os.pathsep + os.environ.get("PYTHONPATH", ""),
           MDTPU_ENGINE=os.environ.get("MDTPU_ENGINE", "host"))


class FakeFasta:
    def __init__(self, seqs):
        self.seqs = {k: np.frombuffer(v.encode(), dtype=np.uint8) for k, v in seqs.items()}

    def fetch(self, name, start, end):
        s = self.seqs.get(name)
        if s is None:
            return None
        start = max(start, 0)
        end = min(end, len(s) - 1)
        if start > end:
            return np.zeros(0, np.uint8)
        return s[start : end + 1]


def test_windows_roll_contigs():
    hdr = BamHeader("", ["c1", "c2"], [250, 90])
    fa = FakeFasta({"c1": "A" * 250, "c2": "A" * 90})
    w = list(windows(hdr, fa, 100))
    assert w == [(0, 0, 100), (0, 100, 200), (0, 200, 250), (1, 0, 90)]


def test_adjust_bounds_extends_over_cpg():
    # boundary at a C followed by G → +1; C?G straddle → +2
    fa = FakeFasta({"c": "AAAACGAA"})
    # end=5 (0-based): bases end-1..end+1 = "ACG" → seq[1]=='C'? check code:
    # seq[0]='A', seq[1]='C'? adjustBounds checks seq[0]=='C' && seq[2]=='G'
    # (CHG straddle) elif seq[1]=='G'.
    pos, end = adjust_bounds(fa, "c", 0, 5)  # bases 4,5,6 = "CGA": seq[1]='G' → +1
    assert end == 6
    fa2 = FakeFasta({"c": "AAAACAGA"})
    pos, end = adjust_bounds(fa2, "c", 0, 5)  # bases 4,5,6 = "CAG" → CHG → +2
    assert end == 7


def test_parse_region():
    hdr = BamHeader("", ["chr1"], [1000])
    assert parse_region("chr1", hdr) == (0, 0, 0)
    assert parse_region("chr1:100-200", hdr) == (0, 99, 200)
    assert parse_region("chr1:100", hdr) == (0, 99, 100)
    assert parse_region("chr1:1-5000", hdr) == (0, 0, 1000)
    with pytest.raises(ValueError):
        parse_region("nope:1-2", hdr)


def md(args, cwd):
    return subprocess.run(
        [sys.executable, "-m", "methyldackel_tpu.cli"] + args,
        cwd=cwd, env=ENV, capture_output=True, text=True,
    )


def test_chunk_size_invariance(fixture_dir):
    """Same output with 1 Mb windows and 16 bp windows (the analogue of the
    reference's thread-count determinism; reads span whole windows so the
    chunk-local approximations don't bite on these fixtures)."""
    md(["extract", "cg100.fa", "cg_aln.bam", "-q", "2", "-o", "big"], fixture_dir)
    md(["extract", "--chunkSize", "16", "cg100.fa", "cg_aln.bam", "-q", "2",
        "-o", "small"], fixture_dir)
    a = open(fixture_dir / "big_CpG.bedGraph").read().splitlines()[1:]
    b = open(fixture_dir / "small_CpG.bedGraph").read().splitlines()[1:]
    assert a == b

    md(["extract", "--CHH", "--CHG", "chgchh.fa", "chgchh_aln.bam", "-q", "5",
        "-o", "cbig"], fixture_dir)
    md(["extract", "--CHH", "--CHG", "--chunkSize", "7", "chgchh.fa",
        "chgchh_aln.bam", "-q", "5", "-o", "csmall"], fixture_dir)
    for ctx in ("CpG", "CHG", "CHH"):
        a = open(fixture_dir / f"cbig_{ctx}.bedGraph").read().splitlines()[1:]
        b = open(fixture_dir / f"csmall_{ctx}.bedGraph").read().splitlines()[1:]
        assert a == b, ctx


def test_distributed_window_partition():
    """DCN window partition is a disjoint cover and reassembles in order."""
    from methyldackel_tpu.parallel.distributed import owned_windows

    wins = [(0, i * 10, (i + 1) * 10) for i in range(23)]
    seen = {}
    for h in range(4):
        for i, w in owned_windows(iter(wins), h, 4):
            assert i not in seen
            seen[i] = (h, w)
    assert sorted(seen) == list(range(23))
    assert [seen[i][1] for i in sorted(seen)] == wins


def test_merge_host_outputs(tmp_path):
    from methyldackel_tpu.parallel.distributed import merge_host_outputs

    n_hosts, n_windows = 3, 7
    for i in range(n_windows):
        (tmp_path / f"p.h{i % n_hosts}.w{i}").write_text(f"w{i}\n")
    out = tmp_path / "merged"
    out.write_text("header\n")
    merge_host_outputs(str(tmp_path / "p"), str(out), n_hosts, n_windows)
    assert out.read_text() == "header\n" + "".join(f"w{i}\n" for i in range(n_windows))


def test_thread_count_invariance(fixture_dir):
    """-@ N gives byte-identical output to -@ 1 for any N (the reference's
    determinism property, extract.c:514-535) — windows run on a thread pool
    but drain in genome order."""
    base = ["extract", "--chunkSize", "16", "cg100.fa", "cg_aln.bam",
            "-q", "2"]
    md(base + ["-o", "st"], fixture_dir)
    md(base + ["-@", "4", "-o", "mt"], fixture_dir)
    a = open(fixture_dir / "st_CpG.bedGraph").read().splitlines()[1:]
    b = open(fixture_dir / "mt_CpG.bedGraph").read().splitlines()[1:]
    assert a == b and len(a) > 2


def test_thread_count_invariance_bed(fixture_dir):
    """Threaded windows with a BED filter: per-window lower-bound BED scans
    must reproduce the sequential resumable-index walk exactly."""
    with open(fixture_dir / "r.bed", "w") as fh:
        fh.write("chrCG\t0\t20\nchrCG\t33\t50\nchrCG\t60\t78\n")
    base = ["extract", "--chunkSize", "16", "-l", "r.bed", "cg100.fa",
            "cg_aln.bam", "-q", "2"]
    md(base + ["-o", "bst"], fixture_dir)
    md(base + ["-@", "3", "-o", "bmt"], fixture_dir)
    a = open(fixture_dir / "bst_CpG.bedGraph").read().splitlines()[1:]
    b = open(fixture_dir / "bmt_CpG.bedGraph").read().splitlines()[1:]
    assert a == b and len(a) > 1


def test_streaming_mode_invariance(fixture_dir):
    """MDTPU_STREAM=1 (BAI-guided per-window decode) must produce the same
    bytes as the in-memory decoder for extract, perRead and mbias."""
    env2 = dict(ENV, MDTPU_STREAM="1")

    def md_s(args, cwd):
        import subprocess, sys as _sys
        return subprocess.run([_sys.executable, "-m", "methyldackel_tpu.cli"] + args,
                              cwd=cwd, env=env2, capture_output=True, text=True)

    base = ["extract", "--chunkSize", "16", "cg100.fa", "cg_aln.bam", "-q", "2"]
    md(base + ["-o", "mem"], fixture_dir)
    r = md_s(base + ["-o", "strm"], fixture_dir)
    assert r.returncode == 0, r.stderr
    a = open(fixture_dir / "mem_CpG.bedGraph").read().splitlines()[1:]
    b = open(fixture_dir / "strm_CpG.bedGraph").read().splitlines()[1:]
    assert a == b and len(a) > 2

    r1 = md(["perRead", "-q", "2", "cg100.fa", "cg_aln.bam"], fixture_dir)
    r2 = md_s(["perRead", "-q", "2", "cg100.fa", "cg_aln.bam"], fixture_dir)
    assert r1.stdout == r2.stdout and r1.stdout.strip()

    m1 = md(["mbias", "--txt", "--noSVG", "cg100.fa", "cg_aln.bam", "-q", "2"],
            fixture_dir)
    m2 = md_s(["mbias", "--txt", "--noSVG", "cg100.fa", "cg_aln.bam", "-q", "2"],
              fixture_dir)
    assert m1.stdout == m2.stdout and m1.stdout.strip()


def test_streaming_region_invariance(fixture_dir):
    """-r region under streaming mode equals the in-memory result."""
    import subprocess, sys as _sys
    env2 = dict(ENV, MDTPU_STREAM="1")
    base = ["extract", "-r", "chrCG:20-60", "cg100.fa", "cg_aln.bam", "-q", "2"]
    md(base + ["-o", "rmem"], fixture_dir)
    r = subprocess.run([_sys.executable, "-m", "methyldackel_tpu.cli"] + base
                       + ["-o", "rstrm"], cwd=fixture_dir, env=env2,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    a = open(fixture_dir / "rmem_CpG.bedGraph").read().splitlines()[1:]
    b = open(fixture_dir / "rstrm_CpG.bedGraph").read().splitlines()[1:]
    assert a == b and len(a) > 0
