"""mbias / perRead / mergeContext end-to-end checks."""
import os
import subprocess
import sys

ENV = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
           + os.pathsep + os.environ.get("PYTHONPATH", ""),
           MDTPU_ENGINE=os.environ.get("MDTPU_ENGINE", "host"))


def md(args, cwd):
    return subprocess.run(
        [sys.executable, "-m", "methyldackel_tpu.cli"] + args,
        cwd=cwd, env=ENV, capture_output=True, text=True,
    )


def test_mbias_txt(fixture_dir):
    r = md(["mbias", "--noSVG", "cg100.fa", "cg_aln.bam", "-q", "2"], fixture_dir)
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0] == "Strand\tRead\tPosition\tnMethylated\tnUnmethylated"
    # both mates are OT; cycle 1 (1-based) is a methylated C on each
    assert lines[1] == "OT\t1\t1\t1\t0"
    assert lines[2] == "OT\t2\t1\t1\t0"
    # read1 cycle 17 is a T (unmethylated), read2 a C — no overlap handling
    r1 = [l for l in lines if l.startswith("OT\t1\t17\t")]
    r2 = [l for l in lines if l.startswith("OT\t2\t17\t")]
    assert r1 == ["OT\t1\t17\t0\t1"]
    assert r2 == ["OT\t2\t17\t1\t0"]


def test_mbias_svg(fixture_dir):
    r = md(["mbias", "cg100.fa", "cg_aln.bam", "mb", "-q", "2"], fixture_dir)
    assert r.returncode == 0, r.stderr
    assert "Suggested inclusion options:" in r.stderr
    svg = open(fixture_dir / "mb_OT.svg").read()
    assert svg.startswith('<svg height="660" width="660"')
    assert svg.rstrip().endswith("</svg>")
    assert "Original Top Strand" in svg
    assert not os.path.exists(fixture_dir / "mb_OB.svg")  # no OB data


def test_perread(fixture_dir):
    r = md(["perRead", "cg100.fa", "cg_aln.bam", "-q", "2"], fixture_dir)
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    # default ignoreFlags=0 in perRead → all 4 reads reported
    assert len(lines) == 4
    assert lines[0] == "read1\tchrCG\t0\t97.959184\t49"
    assert lines[1] == "read1\tchrCG\t0\t100.000000\t49"


def test_perread_mapq(fixture_dir):
    r = md(["perRead", "cg100.fa", "cg_aln.bam", "-q", "10"], fixture_dir)
    assert r.stdout == ""


def test_merge_context(fixture_dir):
    md(["extract", "cg100.fa", "cg_aln.bam", "-q", "2", "-o", "mc"], fixture_dir)
    r = md(["mergeContext", "cg100.fa", "mc_CpG.bedGraph"], fixture_dir)
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0] == 'track type="bedGraph" description="merged Methylation metrics"'
    assert lines[1] == "chrCG\t0\t2\t100\t1\t0"
    for line in lines[1:]:
        f = line.split("\t")
        assert int(f[2]) - int(f[1]) == 2


def test_merge_context_matches_merge_flag(fixture_dir):
    """extract --mergeContext ≡ extract | mergeContext on CpG data."""
    md(["extract", "--mergeContext", "cg100.fa", "cg_aln.bam", "-q", "2", "-o", "m1"],
       fixture_dir)
    md(["extract", "cg100.fa", "cg_aln.bam", "-q", "2", "-o", "m2"], fixture_dir)
    r = md(["mergeContext", "cg100.fa", "m2_CpG.bedGraph"], fixture_dir)
    a = open(fixture_dir / "m1_CpG.bedGraph").read().splitlines()[1:]
    b = r.stdout.splitlines()[1:]
    assert a == b


def test_mbias_thread_invariance(fixture_dir):
    r1 = md(["mbias", "--txt", "--noSVG", "cg100.fa", "cg_aln.bam", "-q", "2"],
            fixture_dir)
    r2 = md(["mbias", "--txt", "--noSVG", "-@", "4", "--chunkSize", "16",
             "cg100.fa", "cg_aln.bam", "-q", "2"], fixture_dir)
    assert r1.returncode == 0 and r2.returncode == 0
    assert r1.stdout == r2.stdout and r1.stdout.strip()


def test_perread_thread_invariance(fixture_dir):
    r1 = md(["perRead", "cg100.fa", "cg_aln.bam", "-q", "2"], fixture_dir)
    r2 = md(["perRead", "-@", "3", "--chunkSize", "16", "cg100.fa",
             "cg_aln.bam", "-q", "2"], fixture_dir)
    assert r1.returncode == 0 and r2.returncode == 0
    assert r1.stdout == r2.stdout and r1.stdout.strip()


def test_perread_vectorized_matches_walker():
    """process_reads_gapless must reproduce the scalar processRead state
    machine exactly — including the low-qual quirk (perRead.c:59-63): a
    failing base advances the cursor and the NEXT base is evaluated without
    a quality re-check. Random quals around the threshold exercise chains
    of consecutive low-qual bases."""
    import numpy as np
    from methyldackel_tpu.engine.perread import process_read, process_reads_gapless
    from methyldackel_tpu.config import Config

    rng = np.random.default_rng(99)
    cfg = Config()
    cfg.minPhred = 20
    glen = 600
    ref_window = rng.choice(np.frombuffer(b"ACGT", np.uint8), glen)
    L = 30
    N = 300
    lq = rng.integers(5, L + 1, N)
    pos = rng.integers(0, glen - L - 2, N)
    seq = np.zeros((N, L), np.uint8)
    qual = np.zeros((N, L), np.uint8)
    for i in range(N):
        m = int(lq[i])
        seq[i, :m] = rng.choice([1, 2, 4, 8, 15], m)
        # cluster quals around the threshold so skip chains occur
        qual[i, :m] = rng.integers(17, 24, m)
    strand = rng.integers(1, 5, N)

    nm_v, nu_v = process_reads_gapless(cfg, seq, qual, pos, lq, strand,
                                       ref_window, 0, glen)
    for i in range(N):
        m = int(lq[i])
        cigar = np.array([(m << 4) | 0], np.uint32)
        nm, nu = process_read(cfg, seq[i, :m], qual[i, :m], cigar,
                              int(pos[i]), int(strand[i]), ref_window, 0, glen)
        assert (nm, nu) == (int(nm_v[i]), int(nu_v[i])), i
