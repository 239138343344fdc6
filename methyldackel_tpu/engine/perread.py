"""perRead subcommand: per-read CpG methylation summary (perRead.c).

processRead (perRead.c:37-94) is reproduced as a faithful state machine,
including its quirk: a base failing the phred gate advances the cursor and
the NEXT base is then evaluated in the same iteration WITHOUT a quality
re-check (perRead.c:59-63). A vectorized device variant exists for
throughput benchmarking, but the emitted rows come from this exact walker.
"""
from __future__ import annotations

import sys

import numpy as np

from ..config import Config, c_atoi
from ..io.bam import BamFile
from ..io.cram import open_alignment
from ..io.fasta import FastaFile
from ..io import bed as bedio
from ..ops import semantics as sem
from .scheduler import windows, parse_region
from .extract import BedState

BASE_C, BASE_G, BASE_T, BASE_A = 2, 4, 8, 1


def _cigar_type(op: int) -> int:
    """bam_cigar_type: bit0 consumes query, bit1 consumes reference."""
    return (0x3C1A7 >> (op * 2)) & 3  # MIDNSHP=X → 3,1,2,2,1,0,0,3,3


def process_read(cfg, seq_codes, quals, cigar, read_pos0, strand, ref_window,
                 seq_start, seq_len):
    """processRead (perRead.c:37-94): returns (nmethyl, nunmethyl)."""
    n_meth = n_unmeth = 0
    read_position = 0
    mapped_position = read_pos0
    op_number = 0
    op_offset = 0
    n_cigar = len(cigar)
    l_qseq = len(seq_codes)
    ops = [(int(c) & 0xF) for c in cigar]
    lens = [(int(c) >> 4) for c in cigar]

    while read_position < l_qseq and op_number < n_cigar:
        if op_offset >= lens[op_number]:
            op_offset = 0
            op_number += 1
            if op_number >= n_cigar:
                break  # the C reads past the CIGAR here; we stop cleanly
        t = _cigar_type(ops[op_number])
        if t & 2:
            if t & 1:  # M/=/X
                if quals[read_position] < cfg.minPhred:
                    mapped_position += 1
                    read_position += 1
                    op_offset += 1
                    if read_position >= l_qseq:
                        break  # C would read past the sequence; stop cleanly
                widx = mapped_position - seq_start
                direction = 0
                if 0 <= widx < seq_len:
                    b = ref_window[widx]
                    if b == ord("C"):
                        if widx + 1 < seq_len and ref_window[widx + 1] == ord("G"):
                            direction = 1
                    elif b == ord("G"):
                        if widx > 0 and ref_window[widx - 1] == ord("C"):
                            direction = -1
                if direction:
                    base = int(seq_codes[read_position])
                    if direction == 1 and (strand & 1) == 1:
                        if base == BASE_C:
                            n_meth += 1
                        elif base == BASE_T:
                            n_unmeth += 1
                    elif direction == -1 and (strand & 1) == 0:
                        if base == BASE_G:
                            n_meth += 1
                        elif base == BASE_A:
                            n_unmeth += 1
                mapped_position += 1
                read_position += 1
                op_offset += 1
            else:  # D/N
                mapped_position += lens[op_number]
                op_number += 1
                op_offset = 0
        elif t & 1:  # I/S
            read_position += lens[op_number]
            op_number += 1
            op_offset = 0
        else:  # H/P/B
            op_offset = 0
            op_number += 1
    return n_meth, n_unmeth


def add_read(qname: str, chrom: str, pos: int, n_meth: int, n_unmeth: int) -> str:
    """addRead (perRead.c:16-35) — note the literal '0.0' for empty reads."""
    if n_meth + n_unmeth > 0:
        pct = 100.0 * n_meth / (n_meth + n_unmeth)
        return f"{qname}\t{chrom}\t{pos}\t{pct:.6f}\t{n_meth + n_unmeth}\n"
    return f"{qname}\t{chrom}\t{pos}\t0.0\t{n_meth + n_unmeth}\n"


def run_perread(cfg, out) -> None:
    fasta = FastaFile(cfg.FastaName)
    bam = open_alignment(cfg.BAMName, fasta)
    hdr = bam.header
    g_tid = g_pos = g_end = 0
    if cfg.reg:
        g_tid, g_pos, g_end = parse_region(cfg.reg, hdr)
    if cfg.bedName and cfg.bed is None:
        cfg.bed = bedio.parse_bed(cfg.bedName, hdr, cfg.keepStrand)
        if cfg.bed is None:
            raise RuntimeError("There was an error while reading in your BED file!")
        sys.stderr.write(f"Parsed {cfg.bed.n} regions in {cfg.bedName}\n")
    def process_window(tid, lpos, lend):
        name = hdr.names[tid]
        if cfg.bed is not None:
            start_idx = bedio.lower_bound(cfg.bed, tid, lpos)
            ok, _ = bedio.span_overlaps_bed(tid, lpos, lend, cfg.bed, start_idx)
            if ok != 1:
                return None
        lpos2 = lpos - 2 if lpos > 1 else 0
        # 10 kb right slack (perRead.c:186); longer-spanning reads are wrong
        # by design in the reference too.
        ref_window = fasta.fetch(name, lpos2, lend + 10000)
        if ref_window is None:
            return None
        seq_len = len(ref_window)

        mask = (bam.tid == tid) & (bam.pos >= lpos) & (bam.pos < lend)
        idx = np.nonzero(mask)[0]
        idx = idx[np.argsort(bam.pos[idx], kind="stable")]
        lines = []
        for i in idx:
            flag = int(bam.flag[i])
            if cfg.requireFlags and (cfg.requireFlags & flag) != cfg.requireFlags:
                continue
            if cfg.ignoreFlags and (cfg.ignoreFlags & flag) != 0:
                continue
            if bam.mapq[i] < cfg.minMapq:
                continue
            seq_codes, quals, _ = bam.read_arrays(i)
            strand = int(sem.strand(np.array([flag], np.uint16),
                                    np.array([bam.xg[i]], np.int8))[0])
            nm, nu = process_read(cfg, seq_codes, quals, bam.cigar(i),
                                  int(bam.pos[i]), strand, ref_window, lpos2, seq_len)
            lines.append(add_read(bam.qname[i], name, int(bam.pos[i]), nm, nu))
        return lines

    # perRead's scheduler claims windows WITHOUT the CpG/CHG boundary
    # adjustment (perRead.c:133-156 has no adjustBounds call); with -@ > 1
    # windows run on a thread pool and drain in genome order (the
    # ticket-ordered flush, perRead.c:201-212).
    win_iter = windows(hdr, fasta, cfg.chunkSize, g_tid, g_pos, g_end,
                       adjust=False)
    n_threads = max(1, int(getattr(cfg, "nThreads", 1) or 1))
    if n_threads == 1:
        for w in win_iter:
            lines = process_window(*w)
            if lines:
                out.write("".join(lines))
    else:
        from concurrent.futures import ThreadPoolExecutor
        from collections import deque

        with ThreadPoolExecutor(max_workers=n_threads) as pool:
            inflight = deque()
            for w in win_iter:
                while len(inflight) >= 2 * n_threads:
                    lines = inflight.popleft().result()
                    if lines:
                        out.write("".join(lines))
                inflight.append(pool.submit(process_window, *w))
            while inflight:
                lines = inflight.popleft().result()
                if lines:
                    out.write("".join(lines))


_PERREAD_LOPTS = [
    ("help", 0, "h"), ("version", 0, "v"), ("chunkSize", 1, 19),
    ("keepStrand", 0, 20), ("ignoreFlags", 1, "F"), ("requireFlags", 1, "R"),
]


def perread_usage():
    sys.stderr.write(
        "\nUsage: methyldackel-tpu perRead [OPTIONS] <ref.fa> <input>\n\n"
        "Compute the average CpG methylation level of each read. Output columns:\n"
        "read name, chromosome, position, CpG methylation (%), informative bases.\n"
        "Options: -q, -p, -r, -l (--keepStrand), -o, -F, -R, -@, --chunkSize.\n"
    )


def perread_main(argv) -> int:
    from ..cli import getopt_long, GetoptError, print_version
    from ..config import perread_defaults

    cfg = perread_defaults()
    ofile = None
    try:
        opts, pos = getopt_long(argv, "hvq:p:o:@:r:l:F:R:", _PERREAD_LOPTS)
    except GetoptError as e:
        sys.stderr.write(f"Invalid option '{e}'\n")
        perread_usage()
        return 1
    for key, val in opts:
        if key == "h":
            perread_usage()
            return 0
        elif key == "v":
            print_version()
            return 0
        elif key == "o":
            try:
                ofile = open(val, "w")
            except OSError:
                sys.stderr.write(f"Couldn't open {val} for writing\n")
                return 2
        elif key == "q":
            cfg.minMapq = c_atoi(val)
        elif key == "p":
            cfg.minPhred = c_atoi(val)
        elif key == "@":
            cfg.nThreads = c_atoi(val)
        elif key == "r":
            cfg.reg = val
        elif key == "l":
            cfg.bedName = val
        elif key == "F":
            cfg.ignoreFlags = c_atoi(val)
        elif key == "R":
            cfg.requireFlags = c_atoi(val)
        elif key == 19:
            cfg.chunkSize = c_atoi(val)
            if cfg.chunkSize < 1:
                sys.stderr.write("Error: The chunk size must be at least 1!\n")
                return 1
        elif key == 20:
            cfg.keepStrand = 1

    if not argv:
        perread_usage()
        return 0
    if len(pos) != 2:
        sys.stderr.write(
            "You must supply a reference genome in fasta format and a BAM or CRAM file\n"
        )
        perread_usage()
        return -1
    if cfg.minPhred < 1:
        sys.stderr.write(
            f"-p {cfg.minPhred} is invalid. resetting to 1, which is the lowest possible value.\n"
        )
        cfg.minPhred = 1
    if cfg.minMapq < 0:
        sys.stderr.write(
            f"-q {cfg.minMapq} is invalid. Resetting to 0, which is the lowest possible value.\n"
        )
        cfg.minMapq = 0

    cfg.FastaName = pos[0]
    cfg.BAMName = pos[1]
    out = ofile or sys.stdout
    run_perread(cfg, out)
    if ofile:
        ofile.close()
    return 0
