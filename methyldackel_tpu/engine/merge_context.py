"""mergeContext subcommand: collapse per-C bedGraph rows into per-CpG/CHG
rows (mergeContext.c). Streaming, single pass, with the reference's exact
pairing rule: two consecutive rows merge only when they map onto the same
merged interval (MergeOrPrint, mergeContext.c:29-55)."""
from __future__ import annotations

import sys

from ..io.fasta import FastaFile
from . import formats


class _Last:
    __slots__ = ("chrom", "start", "end", "nmethyl", "nunmethyl")

    def __init__(self):
        self.chrom = None
        self.start = 0
        self.end = 0
        self.nmethyl = 0
        self.nunmethyl = 0


def get_context(fasta: FastaFile, chrom: str, pos: int):
    """getContext (mergeContext.c:57-95): (type, width) with type 0 CpG,
    1 CHG, 2 CHH/other, 3 unknown chromosome."""
    length = fasta.seq_len(chrom)
    width = 0
    start = pos - 2 if pos > 2 else 0
    end = pos + 2 if pos + 2 < length else length - 1
    seq = fasta.fetch(chrom, start, end)
    if seq is None or length < 0:
        return 3, width
    i = pos - start
    base = chr(seq[i]).upper() if i < len(seq) else "N"
    rv = 2
    if base == "C":
        if end - pos:
            if i + 1 < len(seq) and chr(seq[i + 1]).upper() == "G":
                width = 2
                rv = 0
            elif end - pos == 2:
                if i + 2 < len(seq) and chr(seq[i + 2]).upper() == "G":
                    width = 3
                    rv = 1
    else:
        # the reference asserts base is C or G here (mergeContext.c:79)
        if pos - start:
            if chr(seq[i - 1]).upper() == "C":
                width = -2
                rv = 0
            elif pos - start == 2:
                if chr(seq[i - 2]).upper() == "C":
                    width = -3
                    rv = 1
    return rv, width


def _merge_or_print(out, last: _Last, chrom: str, start: int, width: int,
                    nmethyl: int, nunmethyl: int) -> None:
    if width > 0:
        end = start + width
    else:
        end = start + 1
        start = end + width
    if last.chrom is not None and last.chrom == chrom and last.start == start and last.end == end:
        out.write(formats.merge_context_record(chrom, start, end,
                                               nmethyl + last.nmethyl,
                                               nunmethyl + last.nunmethyl))
        last.chrom = None
    else:
        if last.chrom is not None:
            out.write(formats.merge_context_record(last.chrom, last.start, last.end,
                                                   last.nmethyl, last.nunmethyl))
        last.chrom = chrom
        last.start = start
        last.end = end
        last.nmethyl = nmethyl
        last.nunmethyl = nunmethyl


def merge_context(infile, fasta: FastaFile, out) -> None:
    """mergeContext (mergeContext.c:97-158)."""
    last_cpg = _Last()
    last_chg = _Last()
    for line in infile:
        line = line.rstrip("\n")
        if not line:
            continue
        if line.startswith("track"):
            continue
        f = line.split("\t")
        chrom = f[0]
        start = int(f[1])
        end = int(f[2])
        nmethyl = int(f[4])
        nunmethyl = int(f[5])
        typ, width = get_context(fasta, chrom, start)
        if typ == 0:
            _merge_or_print(out, last_cpg, chrom, start, width, nmethyl, nunmethyl)
        elif typ == 1:
            _merge_or_print(out, last_chg, chrom, start, width, nmethyl, nunmethyl)
        elif typ == 2:
            out.write(formats.merge_context_record(chrom, start, end, nmethyl, nunmethyl))
        else:
            sys.stderr.write(f"[mergeContext] Error, {chrom} is an unknown chromosome name!\n")
            break
    for last in (last_cpg, last_chg):
        if last.chrom is not None:
            out.write(formats.merge_context_record(last.chrom, last.start, last.end,
                                                   last.nmethyl, last.nunmethyl))


def merge_context_usage():
    sys.stderr.write(
        "\nUsage: methyldackel-tpu mergeContext [OPTIONS] <ref.fa> <input>\n\n"
        "Merge single-cytosine metrics (e.g. from extract) into per-CpG/CHG\n"
        "metrics. Input must be coordinate sorted; '-' reads from stdin.\n"
        "Options: -o output file [stdout].\n"
    )


def merge_context_main(argv) -> int:
    from ..cli import getopt_long, GetoptError, print_version

    ofile = None
    try:
        opts, pos = getopt_long(argv, "hvo:", [("help", 0, "h"), ("version", 0, "v")])
    except GetoptError as e:
        sys.stderr.write(f"Invalid option '{e}'\n")
        merge_context_usage()
        return 1
    for key, val in opts:
        if key == "h":
            merge_context_usage()
            return 0
        if key == "v":
            print_version()
            return 0
        if key == "o":
            try:
                ofile = open(val, "w")
            except OSError:
                sys.stderr.write(f"Couldn't open {val} for writing\n")
                return 2
    if not argv:
        merge_context_usage()
        return 0
    if len(pos) != 2:
        sys.stderr.write(
            "You must supply a reference genome in fasta format and an input bedGraph files\n"
        )
        merge_context_usage()
        return -1
    try:
        fasta = FastaFile(pos[0])
    except OSError:
        sys.stderr.write(f"Couldn't open the index for {pos[0]}!\n")
        merge_context_usage()
        return -2
    if pos[1] == "-":
        infile = sys.stdin
    else:
        try:
            infile = open(pos[1])
        except OSError:
            sys.stderr.write(f"Couldn't open {pos[1]} for reading!\n")
            return -3
    out = ofile or sys.stdout
    out.write('track type="bedGraph" description="merged Methylation metrics"\n')
    merge_context(infile, fasta, out)
    if infile is not sys.stdin:
        infile.close()
    if ofile:
        ofile.close()
    return 0
