from .bgzf import BGZFReader, bgzf_decompress
from .bam import BamFile, ReadBatch
from .fasta import FastaFile
from .bed import BedRegions, parse_bed
from .bbm import read_bbm, write_bbm
from .bigwig import BigWigFile

__all__ = [
    "BGZFReader", "bgzf_decompress", "BamFile", "ReadBatch", "FastaFile",
    "BedRegions", "parse_bed", "read_bbm", "write_bbm", "BigWigFile",
]
