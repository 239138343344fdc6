"""Minimal bigWig writer for test fixtures (single chromosome, one
fixedStep section). Produces spec-conformant files the production reader
(methyldackel_tpu.io.bigwig) and libBigWig can both parse."""
import struct
import zlib

import numpy as np

BIGWIG_MAGIC = 0x888FFC26
CHROM_TREE_MAGIC = 0x78CA8C91
RTREE_MAGIC = 0x2468ACE0


def write_bigwig(path, chrom, values, start=0, span=1, step=1):
    values = np.asarray(values, dtype=np.float32)
    n = len(values)
    chrom_len = start + n * step

    # data section (zlib-compressed, type 3 = fixedStep)
    payload = struct.pack("<IIIIIBBH", 0, start, start + n * step, step, span, 3, 0, n)
    payload += values.astype("<f4").tobytes()
    comp = zlib.compress(payload)

    header_size = 64
    chrom_tree_off = header_size
    key_size = max(len(chrom), 1)
    chrom_tree = struct.pack("<IIIIQQ", CHROM_TREE_MAGIC, 1, key_size, 8, 1, 0)
    chrom_tree += struct.pack("<BBH", 1, 0, 1)
    chrom_tree += chrom.encode().ljust(key_size, b"\x00")
    chrom_tree += struct.pack("<II", 0, chrom_len)

    full_data_off = chrom_tree_off + len(chrom_tree)
    data_block = struct.pack("<Q", 1) + comp
    data_off = full_data_off + 8

    full_index_off = full_data_off + len(data_block)
    rtree = struct.pack("<IIQIIIIQII", RTREE_MAGIC, 256, 1, 0, start, 0,
                        start + n * step, full_index_off + 48 + 4 + 32, 512, 0)
    rtree += struct.pack("<BBH", 1, 0, 1)
    rtree += struct.pack("<IIIIQQ", 0, start, 0, start + n * step, data_off, len(comp))

    header = struct.pack(
        "<IHHQQQHHQQIQ", BIGWIG_MAGIC, 4, 0, chrom_tree_off, full_data_off,
        full_index_off, 1, 1, 0, 0, max(len(payload), 1 << 15), 0,
    )
    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(chrom_tree)
        fh.write(data_block)
        fh.write(rtree)
