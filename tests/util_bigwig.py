"""Minimal bigWig writer for test fixtures (single chromosome, one
fixedStep section). Produces spec-conformant files the production reader
(methyldackel_tpu.io.bigwig) and libBigWig can both parse."""
import struct
import zlib

import numpy as np

BIGWIG_MAGIC = 0x888FFC26
CHROM_TREE_MAGIC = 0x78CA8C91
RTREE_MAGIC = 0x2468ACE0


def write_bigwig_multi(path, chroms, section=60000, level=1):
    """Multi-chromosome, multi-section bigWig writer (fixedStep sections of
    ≤ `section` values each, one R-tree leaf per section) for
    reference-scale reader tests. chroms: [(name, float32 values)]."""
    header_size = 64
    chrom_tree_off = header_size
    key_size = max(max(len(n) for n, _ in chroms), 1)
    n_chrom = len(chroms)
    chrom_tree = struct.pack("<IIIIQQ", CHROM_TREE_MAGIC, max(n_chrom, 1),
                             key_size, 8, n_chrom, 0)
    chrom_tree += struct.pack("<BBH", 1, 0, n_chrom)
    for cid, (name, vals) in enumerate(chroms):
        chrom_tree += name.encode().ljust(key_size, b"\x00")
        chrom_tree += struct.pack("<II", cid, len(vals))

    full_data_off = chrom_tree_off + len(chrom_tree)
    sections = []  # (cid, start, end, comp)
    max_payload = 1
    for cid, (name, vals) in enumerate(chroms):
        vals = np.asarray(vals, dtype="<f4")
        for s in range(0, len(vals), section):
            chunk = vals[s : s + section]
            payload = struct.pack("<IIIIIBBH", cid, s, s + len(chunk), 1, 1,
                                  3, 0, len(chunk)) + chunk.tobytes()
            max_payload = max(max_payload, len(payload))
            sections.append((cid, s, s + len(chunk),
                             zlib.compress(payload, level)))

    data_block = struct.pack("<Q", len(sections))
    offsets = []
    p = full_data_off + 8
    for cid, s, e, comp in sections:
        offsets.append(p)
        p += len(comp)
    full_index_off = p
    rtree = struct.pack("<IIQIIIIQII", RTREE_MAGIC, max(len(sections), 1),
                        len(sections), sections[0][0], sections[0][1],
                        sections[-1][0], sections[-1][2],
                        full_index_off + 48 + 4 + 32 * len(sections), 512, 0)
    rtree += struct.pack("<BBH", 1, 0, len(sections))
    for (cid, s, e, comp), off in zip(sections, offsets):
        rtree += struct.pack("<IIIIQQ", cid, s, cid, e, off, len(comp))

    header = struct.pack(
        "<IHHQQQHHQQIQ", BIGWIG_MAGIC, 4, 0, chrom_tree_off, full_data_off,
        full_index_off, 1, 1, 0, 0, max_payload, 0,
    )
    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(chrom_tree)
        fh.write(data_block)
        for _, _, _, comp in sections:
            fh.write(comp)
        fh.write(rtree)


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
