"""Minimal BAM writer for test fixtures."""
import struct
import zlib

import numpy as np

_OPS = {"M": 0, "I": 1, "D": 2, "N": 3, "S": 4, "H": 5, "P": 6, "=": 7, "X": 8}
_CODE = {"=": 0, "A": 1, "C": 2, "M": 3, "G": 4, "R": 5, "S": 6, "V": 7,
         "T": 8, "W": 9, "Y": 10, "H": 11, "K": 12, "D": 13, "B": 14, "N": 15}


def _bgzf_block(payload: bytes) -> bytes:
    comp = zlib.compress(payload, 6)[2:-4]
    out = b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff\x06\x00\x42\x43\x02\x00"
    out += struct.pack("<H", len(comp) + 25)
    out += comp
    out += struct.pack("<I", zlib.crc32(payload))
    out += struct.pack("<I", len(payload))
    return out

_EOF = bytes.fromhex("1f8b08040000000000ff0600424302001b0003000000000000000000")


def parse_cigar(cig: str):
    out = []
    n = ""
    for ch in cig:
        if ch.isdigit():
            n += ch
        else:
            out.append((int(n) << 4) | _OPS[ch])
            n = ""
    return out


def write_bam(path, refs, records):
    """refs: [(name, length)]; records: dicts with qname, flag, tid, pos,
    mapq, cigar (string), seq (string), qual (list[int] or int), tags
    (optional bytes)."""
    hdr = b"BAM\x01"
    text = ("".join(f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in refs) + "\x00").encode()
    hdr += struct.pack("<i", len(text)) + text
    hdr += struct.pack("<i", len(refs))
    for n, l in refs:
        nb = n.encode() + b"\x00"
        hdr += struct.pack("<i", len(nb)) + nb + struct.pack("<i", l)

    body = bytearray(hdr)
    for r in records:
        qname = r["qname"].encode() + b"\x00"
        cig = parse_cigar(r.get("cigar", f"{len(r['seq'])}M"))
        seq = r["seq"]
        l_seq = len(seq)
        q = r.get("qual", 40)
        quals = bytes([q] * l_seq) if isinstance(q, int) else bytes(q)
        packed = bytearray((l_seq + 1) // 2)
        for j, ch in enumerate(seq):
            c = _CODE[ch.upper()]
            if j % 2 == 0:
                packed[j // 2] |= c << 4
            else:
                packed[j // 2] |= c
        rec = struct.pack(
            "<iiBBHHHiiii", r.get("tid", 0), r["pos"], len(qname),
            r.get("mapq", 40), 4681, len(cig), r["flag"], l_seq,
            r.get("mtid", r.get("tid", 0)), r.get("mpos", r["pos"]),
            r.get("tlen", 0),
        )
        rec += qname + b"".join(struct.pack("<I", c) for c in cig)
        rec += bytes(packed) + quals + r.get("tags", b"")
        body += struct.pack("<i", len(rec)) + rec

    blocks = bytearray()
    for i in range(0, len(body), 60000):
        blocks += _bgzf_block(bytes(body[i : i + 60000]))
    blocks += _EOF
    with open(path, "wb") as fh:
        fh.write(bytes(blocks))
