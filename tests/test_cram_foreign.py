"""Foreign-dialect CRAM fixture (VERDICT r2 #7 / PARITY "Known gaps").

No htslib exists in this image and there is no network, so a true
htslib-written file cannot be obtained. The risk the gap tracks is
writer-bias: a decoder that only handles its own writer's encoding
choices. This test closes that by hand-encoding a container with an
INDEPENDENT encoder making htslib-flavored choices bam_to_cram never
makes:

- two slices in one container (ours: one slice/container)
- BF/CF/BS as real multi-symbol canonical HUFFMAN codes in CORE bits
  (ours: external ITF8 / zero-bit constants)
- RL as core BETA, AP as core GAMMA deltas, MQ as core BETA
- RN via BYTE_ARRAY_STOP (NUL stop), XG tag via BYTE_ARRAY_STOP (tab stop)
- several int series sharing ONE external block (MF/NS/NP/TS/NF)
- a PERMUTED substitution matrix (SM = 0x6C rows, not the identity 0x1B)
- X substitution, D deletion, I insertion, S soft-clip, unmapped BA record
- a gzip-compressed external block among RAW ones

The decoded records are compared field-by-field against the hand-computed
truth (reference-reconstructed sequences, CIGARs, NF mate resolution,
detached MF flag propagation).
"""
import struct
import zlib

import numpy as np
import pytest

from methyldackel_tpu.io.cram import (
    CramFile, _BitWriter, write_itf8, write_ltf8, _write_array_itf8,
    _write_block, _encoding_bytes, Block, _eof_container, _container_header,
    CRAM_MAGIC, COMPRESSION_HEADER, SLICE_HEADER, CORE_DATA, EXTERNAL_DATA,
    FILE_HEADER, RAW, GZIP,
    E_EXTERNAL, E_HUFFMAN, E_BYTE_ARRAY_STOP, E_BETA, E_GAMMA,
    CF_QUAL, CF_DETACHED, CF_MATE_DOWNSTREAM, MF_MATE_REVERSE,
)


REF_SEQ = b"ACGTACGTACGTACGTACGTACGTACGTACGT"  # chrF, 32 bp


def _huff_params(alphabet, lengths):
    return _write_array_itf8(alphabet) + _write_array_itf8(lengths)


def _canonical_codes(alphabet, lengths):
    """Mirror of the decoder's canonical-code construction."""
    order = sorted(range(len(alphabet)), key=lambda i: lengths[i])
    codes = {}
    code = 0
    prev = lengths[order[0]]
    for i in order:
        code <<= lengths[i] - prev
        prev = lengths[i]
        codes[alphabet[i]] = (lengths[i], code)
        code += 1
    return codes


class _ForeignEncoder:
    def __init__(self):
        self.core = _BitWriter()
        self.ext = {cid: bytearray() for cid in (1, 2, 3, 4, 5, 6, 7)}
        self.bf_codes = _canonical_codes([0x63, 0x93, 0x11, 0x4],
                                         [1, 2, 3, 3])
        self.cf_codes = _canonical_codes([CF_QUAL,
                                          CF_QUAL | CF_DETACHED,
                                          CF_QUAL | CF_MATE_DOWNSTREAM],
                                         [1, 2, 2])
        self.bs_codes = _canonical_codes([0, 1, 2, 3], [2, 2, 2, 2])

    def huff(self, codes, v):
        ln, code = codes[v]
        self.core.write_bits(code, ln)

    def beta(self, v, nbits):
        self.core.write_bits(v, nbits)

    def gamma(self, v):  # encodes v >= 1
        n = v.bit_length() - 1
        self.core.write_bits(1, n + 1)
        if n:
            self.core.write_bits(v & ((1 << n) - 1), n)

    def itf8(self, cid, v):
        self.ext[cid] += write_itf8(v)

    def raw(self, cid, data):
        self.ext[cid] += data


def _build_foreign_cram(tmp_path, v31=False, codecs68=False):
    """Independent-encoder CRAM fixture. v31=True writes a CRAM 3.1
    container: version bytes (3,1) and external/core blocks compressed
    with rANS Nx16 under a spread of transform flags (order-0/1, PACK,
    RLE, X32, STRIPE) — the foreign-dialect gate for io/ransnx16.py.
    codecs68=True (implies v31) additionally routes RN through the name
    tokeniser (method 8), QS through fqzcomp (method 7), and the core +
    remaining external blocks through the adaptive arithmetic coder
    (method 6) under a spread of its transform flags — the integration
    gate for io/tok3.py, io/fqzcomp.py and io/arith.py."""
    v31 = v31 or codecs68
    enc = _ForeignEncoder()

    # ---------- slice 1: proper pair, NF downstream mate ----------
    # r1: pos 0, rl 8, X substitution at read pos 4 (ref T -> read C)
    enc.huff(enc.bf_codes, 0x63)
    enc.huff(enc.cf_codes, CF_QUAL | CF_MATE_DOWNSTREAM)
    enc.beta(8, 5)                   # RL
    enc.gamma(0 + 1)                 # AP delta 0 (ap=1)
    enc.raw(1, b"pairA\x00")         # RN
    enc.itf8(2, 0)                   # NF: mate is the next record
    enc.raw(3, b"CT\t")              # XG tag
    enc.itf8(4, 1)                   # FN
    enc.raw(4, b"X")                 # FC
    enc.itf8(4, 4)                   # FP (1-based read pos 4)
    # SM rows are all 0x6C: target index t gets code (0x6C >> (6-2t)) & 3
    # = [1, 2, 3, 0]; ref[3]='T' (row 3, targets ACGN); read base 'C' is
    # target index 1 -> code 2
    enc.huff(enc.bs_codes, 2)        # BS
    enc.beta(30, 6)                  # MQ
    enc.raw(7, bytes(range(30, 38)))  # QS

    # r2: pos 4, rl 8, 2bp deletion after 4M
    enc.huff(enc.bf_codes, 0x93)
    enc.huff(enc.cf_codes, CF_QUAL)
    enc.beta(8, 5)
    enc.gamma(4 + 1)                 # AP delta 4 (ap=5, pos 4)
    enc.raw(1, b"x2\x00")            # overwritten by mate resolution
    enc.raw(3, b"GA\t")
    enc.itf8(4, 1)                   # FN
    enc.raw(4, b"D")                 # FC
    enc.itf8(4, 5)                   # FP: after 4 matched bases
    enc.itf8(4, 2)                   # DL
    enc.beta(31, 6)                  # MQ
    enc.raw(7, bytes(range(40, 48)))

    slice1_core = enc.core.getvalue()
    slice1_ext = {cid: bytes(b) for cid, b in enc.ext.items()}

    # ---------- slice 2: detached read + unmapped record ----------
    enc = _ForeignEncoder.__new__(_ForeignEncoder)
    _ForeignEncoder.__init__(enc)
    # r3: pos 12, rl 8, 2M 2I(GG) 2M 2S(TT); detached mate (MF reverse)
    enc.huff(enc.bf_codes, 0x11)
    enc.huff(enc.cf_codes, CF_QUAL | CF_DETACHED)
    enc.beta(8, 5)
    enc.gamma(0 + 1)                 # AP delta 0 (ap=13, pos 12)
    enc.raw(1, b"single\x00")
    enc.itf8(2, MF_MATE_REVERSE)     # MF
    enc.itf8(2, 0)                   # NS (mate tid)
    enc.itf8(2, 20)                  # NP (1-based -> mpos 19)
    enc.itf8(2, 100)                 # TS
    enc.raw(3, b"CT\t")
    enc.itf8(4, 2)                   # FN
    enc.raw(4, b"I")
    enc.itf8(4, 3)                   # FP 3
    enc.raw(5, b"GG\x00")            # IN (stop 0)
    enc.raw(4, b"S")
    enc.itf8(4, 4)                   # FP delta 4 -> read pos 7
    enc.raw(5, b"TT\x00")            # SC
    enc.beta(42, 6)                  # MQ
    enc.raw(7, bytes(range(50, 58)))

    # r4: unmapped (BF 0x4), rl 6, verbatim bases
    enc.huff(enc.bf_codes, 0x4)
    enc.huff(enc.cf_codes, CF_QUAL | CF_DETACHED)
    enc.beta(6, 5)
    enc.gamma(1 + 1)                 # AP delta 1 (ap=14, pos 13)
    enc.raw(1, b"unm\x00")
    enc.itf8(2, 0)                   # MF
    enc.itf8(2, -1)                  # NS
    enc.itf8(2, 0)                   # NP -> mpos -1
    enc.itf8(2, 0)                   # TS
    enc.raw(3, b"GA\t")
    enc.raw(6, b"ACGTNN")            # BA
    enc.raw(7, bytes(range(60, 66)))

    slice2_core = enc.core.getvalue()
    slice2_ext = {cid: bytes(b) for cid, b in enc.ext.items()}

    # ---------- compression header ----------
    pres = bytearray()
    pres += b"RN" + b"\x01"
    pres += b"AP" + b"\x01"
    pres += b"RR" + b"\x01"
    pres += b"SM" + bytes([0x6C] * 5)
    td_blob = b"XGZ\x00"
    pres += b"TD" + write_itf8(len(td_blob)) + td_blob
    pres_map = write_itf8(len(pres) + 1) + write_itf8(5) + bytes(pres)

    series = {
        "BF": (E_HUFFMAN, _huff_params([0x63, 0x93, 0x11, 0x4],
                                       [1, 2, 3, 3])),
        "CF": (E_HUFFMAN, _huff_params(
            [CF_QUAL, CF_QUAL | CF_DETACHED, CF_QUAL | CF_MATE_DOWNSTREAM],
            [1, 2, 2])),
        "RL": (E_BETA, write_itf8(0) + write_itf8(5)),
        "AP": (E_GAMMA, write_itf8(1)),
        "RG": (E_HUFFMAN, _write_array_itf8([-1]) + _write_array_itf8([0])),
        "RN": (E_BYTE_ARRAY_STOP, bytes([0]) + write_itf8(1)),
        "MF": (E_EXTERNAL, write_itf8(2)),
        "NS": (E_EXTERNAL, write_itf8(2)),
        "NP": (E_EXTERNAL, write_itf8(2)),
        "TS": (E_EXTERNAL, write_itf8(2)),
        "NF": (E_EXTERNAL, write_itf8(2)),
        "TL": (E_HUFFMAN, _write_array_itf8([0]) + _write_array_itf8([0])),
        "FN": (E_EXTERNAL, write_itf8(4)),
        "FC": (E_EXTERNAL, write_itf8(4)),
        "FP": (E_EXTERNAL, write_itf8(4)),
        "BS": (E_HUFFMAN, _huff_params([0, 1, 2, 3], [2, 2, 2, 2])),
        "DL": (E_EXTERNAL, write_itf8(4)),
        "IN": (E_BYTE_ARRAY_STOP, bytes([0]) + write_itf8(5)),
        "SC": (E_BYTE_ARRAY_STOP, bytes([0]) + write_itf8(5)),
        "BA": (E_EXTERNAL, write_itf8(6)),
        "QS": (E_EXTERNAL, write_itf8(7)),
        "MQ": (E_BETA, write_itf8(0) + write_itf8(6)),
    }
    ser = bytearray()
    for key, (codec, params) in series.items():
        ser += key.encode() + _encoding_bytes(codec, params)
    ser_map = write_itf8(len(ser) + 1) + write_itf8(len(series)) + bytes(ser)

    xg_key = (ord("X") << 16) | (ord("G") << 8) | ord("Z")
    tag = write_itf8(xg_key) + _encoding_bytes(
        E_BYTE_ARRAY_STOP, bytes([9]) + write_itf8(3))
    tag_map = write_itf8(len(tag) + 1) + write_itf8(1) + bytes(tag)

    comp_block = _write_block(
        Block(COMPRESSION_HEADER, 0, pres_map + ser_map + tag_map, RAW))

    # ---------- slices ----------
    from methyldackel_tpu.io import ransnx16
    from methyldackel_tpu.io.cram import RANSNX16
    import zlib as _zlib

    nx16_flags = [0, ransnx16.ORDER1, ransnx16.PACK,
                  ransnx16.RLE, ransnx16.PACK | ransnx16.RLE,
                  ransnx16.X32 | ransnx16.ORDER1, ransnx16.STRIPE,
                  ransnx16.CAT]

    def block_nx16(ctype, cid, data, flags):
        comp = ransnx16.compress(data, flags)
        out = bytearray([RANSNX16, ctype])
        out += write_itf8(cid)
        out += write_itf8(len(comp))
        out += write_itf8(len(data))
        out += comp
        out += struct.pack("<I", _zlib.crc32(bytes(out)) & 0xFFFFFFFF)
        return bytes(out)

    def slice_blocks(aln_start, aln_span, n_records, core, ext, gzip_cid):
        cids = sorted(ext)
        shdr = bytearray()
        shdr += write_itf8(0)              # ref_id
        shdr += write_itf8(aln_start)
        shdr += write_itf8(aln_span)
        shdr += write_itf8(n_records)
        shdr += write_ltf8(0)              # counter
        shdr += write_itf8(1 + len(cids))  # n data blocks (core + externals)
        shdr += _write_array_itf8(cids)
        shdr += write_itf8(-1)             # no embedded ref
        shdr += b"\x00" * 16               # md5
        out = _write_block(Block(SLICE_HEADER, 0, bytes(shdr), RAW))
        if v31:
            out += block_nx16(CORE_DATA, 0, core, ransnx16.ORDER1)
            for k, cid in enumerate(cids):
                out += block_nx16(EXTERNAL_DATA, cid, ext[cid],
                                  nx16_flags[k % len(nx16_flags)])
            return out
        out += _write_block(Block(CORE_DATA, 0, core, RAW))
        for cid in cids:
            method = GZIP if cid == gzip_cid else RAW
            out += _write_block(Block(EXTERNAL_DATA, cid, ext[cid], method))
        return out

    if codecs68:
        from methyldackel_tpu.io import arith as _arith
        from methyldackel_tpu.io import fqzcomp as _fqz
        from methyldackel_tpu.io import tok3 as _tok3
        from methyldackel_tpu.io.cram import ARITH, FQZCOMP, TOK3

        arith_flags = [0, _arith.ORDER1, _arith.RLE,
                       _arith.ORDER1 | _arith.RLE, _arith.EXT,
                       _arith.STRIPE, _arith.CAT]

        def block_m(method, ctype, cid, data, comp):
            out = bytearray([method, ctype])
            out += write_itf8(cid)
            out += write_itf8(len(comp))
            out += write_itf8(len(data))
            out += comp
            out += struct.pack("<I", zlib.crc32(bytes(out)) & 0xFFFFFFFF)
            return bytes(out)

        def slice_blocks_68(aln_start, aln_span, n_records, core, ext,
                            qs_lens):
            cids = sorted(ext)
            shdr = bytearray()
            shdr += write_itf8(0)
            shdr += write_itf8(aln_start)
            shdr += write_itf8(aln_span)
            shdr += write_itf8(n_records)
            shdr += write_ltf8(0)
            shdr += write_itf8(1 + len(cids))
            shdr += _write_array_itf8(cids)
            shdr += write_itf8(-1)
            shdr += b"\x00" * 16
            out = _write_block(Block(SLICE_HEADER, 0, bytes(shdr), RAW))
            out += block_m(ARITH, CORE_DATA, 0, core,
                           _arith.compress(core, _arith.ORDER1))
            for k, cid in enumerate(cids):
                if cid == 1:      # RN: NUL-separated names -> tok3
                    comp = _tok3.compress(ext[cid])
                    out += block_m(TOK3, EXTERNAL_DATA, cid, ext[cid], comp)
                elif cid == 7:    # QS -> fqzcomp with true record lengths
                    comp = _fqz.compress(ext[cid], qs_lens)
                    out += block_m(FQZCOMP, EXTERNAL_DATA, cid, ext[cid],
                                   comp)
                else:
                    fl = arith_flags[k % len(arith_flags)]
                    out += block_m(ARITH, EXTERNAL_DATA, cid, ext[cid],
                                   _arith.compress(ext[cid], fl))
            return out

        body = comp_block
        body += slice_blocks_68(1, 12, 2, slice1_core, slice1_ext, [8, 8])
        body += slice_blocks_68(13, 8, 2, slice2_core, slice2_ext, [8, 6])
    else:
        body = comp_block
        body += slice_blocks(1, 12, 2, slice1_core, slice1_ext, gzip_cid=7)
        body += slice_blocks(13, 8, 2, slice2_core, slice2_ext, gzip_cid=1)

    out = bytearray()
    out += CRAM_MAGIC + bytes([3, 1 if v31 else 0]) + b"\x00" * 20
    sam = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chrF\tLN:32\n"
    hdr_payload = struct.pack("<i", len(sam)) + sam.encode()
    hdr_block = _write_block(Block(FILE_HEADER, 0, hdr_payload, RAW))
    out += _container_header(len(hdr_block), -1, 0, 0, 0, 0, 0, 1, [0])
    out += hdr_block
    out += _container_header(len(body), 0, 1, 20, 4, 0, 0,
                             2 + 2 * 2 + len(slice1_ext) + len(slice2_ext),
                             [0])
    out += body
    out += _eof_container()

    path = tmp_path / "foreign.cram"
    path.write_bytes(bytes(out))
    fa = tmp_path / "f.fa"
    fa.write_text(">chrF\n" + REF_SEQ.decode() + "\n")
    return str(path), str(fa)


def test_foreign_dialect_cram_decodes_exactly(tmp_path):
    path, fa = _build_foreign_cram(tmp_path)
    cf = CramFile(path, fasta=fa)
    assert cf.n_reads == 4

    assert list(cf.qname) == ["pairA", "pairA", "single", "unm"]
    # r1: flag 0x63 + NF resolution (mate r2 has 0x10 -> r1 |= 0x20 already)
    np.testing.assert_array_equal(cf.flag,
                                  [0x63, 0x93, 0x11 | 0x20, 0x4])
    np.testing.assert_array_equal(cf.pos, [0, 4, 12, 13])
    np.testing.assert_array_equal(cf.mapq, [30, 31, 42, 0])
    np.testing.assert_array_equal(cf.l_qseq, [8, 8, 8, 6])
    # NF mate resolution links the pair; r3 detached: NS/NP
    np.testing.assert_array_equal(cf.mtid, [0, 0, 0, -1])
    np.testing.assert_array_equal(cf.mpos, [4, 0, 19, -1])
    np.testing.assert_array_equal(cf.xg, [1, 2, 1, 2])

    def seq_str(i):
        from methyldackel_tpu.io.cram import _CODE2ASCII

        o0, o1 = cf.offsets[i], cf.offsets[i + 1]
        return bytes(_CODE2ASCII[cf.seq_flat[o0:o1]]).decode()

    # r1: ref ACGTACGT with X at pos 4 (T->C via permuted SM)
    assert seq_str(0) == "ACGCACGT"
    # r2: 4M (ACGT from ref[4:8]) + 2D + 4M (ref[10:14] = GTAC)
    assert seq_str(1) == "ACGTGTAC"
    # r3: 2M (AC) + 2I (GG) + 2M (GT) + 2S (TT)
    assert seq_str(2) == "ACGGGTTT"
    # r4: verbatim unmapped bases
    assert seq_str(3) == "ACGTNN"

    def cigar_str(i):
        ops = "MIDNSHP=X"
        return "".join(f"{int(c) >> 4}{ops[int(c) & 0xF]}"
                       for c in cf.cigar(i))

    assert cigar_str(0) == "8M"
    assert cigar_str(1) == "4M2D4M"
    assert cigar_str(2) == "2M2I2M2S"
    assert cigar_str(3) == ""

    # quality scores came through the (gzip-compressed in slice 1) QS block
    np.testing.assert_array_equal(
        cf.qual_flat[cf.offsets[0] : cf.offsets[1]], np.arange(30, 38))
    np.testing.assert_array_equal(
        cf.qual_flat[cf.offsets[3] : cf.offsets[4]], np.arange(60, 66))
