"""BAI (BAM index) parsing.

The reference loads (or builds) the BAI for every worker's region iterator
(extract.c:291, sam_index_load). This engine decodes the BAM once and serves
window queries from memory, so the BAI is not on the hot path; it is parsed
for validation/parity (presence check mirrors extract.c:1048-1057) and to
support future streaming fetches on huge inputs.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass
class BaiRef:
    bins: dict  # bin_id -> list[(chunk_beg, chunk_end)] virtual offsets
    intervals: list  # 16kb linear index of virtual offsets


class BaiFile:
    def __init__(self, path: str):
        with open(path, "rb") as fh:
            data = fh.read()
        if data[:4] != b"BAI\x01":
            raise ValueError(f"{path} is not a BAI index")
        (n_ref,) = struct.unpack_from("<i", data, 4)
        p = 8
        self.refs: list[BaiRef] = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", data, p)
            p += 4
            bins = {}
            for _ in range(n_bin):
                bin_id, n_chunk = struct.unpack_from("<Ii", data, p)
                p += 8
                chunks = []
                for _ in range(n_chunk):
                    beg, end = struct.unpack_from("<QQ", data, p)
                    p += 16
                    chunks.append((beg, end))
                bins[bin_id] = chunks
            (n_intv,) = struct.unpack_from("<i", data, p)
            p += 4
            intervals = list(struct.unpack_from(f"<{n_intv}Q", data, p))
            p += 8 * n_intv
            self.refs.append(BaiRef(bins, intervals))

    def min_voffset(self, tid: int, start: int) -> int:
        """Smallest virtual offset that may contain reads at/after `start`."""
        ref = self.refs[tid]
        win = start >> 14
        for v in ref.intervals[win:]:
            if v:
                return v
        return 0


def reg2bins(beg: int, end: int) -> list[int]:
    """UCSC binning scheme: all bins overlapping [beg, end)."""
    end -= 1
    bins = [0]
    for shift, base in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        bins.extend(range(base + (beg >> shift), base + (end >> shift) + 1))
    return bins
