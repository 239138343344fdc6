"""Property tests: vectorized semantics vs literal per-read/per-column
transcriptions of the reference C code (the oracle)."""
import numpy as np
import pytest

from methyldackel_tpu.ops import semantics as sem
from methyldackel_tpu.utils.simulate import random_reference, simulate_batch


# ------------------------------------------------------------ oracle pieces

def oracle_get_strand(flag, xg):
    """Literal transcription of getStrand (common.c:84-116)."""
    if xg == 0:
        if flag & 0x1:
            if (flag & 0x50) == 0x50:
                return 2
            if flag & 0x40:
                return 1
            if (flag & 0x90) == 0x90:
                return 1
            if flag & 0x80:
                return 2
            return 0
        return 2 if flag & 0x10 else 1
    if xg == 1:
        if (flag & 0x51) == 0x41:
            return 1
        if (flag & 0x51) == 0x51:
            return 3
        if (flag & 0x91) == 0x81:
            return 3
        if (flag & 0x91) == 0x91:
            return 1
        if flag & 0x10:
            return 3
        return 1
    if (flag & 0x51) == 0x41:
        return 4
    if (flag & 0x51) == 0x51:
        return 2
    if (flag & 0x91) == 0x81:
        return 2
    if (flag & 0x91) == 0x91:
        return 4
    if flag & 0x10:
        return 2
    return 4


def oracle_is_cpg(seq, pos, seqlen):
    if pos >= seqlen:
        return 0
    if seq[pos] in (ord("C"), ord("c")):
        if pos + 1 == seqlen:
            return 0
        return 1 if seq[pos + 1] in (ord("G"), ord("g")) else 0
    if seq[pos] in (ord("G"), ord("g")):
        if pos == 0:
            return 0
        return -1 if seq[pos - 1] in (ord("C"), ord("c")) else 0
    return 0


def oracle_is_chg(seq, pos, seqlen):
    if pos >= seqlen:
        return 0
    if seq[pos] in (ord("C"), ord("c")):
        if pos + 2 >= seqlen:
            return 0
        return 1 if seq[pos + 2] in (ord("G"), ord("g")) else 0
    if seq[pos] in (ord("G"), ord("g")):
        if pos <= 1:
            return 0
        return -1 if seq[pos - 2] in (ord("C"), ord("c")) else 0
    return 0


def oracle_is_chh(seq, pos, seqlen):
    if pos >= seqlen:
        return 0
    if seq[pos] in (ord("C"), ord("c")):
        return 1
    if seq[pos] in (ord("G"), ord("g")):
        return -1
    return 0


def test_strand_all_flag_xg_combos():
    flags = np.arange(0, 1 << 12, dtype=np.uint16)
    for xg in (0, 1, 2):
        got = sem.strand(flags, np.full(len(flags), xg, np.int8))
        want = np.array([oracle_get_strand(int(f), xg) for f in flags], np.int8)
        np.testing.assert_array_equal(got, want)


def test_context_vs_oracle():
    rng = np.random.default_rng(0)
    # include N runs and boundary cases
    seq = rng.choice([ord(c) for c in "ACGTN"], size=300).astype(np.uint8)
    ctype, cdir = sem.classify_context(seq)
    n = len(seq)
    for i in range(n):
        d = oracle_is_cpg(seq, i, n)
        if d:
            want = (sem.CTX_CPG, d)
        else:
            d = oracle_is_chg(seq, i, n)
            if d:
                want = (sem.CTX_CHG, d)
            else:
                d = oracle_is_chh(seq, i, n)
                want = (sem.CTX_CHH, d) if d else (sem.CTX_NONE, 0)
        assert (ctype[i], cdir[i]) == want, f"pos {i} base {chr(seq[i])}"


def oracle_tweak(a_seq, a_qual, a_pos, b_seq, b_qual, b_pos, sa, sb):
    """Literal cust_tweak_overlap_quality (overlaps.c:54-119)."""
    if ((sa - sb) & 1) == 1:
        return
    na, nb = len(a_seq), len(b_seq)
    ia = ib = 0
    while ia < na and a_pos[ia] < 0:
        ia += 1
    while ib < nb and b_pos[ib] < 0:
        ib += 1
    if ia == na or ib == nb:
        return
    if a_pos[ia] < b_pos[ib]:
        while ia < na and a_pos[ia] < b_pos[ib]:
            ia += 1
    else:
        while ib < nb and b_pos[ib] < a_pos[ia]:
            ib += 1
    if ia == na or ib == nb:
        return
    while ia < na and ib < nb:
        if a_pos[ia] < b_pos[ib] or a_pos[ia] < 0:
            ia += 1
            continue
        if b_pos[ib] < a_pos[ia] or b_pos[ib] < 0:
            ib += 1
            continue
        if a_seq[ia] != b_seq[ib]:
            if a_qual[ia] > b_qual[ib] and a_seq[ia] != 15:
                a_qual[ia] = (int(a_qual[ia]) - int(b_qual[ib])) & 0xFF
                b_qual[ib] = 0
            elif b_qual[ib] > a_qual[ia] and b_seq[ib] != 15:
                b_qual[ib] = (int(b_qual[ib]) - int(a_qual[ia])) & 0xFF
                a_qual[ia] = 0
            else:
                a_qual[ia] = 0
                b_qual[ib] = 0
        else:
            if a_qual[ia] > b_qual[ib]:
                a_qual[ia] = int(int(a_qual[ia]) + 0.2 * int(a_qual[ia])) & 0xFF
                b_qual[ib] = 0
            else:
                b_qual[ib] = int(int(b_qual[ib]) + 0.2 * int(b_qual[ib])) & 0xFF
                a_qual[ia] = 0
        ia += 1
        ib += 1


def test_overlap_arbitration_vs_oracle_with_indels():
    rng = np.random.default_rng(1)
    L = 60
    for trial in range(50):
        # two overlapping reads with random gaps (-1 refpos models indels)
        def mk(start):
            rp = np.full(L, -1, np.int64)
            p = start
            i = 0
            while i < L:
                if rng.random() < 0.9:
                    rp[i] = p
                    p += 1
                    i += 1
                else:
                    if rng.random() < 0.5:
                        rp[i] = -1  # insertion/softclip base
                        i += 1
                    else:
                        p += rng.integers(1, 4)  # deletion
            return rp

        a_rp = mk(100)
        b_rp = mk(100 + int(rng.integers(0, 30)))
        a_seq = rng.choice([1, 2, 4, 8, 15], size=L).astype(np.uint8)
        b_seq = rng.choice([1, 2, 4, 8, 15], size=L).astype(np.uint8)
        a_q = rng.integers(0, 45, L).astype(np.uint8)
        b_q = rng.integers(0, 45, L).astype(np.uint8)
        sa, sb = int(rng.integers(1, 5)), int(rng.integers(1, 5))

        oa_q, ob_q = a_q.copy(), b_q.copy()
        oracle_tweak(a_seq, oa_q, a_rp, b_seq, ob_q, b_rp, sa, sb)

        seq = np.stack([a_seq, b_seq])
        qual = np.stack([a_q, b_q])
        rp = np.stack([a_rp, b_rp])
        st = np.array([sa, sb], np.int8)
        sem.arbitrate_overlaps(seq, qual, rp, st,
                               np.array([0]), np.array([1]))
        np.testing.assert_array_equal(qual[0], oa_q, err_msg=f"trial {trial} read a")
        np.testing.assert_array_equal(qual[1], ob_q, err_msg=f"trial {trial} read b")


def test_qual_boost_table_matches_c_double():
    for q in range(256):
        assert sem.QUAL_BOOST[q] == (int(q + 0.2 * q) & 0xFF)


def test_pileup_channels_vs_column_oracle():
    rng = np.random.default_rng(5)
    ref_ascii, ref_codes = random_reference(rng, 800)
    batch = simulate_batch(rng, ref_codes, n_pairs=25, read_len=50)
    st = sem.strand(batch.flag, batch.xg)
    W = 700
    got = sem.pileup_channels(batch.seq, batch.qual, batch.refpos, st,
                              np.ones(batch.seq.shape, bool), ref_ascii, 0, 0, W, 5)
    want = np.zeros((W, 4), np.uint32)
    for r in range(batch.n):
        for j in range(int(batch.l_qseq[r])):
            p = int(batch.refpos[r, j])
            if p < 0 or p >= W:
                continue
            base = int(batch.seq[r, j])
            q = int(batch.qual[r, j])
            odd = st[r] & 1
            refb = ref_ascii[p]
            calling = refb == ord("C") if odd else refb == ord("G")
            if calling:
                if q < 5:
                    continue
                if odd and base == 2 or (not odd) and base == 4:
                    want[p, 0] += 1
                elif odd and base == 8 or (not odd) and base == 1:
                    want[p, 1] += 1
            else:
                if q < 5:
                    continue
                want[p, 2] += 1
                expected = 4 if odd else 2
                if base != expected and base != 15:
                    want[p, 3] += 1
    np.testing.assert_array_equal(got, want)


def test_arbitrate_dense_matches_loop():
    """The vectorized gapless-pair arbitration must equal the per-pair
    intersect loop (itself oracle-tested vs the literal C) bit-for-bit,
    including role asymmetry, partial/zero overlap, containment, and
    incompatible-strand skips."""
    rng = np.random.default_rng(123)
    for trial in range(20):
        n_pairs = 40
        L = 24
        N = 2 * n_pairs
        lq = rng.integers(8, L + 1, N)
        start = rng.integers(0, 40, N)
        # force varied overlap: b starts near a
        start[1::2] = start[0::2] + rng.integers(-12, 13, n_pairs)
        start = np.maximum(start, 0)
        refpos = np.full((N, L), -2, np.int64)
        seq = np.zeros((N, L), np.uint8)
        qual = np.zeros((N, L), np.uint8)
        col = np.arange(L)
        for i in range(N):
            m = int(lq[i])
            refpos[i, :m] = start[i] + col[:m]
            seq[i, :m] = rng.choice([1, 2, 4, 8, 15], m, p=[.24, .24, .24, .24, .04])
            qual[i, :m] = rng.integers(0, 42, m)
        strand_arr = rng.integers(1, 5, N).astype(np.int64)
        a_idx = np.arange(0, N, 2)
        b_idx = a_idx + 1

        q_fast = qual.copy()
        sem.arbitrate_overlaps(seq, q_fast, refpos, strand_arr, a_idx, b_idx)
        q_loop = qual.copy()
        sem._arbitrate_pairs_loop(seq, q_loop, refpos, strand_arr, a_idx, b_idx)
        assert np.array_equal(q_fast, q_loop), f"trial {trial}"


def test_native_pair_mates_matches_dict_loop():
    """The native open-addressing pairing (csrc mdtpu_pair_mates) equals
    the exact khash dict walk, including same-name re-entry (3rd+4th
    occurrences), ineligible rows, and FORCED hash collisions (distinct
    names given identical hashes must still pair by name)."""
    from methyldackel_tpu.io import native
    from methyldackel_tpu.ops import semantics as sem

    if not native.available():
        import pytest
        pytest.skip("native library not built")
    names = ["a", "b", "a", "c", "b", "a", "a", "d", "d", "e"]
    flags = np.array([0x63, 0x63, 0x93, 0x63, 0x93, 0x63, 0x93,
                      0x63, 0x93, 0x4], np.uint16)
    want_a, want_b = sem._pair_mates_loop(names, flags)

    blob = b"".join(n.encode() + b"\x00" for n in names)
    off = np.cumsum([0] + [len(n) + 1 for n in names]).astype(np.int64)
    parent_idx = np.arange(len(names), dtype=np.int64)
    # identical hashes for ALL rows: forces the kernel onto its
    # name-comparison path for every probe
    hashes = np.full(len(names), 7, np.uint64)
    got = native.pair_mates(hashes, flags, blob, off, parent_idx)
    assert got is not None
    np.testing.assert_array_equal(want_a, got[0])
    np.testing.assert_array_equal(want_b, got[1])

    # distinct hashes too
    hashes2 = (np.arange(len(names), dtype=np.uint64) * 2654435761) \
        ^ np.uint64(123)
    # same-name rows must share a hash for realism (kernel doesn't require
    # it, but match the production property)
    for i, n in enumerate(names):
        hashes2[i] = hash(n) & 0xFFFFFFFFFFFFFFFF
    got2 = native.pair_mates(hashes2, flags, blob, off, parent_idx)
    np.testing.assert_array_equal(want_a, got2[0])
    np.testing.assert_array_equal(want_b, got2[1])
