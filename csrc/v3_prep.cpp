// Host prep kernels for the v3 pre-gated window dispatch
// (parallel/device._fused_dispatch_v3).
//
// The v3 fast path ships phred-PRE-GATED, nibble-packed base codes to the
// device. In numpy that costs four separate [N, L] passes per window
// (gapless check, '=' check, pre-gate where(), strided nibble pack) plus a
// row gather — ~0.2 s per 100k-read window on a 2-core host, which is the
// difference between the device engine beating or losing to the host
// engine. These kernels fuse them into two multithreaded passes.
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

template <typename F>
void parallel_rows(int64_t n, int nthreads, F f) {
  if (nthreads < 1) nthreads = 1;
  size_t workers = std::min<int64_t>(nthreads, std::max<int64_t>(n, 1));
  if (workers <= 1) {
    for (int64_t i = 0; i < n; ++i) f(i);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(workers);
  for (size_t t = 0; t < workers; ++t) {
    threads.emplace_back([&, t] {
      for (int64_t i = t; i < n; i += workers) f(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Runtime-dispatched row bodies: the byte-compare loops vectorize ~3x
// better with AVX-512BW than the portable x86-64-v3 baseline the artifact
// is built for, so GCC function multi-versioning picks the best clone at
// load time without making the .so crash on older CPUs.
__attribute__((target_clones("default", "arch=x86-64-v4")))
static void pack2_row(const uint8_t* sq, const uint8_t* ql, uint8_t* out,
                      int64_t L, int64_t Lq, uint8_t mp, uint8_t meth,
                      uint8_t unmeth) {
  uint8_t v[1024];
  const int64_t L4 = Lq * 4;
  for (int64_t j = 0; j < L; ++j) {
    const uint8_t c = (ql[j] >= mp) ? sq[j] : static_cast<uint8_t>(0);
    v[j] = static_cast<uint8_t>((c == meth) + 2 * (c == unmeth));
  }
  for (int64_t j = L; j < L4; ++j) v[j] = 0;
  for (int64_t k = 0; k < Lq; ++k) {
    const uint8_t* q4 = v + 4 * k;
    out[k] = static_cast<uint8_t>(q4[0] | (q4[1] << 2) | (q4[2] << 4) |
                                  (q4[3] << 6));
  }
}


// Per-row fast-path eligibility: row r is "simple" iff its aligned
// positions are exactly pos..pos+lq-1 (single-M CIGAR: refpos[0]==pos,
// refpos[lq-1]==pos+lq-1, no negative refpos inside the read — see
// _rows_gapless) AND it contains no base code 0 ('=', the prealigned
// layout's pad sentinel — see _rows_no_eq_base). lq==0 rows are simple.
// out_simple: uint8[n] (1 = simple). The gap/'=' scan is branchless
// (accumulated OR) so the compiler vectorizes it.
int mdtpu_v3_flags(const uint8_t* seq, const int32_t* refpos,
                   const int64_t* pos, const int32_t* lq, int64_t n,
                   int64_t L, uint8_t* out_simple, int nthreads) {
  if (!seq || !refpos || !pos || !lq || !out_simple) return -1;
  parallel_rows(n, nthreads, [&](int64_t r) {
    const int64_t l = std::min<int64_t>(lq[r], L);
    if (l <= 0) {
      out_simple[r] = 1;
      return;
    }
    const int32_t* rp = refpos + r * L;
    const uint8_t* sq = seq + r * L;
    if (rp[0] != pos[r] || rp[l - 1] != pos[r] + l - 1) {
      out_simple[r] = 0;
      return;
    }
    int bad = 0;
    for (int64_t j = 0; j < l; ++j)
      bad |= (rp[j] < 0) | (sq[j] == 0);
    out_simple[r] = static_cast<uint8_t>(!bad);
  });
  return 0;
}

// int64 variant: the decoder's refpos is int64; this avoids the 70+ MB
// astype(int32) per window the int32-only entry point forces.
int mdtpu_v3_flags64(const uint8_t* seq, const int64_t* refpos,
                     const int64_t* pos, const int32_t* lq, int64_t n,
                     int64_t L, uint8_t* out_simple, int nthreads) {
  if (!seq || !refpos || !pos || !lq || !out_simple) return -1;
  parallel_rows(n, nthreads, [&](int64_t r) {
    const int64_t l = std::min<int64_t>(lq[r], L);
    if (l <= 0) {
      out_simple[r] = 1;
      return;
    }
    const int64_t* rp = refpos + r * L;
    const uint8_t* sq = seq + r * L;
    if (rp[0] != pos[r] || rp[l - 1] != pos[r] + l - 1) {
      out_simple[r] = 0;
      return;
    }
    int bad = 0;
    for (int64_t j = 0; j < l; ++j)
      bad |= (rp[j] < 0) | (sq[j] == 0);
    out_simple[r] = static_cast<uint8_t>(!bad);
  });
  return 0;
}

// Fused gather + phred pre-gate + nibble pack for the sorted fast rows:
// for output row r, source row i = src_rows[r]:
//   code[j] = qual[i][j] >= min_phred ? seq[i][j] : 0
//   seqpack[r][j/2] |= code[j] << (4 * (j & 1))     (lo nibble = even j)
//   pos_p[r] = pos[i] - win_start;  parity_p[r] = strand[i] & 1
// seqpack is [nf_cap, Lh] and MUST be zero-initialized by the caller
// (rows >= nf stay zero = padding).
int mdtpu_v3_pack(const uint8_t* seq, const uint8_t* qual,
                  const int64_t* src_rows, const int64_t* pos,
                  const int32_t* strand, int64_t nf, int64_t L, int64_t Lh,
                  int64_t win_start, int min_phred, uint8_t* seqpack,
                  int32_t* pos_p, uint8_t* parity_p, int nthreads) {
  if (!seq || !qual || !src_rows || !pos || !strand || !seqpack || !pos_p ||
      !parity_p)
    return -1;
  if (L > 1024) return -2;  // row temp width; caller falls back
  const uint8_t mp = static_cast<uint8_t>(
      std::max(0, std::min(255, min_phred)));
  parallel_rows(nf, nthreads, [&](int64_t r) {
    const int64_t i = src_rows[r];
    const uint8_t* sq = seq + i * L;
    const uint8_t* ql = qual + i * L;
    uint8_t* out = seqpack + r * Lh;
    // pass 1 (vectorized): branchless phred gate
    uint8_t v[1024];
    if (L > 1024) return;  // unreachable: entry returns -2 first
    for (int64_t j = 0; j < L; ++j)
      v[j] = (ql[j] >= mp) ? sq[j] : static_cast<uint8_t>(0);
    const int64_t pairs = L / 2;
    for (int64_t j = 0; j < pairs; ++j)
      out[j] = static_cast<uint8_t>(v[2 * j] | (v[2 * j + 1] << 4));
    if (L & 1) out[pairs] = v[L - 1];
    pos_p[r] = static_cast<int32_t>(pos[i] - win_start);
    parity_p[r] = static_cast<uint8_t>(strand[i] & 1);
  });
  return 0;
}

// 2-bit SEMANTIC pack for the default (meth/unmeth-only) windows: per
// source row i with parity p = strand[i] & 1, the strand's methylated
// base is C (code 2) on odd rows / G (code 4) on even rows and the
// unmethylated base is T (8) / A (1). Each pre-gated base maps to
//   1 = meth base, 2 = unmeth base, 0 = everything else
// and packs 4 codes/byte (code j in bits 2*(j&3)). seqpack2 is
// [nf_cap, ceil(L/4)], zero-initialized by the caller.
int mdtpu_v3_pack2(const uint8_t* seq, const uint8_t* qual,
                   const int64_t* src_rows, const int64_t* pos,
                   const int32_t* strand, int64_t nf, int64_t L, int64_t Lq,
                   int64_t win_start, int min_phred, uint8_t* seqpack,
                   int32_t* pos_p, uint8_t* parity_p, int nthreads) {
  if (!seq || !qual || !src_rows || !pos || !strand || !seqpack || !pos_p ||
      !parity_p)
    return -1;
  if (Lq * 4 > 1024) return -2;  // row temp width; caller falls back
  const uint8_t mp = static_cast<uint8_t>(
      std::max(0, std::min(255, min_phred)));
  parallel_rows(nf, nthreads, [&](int64_t r) {
    const int64_t i = src_rows[r];
    const uint8_t* sq = seq + i * L;
    const uint8_t* ql = qual + i * L;
    const int p = strand[i] & 1;
    const uint8_t meth = p ? 2 : 4;    // C : G
    const uint8_t unmeth = p ? 8 : 1;  // T : A
    uint8_t* out = seqpack + r * Lq;
    pack2_row(sq, ql, out, L, Lq, mp, meth, unmeth);
    pos_p[r] = static_cast<int32_t>(pos[i] - win_start);
    parity_p[r] = static_cast<uint8_t>(p);
  });
  return 0;
}

// Reference candidate bitmaps for the v3 2-bit program: bit i of the
// output (np.packbits order: MSB-first within each byte) says whether
// window position i has reference base 'C' (out_c) / 'G' (out_g), where
// the window/ref frame shift woff_rel is applied here:
//   rbw[i] = (0 <= i - woff_rel < ref_len) ? ref[i - woff_rel] : 0
// Replaces an ~9 ms/window numpy where+clip+gather+packbits chain.
int mdtpu_v3_refbits(const uint8_t* ref, int64_t ref_len, int64_t woff_rel,
                     int64_t wpad, uint8_t* out_c, uint8_t* out_g) {
  if (!ref || !out_c || !out_g || wpad % 8) return -1;
  for (int64_t b = 0; b < wpad / 8; ++b) {
    uint8_t bc = 0, bg = 0;
    const int64_t base = 8 * b;
    for (int k = 0; k < 8; ++k) {
      const int64_t idx = base + k - woff_rel;
      const uint8_t c =
          (idx >= 0 && idx < ref_len) ? ref[idx] : static_cast<uint8_t>(0);
      bc = static_cast<uint8_t>(bc | ((c == 'C') << (7 - k)));
      bg = static_cast<uint8_t>(bg | ((c == 'G') << (7 - k)));
    }
    out_c[b] = bc;
    out_g[b] = bg;
  }
  return 0;
}

// Candidate mask + prefix sums + index list for the candidate-space pack:
// position i is a candidate iff its CTX-selected reference context
// matches (bit 0 = CpG, 1 = CHG, 2 = CHH; 7 = every C/G), where guard
// positions (i < 2 or i >= wpad - 8) keep the full C|G rule — their
// context can depend on reference bases outside the bitmap domain. MUST
// stay bit-for-bit identical to parallel/device._ctx_mask_np for the
// single-window case (period == data == wpad); tests/test_candspace.py
// pins the twin. isc/isg are np.packbits-order (MSB-first) bitmaps.
// out_cand: int64 capacity >= wpad; out_csum: int32[wpad + 1]. Returns
// the candidate count, or -1 on bad args.
int64_t mdtpu_v3_candidates(const uint8_t* isc, const uint8_t* isg,
                            int64_t wpad, int ctx, int64_t* out_cand,
                            int32_t* out_csum) {
  if (!isc || !isg || !out_cand || !out_csum || wpad % 8) return -1;
  auto bit = [](const uint8_t* b, int64_t i) -> int {
    return (b[i >> 3] >> (7 - (i & 7))) & 1;
  };
  int64_t c = 0;
  out_csum[0] = 0;
  for (int64_t i = 0; i < wpad; ++i) {
    const int cb = bit(isc, i), gb = bit(isg, i);
    int m;
    if (ctx == 7 || i < 2 || i >= wpad - 8) {
      m = cb | gb;
    } else {
      const int g1 = bit(isg, i + 1), g2 = bit(isg, i + 2);
      const int c1 = bit(isc, i - 1), c2 = bit(isc, i - 2);
      m = 0;
      if (ctx & 1) m |= (cb & g1) | (gb & c1);
      if (ctx & 2) m |= (cb & ~g1 & g2) | (gb & ~c1 & c2);
      if (ctx & 4) m |= (cb & ~g1 & ~g2) | (gb & ~c1 & ~c2);
      m &= 1;
    }
    if (m) out_cand[c++] = i;
    out_csum[i + 1] = static_cast<int32_t>(c);
  }
  return c;
}

// Candidate-SPACE 2-bit pack (round-5 wire shrink for the group window
// program): instead of packing a read's full L bases into window
// coordinates, emit ONLY the bases sitting on candidate reference
// positions (the CTX-enabled context set the emit path can ever read,
// _ctx_mask_np), indexed by candidate SLOT. Row r covers slots
// [csum[fp0], csum[fp1]) where fp0/fp1 clamp [pos-win_start,
// pos-win_start+L) to [0, wpad]; slot j's base offset within the read is
// cand[s0+j] - f_pos (provably in [0, L)). Same 2-bit semantic codes as
// mdtpu_v3_pack2 (1 = the strand's methylated base, 2 = unmethylated,
// 0 = other/gated); seqpack rows are Lq bytes = 4*Lq slots and MUST be
// zero-initialized by the caller. pos_p gets the GLOBAL slot coordinate
// s0 + slot0 (slot0 = the window's offset in the group's candidate
// coordinate space). The caller pre-checks that no row exceeds 4*Lq
// candidates; the clamp here is defensive only.
int mdtpu_v3_pack2_cand(const uint8_t* seq, const uint8_t* qual,
                        const int64_t* src_rows, const int64_t* pos,
                        const int32_t* strand, int64_t nf, int64_t L,
                        int64_t Lq, int64_t win_start, int min_phred,
                        const int64_t* cand, const int32_t* csum,
                        int64_t wpad, int64_t slot0, uint8_t* seqpack,
                        int32_t* pos_p, uint8_t* parity_p, int nthreads) {
  if (!seq || !qual || !src_rows || !pos || !strand || !cand || !csum ||
      !seqpack || !pos_p || !parity_p)
    return -1;
  if (Lq * 4 > 1024) return -2;
  const uint8_t mp =
      static_cast<uint8_t>(std::max(0, std::min(255, min_phred)));
  const int64_t L4 = Lq * 4;
  parallel_rows(nf, nthreads, [&](int64_t r) {
    const int64_t i = src_rows[r];
    const uint8_t* sq = seq + i * L;
    const uint8_t* ql = qual + i * L;
    const int p = strand[i] & 1;
    const uint8_t meth = p ? 2 : 4;    // C : G
    const uint8_t unmeth = p ? 8 : 1;  // T : A
    const int64_t f_pos = pos[i] - win_start;
    const int64_t fp0 = std::max<int64_t>(0, std::min(f_pos, wpad));
    const int64_t fp1 = std::max<int64_t>(0, std::min(f_pos + L, wpad));
    const int64_t s0 = csum[fp0];
    int64_t cnt = csum[fp1] - s0;
    if (cnt > L4) cnt = L4;
    uint8_t v[1024];
    for (int64_t j = 0; j < cnt; ++j) {
      const int64_t off = cand[s0 + j] - f_pos;
      const uint8_t c = (ql[off] >= mp) ? sq[off] : static_cast<uint8_t>(0);
      v[j] = static_cast<uint8_t>((c == meth) + 2 * (c == unmeth));
    }
    for (int64_t j = cnt; j < L4; ++j) v[j] = 0;
    uint8_t* out = seqpack + r * Lq;
    for (int64_t k = 0; k < Lq; ++k) {
      const uint8_t* q4 = v + 4 * k;
      out[k] = static_cast<uint8_t>(q4[0] | (q4[1] << 2) | (q4[2] << 4) |
                                    (q4[3] << 6));
    }
    pos_p[r] = static_cast<int32_t>(s0 + slot0);
    parity_p[r] = static_cast<uint8_t>(p);
  });
  return 0;
}

// perRead v3 pack (engine/perread.py device path): per gapless source row
// i = src_rows[r], emit 2-bit TALLY codes per read cycle j < lq:
//   1 = methylated call, 2 = unmethylated call, 0 = no call
// where the call at cycle j is: d = dir[pos+j-seq_start] (CpG direction,
// +1 = C-of-CpG, -1 = G-of-CpG, 0 = none; 0 outside [0, seq_len)),
// top = (d==+1 && odd strand), bot = (d==-1 && even strand), and
// meth = top&&base==C(2) || bot&&base==G(4); unmeth = top&&base==T(8) ||
// bot&&base==A(1) (processRead, perRead.c:64-92). Rows containing ANY
// sub-phred base within lq are flagged in out_haslow (1) — their codes are
// garbage wrt the low-qual skip quirk (perRead.c:59-63) and the caller
// must recompute them with the exact host walker. seqpack is
// [nf_cap, Lq] and MUST be zero-initialized by the caller.
int mdtpu_perread_pack(const uint8_t* seq, const uint8_t* qual,
                       const int64_t* src_rows, const int64_t* pos,
                       const int32_t* lq, const int32_t* strand,
                       const int8_t* dir, int64_t seq_len, int64_t seq_start,
                       int64_t nf, int64_t L, int64_t Lq, int min_phred,
                       uint8_t* seqpack, uint8_t* out_haslow, int nthreads) {
  if (!seq || !qual || !src_rows || !pos || !lq || !strand || !dir ||
      !seqpack || !out_haslow)
    return -1;
  if (Lq * 4 > 1024) return -2;  // row temp width; caller falls back
  const uint8_t mp =
      static_cast<uint8_t>(std::max(0, std::min(255, min_phred)));
  parallel_rows(nf, nthreads, [&](int64_t r) {
    const int64_t i = src_rows[r];
    const uint8_t* sq = seq + i * L;
    const uint8_t* ql = qual + i * L;
    const bool odd = (strand[i] & 1) != 0;
    const int64_t l = std::min<int64_t>(lq[i], L);
    uint8_t* out = seqpack + r * Lq;
    uint8_t v[1024];
    const int64_t L4 = Lq * 4;
    if (L4 > 1024) return;
    int haslow = 0;
    const int64_t base0 = pos[i] - seq_start;
    for (int64_t j = 0; j < l; ++j) {
      haslow |= ql[j] < mp;
      const int64_t w = base0 + j;
      const int8_t d = (w >= 0 && w < seq_len) ? dir[w] : 0;
      const bool top = d == 1 && odd;
      const bool bot = d == -1 && !odd;
      const uint8_t b = sq[j];
      const uint8_t meth = (top && b == 2) || (bot && b == 4);
      const uint8_t unmeth = (top && b == 8) || (bot && b == 1);
      v[j] = static_cast<uint8_t>(meth + 2 * unmeth);
    }
    for (int64_t j = l; j < L4; ++j) v[j] = 0;
    for (int64_t k = 0; k < Lq; ++k) {
      const uint8_t* q4 = v + 4 * k;
      out[k] = static_cast<uint8_t>(q4[0] | (q4[1] << 2) | (q4[2] << 4) |
                                    (q4[3] << 6));
    }
    out_haslow[r] = static_cast<uint8_t>(haslow != 0);
  });
  return 0;
}

// mbias v3 pack (engine/mbias.py device path): per gapless source row
// i = src_rows[r] emit 2-bit codes per read cycle j < lq:
//   1 = methylated call, 2 = unmethylated call, 0 = no call
// with extractMBias's gating (MBias.c:180-214): qual >= minPhred, the
// window bounds win_start <= pos+j < win_end, the per-position
// context/calling masks ok_odd/ok_even[pos+j-win_offset] (precomputed:
// cdir==+1/-1 AND kept context — the isCpG/isCHG/isCHH + strand-side
// check), and the strand's meth/unmeth base pair (C/T on odd = OT/CTOT
// rows, G/A on even). out_combo[r] = (strand-1)*2 + read#2 indexes the
// [4 strands, 2 reads] counter planes. seqpack zero-init by caller.
int mdtpu_mbias_pack(const uint8_t* seq, const uint8_t* qual,
                     const int64_t* src_rows, const int64_t* pos,
                     const int32_t* lq, const int32_t* strand,
                     const uint16_t* flag, const uint8_t* ok_odd,
                     const uint8_t* ok_even, int64_t wlen,
                     int64_t win_offset, int64_t win_start, int64_t win_end,
                     int64_t nf, int64_t L, int64_t Lq, int min_phred,
                     uint8_t* seqpack, uint8_t* out_combo, int nthreads) {
  if (!seq || !qual || !src_rows || !pos || !lq || !strand || !flag ||
      !ok_odd || !ok_even || !seqpack || !out_combo)
    return -1;
  if (Lq * 4 > 1024) return -2;  // row temp width; caller falls back
  const uint8_t mp =
      static_cast<uint8_t>(std::max(0, std::min(255, min_phred)));
  parallel_rows(nf, nthreads, [&](int64_t r) {
    const int64_t i = src_rows[r];
    const uint8_t* sq = seq + i * L;
    const uint8_t* ql = qual + i * L;
    const int par = strand[i] & 1;
    const uint8_t meth = par ? 2 : 4;    // C : G
    const uint8_t unmeth = par ? 8 : 1;  // T : A
    const uint8_t* ok = par ? ok_odd : ok_even;
    const int64_t l = std::min<int64_t>(lq[i], L);
    uint8_t* out = seqpack + r * Lq;
    uint8_t v[1024];
    const int64_t L4 = Lq * 4;
    if (L4 > 1024) return;
    const int64_t p0 = pos[i];
    for (int64_t j = 0; j < l; ++j) {
      const int64_t p = p0 + j;
      const int64_t w = p - win_offset;
      const bool valid = p >= win_start && p < win_end && w >= 0 && w < wlen;
      const uint8_t c =
          (valid && ql[j] >= mp && ok[w]) ? sq[j] : static_cast<uint8_t>(0);
      v[j] = static_cast<uint8_t>((c == meth) + 2 * (c == unmeth));
    }
    for (int64_t j = l; j < L4; ++j) v[j] = 0;
    for (int64_t k = 0; k < Lq; ++k) {
      const uint8_t* q4 = v + 4 * k;
      out[k] = static_cast<uint8_t>(q4[0] | (q4[1] << 2) | (q4[2] << 4) |
                                    (q4[3] << 6));
    }
    out_combo[r] = static_cast<uint8_t>(
        (strand[i] - 1) * 2 + ((flag[i] & 0x80) ? 1 : 0));
  });
  return 0;
}

// Exact khash mate pairing (custom_overlap_constructor, overlaps.c:121-139):
// reads arrive in position-sorted order; the first eligible occurrence of a
// NAME is stored, the second pops it as a pair (3rd re-enters, pairs with a
// 4th, ...). Eligibility: (flag & 1) && !(flag & 12). Open-addressing table
// keyed by the caller's 64-bit name hash with byte-exact name comparison on
// every probe — hash collisions are handled like the dict they'd be in C,
// so no fallback path is ever needed. Names live NUL-terminated in `blob`
// at blob[off[p] .. off[p+1]-1] for parent row p = parent_idx[i].
// Returns the number of pairs (out_a/out_b get LOCAL row indices in pop
// order), or -1 on bad input.
int64_t mdtpu_pair_mates(const uint64_t* hash, const uint16_t* flag,
                         const uint8_t* blob, const int64_t* off,
                         const int64_t* parent_idx, int64_t nk,
                         int64_t* out_a, int64_t* out_b) {
  if (!hash || !flag || !blob || !off || !parent_idx || !out_a || !out_b)
    return -1;
  uint64_t cap = 16;
  while (cap < static_cast<uint64_t>(2 * nk)) cap <<= 1;
  const uint64_t mask = cap - 1;
  std::vector<int64_t> slots(cap, -1);  // -1 empty, -2 tombstone
  int64_t np = 0;
  for (int64_t i = 0; i < nk; ++i) {
    const uint16_t f = flag[i];
    if (!(f & 0x1) || (f & 12)) continue;
    const uint64_t h = hash[i];
    const int64_t p_i = parent_idx[i];
    const uint8_t* name_i = blob + off[p_i];
    const int64_t len_i = off[p_i + 1] - off[p_i];
    uint64_t s = h & mask;
    int64_t first_free = -1;
    for (;;) {
      const int64_t j = slots[s];
      if (j == -1) {
        slots[first_free >= 0 ? first_free : s] = i;
        break;
      }
      if (j == -2) {
        if (first_free < 0) first_free = static_cast<int64_t>(s);
      } else {
        const int64_t p_j = parent_idx[j];
        const int64_t len_j = off[p_j + 1] - off[p_j];
        if (len_j == len_i &&
            std::memcmp(blob + off[p_j], name_i, len_i) == 0) {
          out_a[np] = j;
          out_b[np] = i;
          ++np;
          slots[s] = -2;  // pop
          break;
        }
      }
      s = (s + 1) & mask;
    }
  }
  return np;
}

}  // extern "C"
