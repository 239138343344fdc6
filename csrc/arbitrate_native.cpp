// Fused host mate-overlap arbitration: cust_tweak_overlap_quality
// (/root/reference/overlaps.c:54-119) for gapless mate pairs.
//
// Bit-equal to ops/semantics._arbitrate_gapless_dense (the numpy oracle;
// parity-tested): per shared reference position, differing bases award the
// higher-qual non-N base its qual minus the other's and zero the loser
// (N or tie zeroes both); agreeing bases boost the winner's qual by 20%
// through the uint8 table and zero the loser, ties going to mate b (the
// C's else branch, overlaps.c:95-103). Both sides read the pre-update
// quals. Pairs whose mates are not both gapless single-run alignments are
// reported back for the exact per-pair Python fallback; strand-incompatible
// pairs are skipped outright (both paths do).
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// floor(q + 0.2*q) & 0xFF via double math — the C's table (overlaps.c).
const uint8_t* boost_table() {
  static uint8_t tab[256];
  static bool init = [] {
    for (int q = 0; q < 256; ++q)
      tab[q] = static_cast<uint8_t>(
          static_cast<int>(static_cast<double>(q) + 0.2 * q) & 0xFF);
    return true;
  }();
  (void)init;
  return tab;
}

// Matches the gapless predicate in ops/semantics.arbitrate_overlaps:
// start >= 0, valid positions form an exact prefix, and refpos == start+col
// on that prefix. Returns nvalid, or -1 if not gapless.
template <typename RP>
int64_t gapless_nvalid(const RP* rp, int64_t l) {
  if (l == 0) return 0;
  const RP start = rp[0];
  if (start < 0) return -1;
  int64_t j = 0;
  while (j < l && rp[j] >= 0) {
    if (rp[j] != start + j) return -1;
    ++j;
  }
  const int64_t nvalid = j;
  for (; j < l; ++j)
    if (rp[j] >= 0) return -1;
  return nvalid;
}

template <typename RP>
int64_t arbitrate_impl(const uint8_t* seq, uint8_t* qual, const RP* refpos,
                       const int32_t* strand, int64_t n, int64_t l,
                       const int64_t* a_idx, const int64_t* b_idx, int64_t p,
                       int64_t* fallback);

template <typename RP>
int arbitrate2_impl(const uint8_t*, uint8_t*, const RP*, const int32_t*,
                    const int32_t*, const uint8_t*, int64_t, int64_t,
                    const int64_t*, const int64_t*, int64_t, uint8_t*, int);

}  // namespace

extern "C" {

// Returns the number of pairs written to `fallback` (indices into
// a_idx/b_idx that need the exact per-pair path), or -1 on bad input.
int64_t mdtpu_arbitrate(const uint8_t* seq, uint8_t* qual,
                        const int32_t* refpos, const int32_t* strand,
                        int64_t n, int64_t l, const int64_t* a_idx,
                        const int64_t* b_idx, int64_t p, int64_t* fallback) {
  return arbitrate_impl(seq, qual, refpos, strand, n, l, a_idx, b_idx, p,
                        fallback);
}

// int64-refpos twin: lets callers pass the decoder's refpos without the
// ~70 MB/window astype(int32).
int64_t mdtpu_arbitrate64(const uint8_t* seq, uint8_t* qual,
                          const int64_t* refpos, const int32_t* strand,
                          int64_t n, int64_t l, const int64_t* a_idx,
                          const int64_t* b_idx, int64_t p,
                          int64_t* fallback) {
  return arbitrate_impl(seq, qual, refpos, strand, n, l, a_idx, b_idx, p,
                        fallback);
}

// v2 entry: takes the caller's per-row gapless flags (the v3 fast-path
// split already computed them) so the two O(L) refpos scans per pair are
// skipped for simple×simple pairs, and runs pairs on `nthreads` threads
// (each row belongs to at most one pair — the khash pops pairs — so the
// per-pair qual rewrites touch disjoint rows). fb_flags: uint8[p], set to
// 1 for pairs needing the exact per-pair fallback. Returns 0 or -1.
int mdtpu_arbitrate2(const uint8_t* seq, uint8_t* qual,
                     const int64_t* refpos, const int32_t* strand,
                     const int32_t* lq, const uint8_t* simple, int64_t n,
                     int64_t l, const int64_t* a_idx, const int64_t* b_idx,
                     int64_t p, uint8_t* fb_flags, int nthreads) {
  return arbitrate2_impl(seq, qual, refpos, strand, lq, simple, n, l, a_idx,
                         b_idx, p, fb_flags, nthreads);
}

// int32-refpos twin (the BAM decoder's window batches are int32)
int mdtpu_arbitrate2_32(const uint8_t* seq, uint8_t* qual,
                        const int32_t* refpos, const int32_t* strand,
                        const int32_t* lq, const uint8_t* simple, int64_t n,
                        int64_t l, const int64_t* a_idx,
                        const int64_t* b_idx, int64_t p, uint8_t* fb_flags,
                        int nthreads) {
  return arbitrate2_impl(seq, qual, refpos, strand, lq, simple, n, l, a_idx,
                         b_idx, p, fb_flags, nthreads);
}

}  // extern "C"

namespace {

template <typename RP>
int arbitrate2_impl(const uint8_t* seq, uint8_t* qual,
                    const RP* refpos, const int32_t* strand,
                    const int32_t* lq, const uint8_t* simple, int64_t n,
                    int64_t l, const int64_t* a_idx, const int64_t* b_idx,
                    int64_t p, uint8_t* fb_flags, int nthreads) {
  if (l < 0 || n < 0 || p < 0 || !simple || !lq || !fb_flags) return -1;
  const uint8_t* boost = boost_table();
  if (nthreads < 1) nthreads = 1;
  size_t workers = std::min<int64_t>(nthreads, std::max<int64_t>(p, 1));
  std::vector<int> bad(workers, 0);
  auto run = [&](size_t t) {
    std::vector<uint8_t> qa_orig(l), qb_orig(l);
    for (int64_t i = t; i < p; i += workers) {
      fb_flags[i] = 0;
      const int64_t a = a_idx[i], b = b_idx[i];
      if (a < 0 || a >= n || b < 0 || b >= n) {
        bad[t] = 1;
        return;
      }
      if (((strand[a] - strand[b]) & 1) != 0) continue;
      const RP* rp_a = refpos + a * l;
      const RP* rp_b = refpos + b * l;
      int64_t nv_a, nv_b;
      if (simple[a]) {
        nv_a = std::min<int64_t>(lq[a], l);
      } else {
        nv_a = gapless_nvalid(rp_a, l);
      }
      if (simple[b]) {
        nv_b = std::min<int64_t>(lq[b], l);
      } else {
        nv_b = gapless_nvalid(rp_b, l);
      }
      if (nv_a < 0 || nv_b < 0) {
        fb_flags[i] = 1;
        continue;
      }
      const int64_t d =
          (nv_b ? rp_b[0] : 0) - (nv_a ? rp_a[0] : 0);
      uint8_t* qa = qual + a * l;
      uint8_t* qb = qual + b * l;
      const uint8_t* sa = seq + a * l;
      const uint8_t* sb = seq + b * l;
      const int64_t jlo = d > 0 ? d : 0;
      const int64_t jhi = nv_a < nv_b + d ? nv_a : nv_b + d;
      if (jlo >= jhi) continue;
      std::memcpy(qa_orig.data() + jlo, qa + jlo, jhi - jlo);
      const int64_t olo = jlo - d, ohi = jhi - d;
      std::memcpy(qb_orig.data() + olo, qb + olo, ohi - olo);
      for (int64_t j = jlo; j < jhi; ++j) {
        const int64_t jo = j - d;
        const uint8_t ba = sa[j], bb = sb[jo];
        const int va = qa_orig[j], vb = qb_orig[jo];
        if (ba != bb) {
          if (va > vb && ba != 15) {
            qa[j] = static_cast<uint8_t>(va - vb);
            qb[jo] = 0;
          } else if (vb > va && bb != 15) {
            qa[j] = 0;
            qb[jo] = static_cast<uint8_t>(vb - va);
          } else {
            qa[j] = 0;
            qb[jo] = 0;
          }
        } else if (va > vb) {
          qa[j] = boost[va];
          qb[jo] = 0;
        } else {
          qa[j] = 0;
          qb[jo] = boost[vb];
        }
      }
    }
  };
  if (workers <= 1) {
    run(0);
  } else {
    std::vector<std::thread> ts;
    for (size_t t = 0; t < workers; ++t) ts.emplace_back(run, t);
    for (auto& th : ts) th.join();
  }
  for (size_t t = 0; t < workers; ++t)
    if (bad[t]) return -1;
  return 0;
}


template <typename RP>
int64_t arbitrate_impl(const uint8_t* seq, uint8_t* qual, const RP* refpos,
                       const int32_t* strand, int64_t n, int64_t l,
                       const int64_t* a_idx, const int64_t* b_idx, int64_t p,
                       int64_t* fallback) {
  if (l < 0 || n < 0 || p < 0) return -1;
  const uint8_t* boost = boost_table();
  std::vector<uint8_t> qa_orig(l), qb_orig(l);
  int64_t nfb = 0;
  for (int64_t i = 0; i < p; ++i) {
    const int64_t a = a_idx[i], b = b_idx[i];
    if (a < 0 || a >= n || b < 0 || b >= n) return -1;
    if (((strand[a] - strand[b]) & 1) != 0) continue;
    const RP* rp_a = refpos + a * l;
    const RP* rp_b = refpos + b * l;
    const int64_t nv_a = gapless_nvalid(rp_a, l);
    const int64_t nv_b = gapless_nvalid(rp_b, l);
    if (nv_a < 0 || nv_b < 0) {
      fallback[nfb++] = i;
      continue;
    }
    const int64_t d = static_cast<int64_t>(rp_b[0]) - rp_a[0];
    uint8_t* qa = qual + a * l;
    uint8_t* qb = qual + b * l;
    const uint8_t* sa = seq + a * l;
    const uint8_t* sb = seq + b * l;
    std::memcpy(qa_orig.data(), qa, l);
    std::memcpy(qb_orig.data(), qb, l);
    // Overlapped a-columns j: 0<=j<nv_a and 0<=j-d<nv_b.
    const int64_t jlo = d > 0 ? d : 0;
    const int64_t jhi = nv_a < nv_b + d ? nv_a : nv_b + d;
    for (int64_t j = jlo; j < jhi; ++j) {
      const int64_t jo = j - d;
      const uint8_t ba = sa[j], bb = sb[jo];
      const int va = qa_orig[j], vb = qb_orig[jo];
      if (ba != bb) {
        if (va > vb && ba != 15) {
          qa[j] = static_cast<uint8_t>(va - vb);
          qb[jo] = 0;
        } else if (vb > va && bb != 15) {
          qa[j] = 0;
          qb[jo] = static_cast<uint8_t>(vb - va);
        } else {
          qa[j] = 0;
          qb[jo] = 0;
        }
      } else if (va > vb) {
        qa[j] = boost[va];
        qb[jo] = 0;
      } else {
        qa[j] = 0;
        qb[jo] = boost[vb];
      }
    }
  }
  return nfb;
}

}  // namespace
