// Fused host pileup: the per-column tally of extractCalls
// (/root/reference/extract.c:420-441) as one cache-friendly pass.
//
// Bit-equal to ops/semantics.pileup_channels (the numpy oracle): the same
// integer compares in the same per-base order, accumulated into the same
// uint32 [W, 4] channel layout (meth, unmeth, opposite-strand coverage,
// opposite-strand variants). The numpy version makes ~12 elementwise
// passes over the [N, L] window batch; this makes one, with per-thread
// private counter planes merged at the end.
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

template <typename RP>
struct Args {
  const uint8_t* seq;
  const uint8_t* qual;
  const RP* refpos;
  const int32_t* strand;
  const uint8_t* keep_base;  // nullable [n, l]
  int64_t n, l;
  const uint8_t* ref_window;
  int64_t ref_len;
  int64_t win_offset, win_start, win_end;
  int min_phred;
};

// Returns 0 on success, nonzero if a valid base indexes outside ref_window
// (caller falls back to the numpy path, which raises).
template <typename RP>
int pileup_rows(const Args<RP>& a, int64_t row_begin, int64_t row_end,
                uint32_t* counters) {
  for (int64_t i = row_begin; i < row_end; ++i) {
    const uint8_t* seq = a.seq + i * a.l;
    const uint8_t* qual = a.qual + i * a.l;
    const RP* rp = a.refpos + i * a.l;
    const uint8_t* kb = a.keep_base ? a.keep_base + i * a.l : nullptr;
    const bool odd = (a.strand[i] & 1) != 0;
    // Reference bases are ASCII; read bases are BAM 4-bit codes
    // (A=1, C=2, G=4, T=8, N=15 — updateMetrics, common.c:118-134).
    const uint8_t call_base = odd ? 'C' : 'G';
    const uint8_t meth_base = odd ? 2 : 4;
    const uint8_t unmeth_base = odd ? 8 : 1;
    const uint8_t nonvar_base = odd ? 4 : 2;
    for (int64_t j = 0; j < a.l; ++j) {
      const int64_t p = rp[j];
      if (p < a.win_start || p >= a.win_end) continue;
      if (kb && !kb[j]) continue;
      if (qual[j] < a.min_phred) continue;
      const int64_t widx = p - a.win_offset;
      if (widx < 0 || widx >= a.ref_len) return 1;
      const uint8_t refbase = a.ref_window[widx];
      uint32_t* c = counters + (p - a.win_start) * 4;
      const uint8_t b = seq[j];
      if (refbase == call_base) {
        if (b == meth_base)
          c[0]++;
        else if (b == unmeth_base)
          c[1]++;
      } else {
        c[2]++;
        if (b != nonvar_base && b != 15) c[3]++;
      }
    }
  }
  return 0;
}

template <typename RP>
int pileup_entry(const uint8_t* seq, const uint8_t* qual,
                 const RP* refpos, const int32_t* strand,
                 const uint8_t* keep_base, int64_t n, int64_t l,
                 const uint8_t* ref_window, int64_t ref_len,
                 int64_t win_offset, int64_t win_start, int64_t win_end,
                 int min_phred, uint32_t* counters, int nthreads) {
  const int64_t W = win_end - win_start;
  if (W <= 0 || n < 0 || l < 0) return 2;
  Args<RP> a{seq,     qual,    refpos,     strand,    keep_base, n, l,
         ref_window, ref_len, win_offset, win_start, win_end,   min_phred};
  if (nthreads < 1) nthreads = 1;
  const int64_t min_rows_per_thread = 8192;
  int workers = static_cast<int>(
      std::min<int64_t>(nthreads, std::max<int64_t>(n / min_rows_per_thread, 1)));
  if (workers <= 1 || n == 0) return pileup_rows(a, 0, n, counters);

  std::vector<std::vector<uint32_t>> planes(workers - 1);
  std::vector<int> rc(workers, 0);
  std::vector<std::thread> ts;
  const int64_t stride = (n + workers - 1) / workers;
  for (int t = 1; t < workers; ++t) {
    planes[t - 1].assign(static_cast<size_t>(W) * 4, 0);
    ts.emplace_back([&, t] {
      rc[t] = pileup_rows(a, t * stride, std::min<int64_t>((t + 1) * stride, n),
                          planes[t - 1].data());
    });
  }
  rc[0] = pileup_rows(a, 0, std::min<int64_t>(stride, n), counters);
  for (auto& th : ts) th.join();
  for (int t = 1; t < workers; ++t) {
    if (rc[t]) return rc[t];
    const uint32_t* src = planes[t - 1].data();
    for (int64_t k = 0; k < W * 4; ++k) counters[k] += src[k];
  }
  return rc[0];
}

}  // namespace

extern "C" {

// counters: caller-zeroed uint32 [win_end - win_start, 4]. Returns 0 on
// success; nonzero = unsupported input (caller falls back to numpy).
int mdtpu_pileup(const uint8_t* seq, const uint8_t* qual,
                 const int32_t* refpos, const int32_t* strand,
                 const uint8_t* keep_base, int64_t n, int64_t l,
                 const uint8_t* ref_window, int64_t ref_len,
                 int64_t win_offset, int64_t win_start, int64_t win_end,
                 int min_phred, uint32_t* counters, int nthreads) {
  return pileup_entry(seq, qual, refpos, strand, keep_base, n, l, ref_window,
                      ref_len, win_offset, win_start, win_end, min_phred,
                      counters, nthreads);
}

// int64-refpos twin: the decoder's refpos without the per-window astype.
int mdtpu_pileup64(const uint8_t* seq, const uint8_t* qual,
                   const int64_t* refpos, const int32_t* strand,
                   const uint8_t* keep_base, int64_t n, int64_t l,
                   const uint8_t* ref_window, int64_t ref_len,
                   int64_t win_offset, int64_t win_start, int64_t win_end,
                   int min_phred, uint32_t* counters, int nthreads) {
  return pileup_entry(seq, qual, refpos, strand, keep_base, n, l, ref_window,
                      ref_len, win_offset, win_start, win_end, min_phred,
                      counters, nthreads);
}

}  // extern "C"
