// Native output-row formatter for the hot emit path.
//
// The reference writes bedGraph rows with fprintf (writeCall,
// /root/reference/extract.c:39-56); this framework batches each window's
// rows into one buffer. Formatting ~1 row/C of a mammalian genome in
// Python f-strings is a measurable share of end-to-end extract time, so
// the common integer formats are produced here: the caller passes column
// arrays and receives the concatenated ASCII lines.
//
// Byte compatibility: every column is an integer already computed by the
// caller (including the truncated percentage, which is float math the
// caller reproduces bit-for-bit); this file only does decimal rendering,
// which is base-10 exact.
#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

// Writes the decimal form of v at p, returns one past the last byte.
inline char* itoa64(char* p, int64_t v) {
  if (v < 0) {
    *p++ = '-';
    // int64 min cannot occur for genomic coordinates/counters; keep simple.
    v = -v;
  }
  char tmp[20];
  int n = 0;
  do {
    tmp[n++] = static_cast<char>('0' + (v % 10));
    v /= 10;
  } while (v);
  while (n) *p++ = tmp[--n];
  return p;
}

}  // namespace

extern "C" {

// Rows "chrom\tstart\tend\tval\tnm\tnu\n" (the default bedGraph layout,
// extract.c:48-56; also mergeContext's printRecord, mergeContext.c:23-27).
// nm/nu may be null: then rows are "chrom\tstart\tend\tval\n" (the --counts
// layout, extract.c:60-63, with val = coverage). Returns bytes written, or
// -1 if out_cap is too small.
int64_t mdtpu_format_bedgraph(const char* chrom, int64_t chrom_len,
                              const int64_t* start, const int64_t* end,
                              const int64_t* val, const int64_t* nm,
                              const int64_t* nu, int64_t n, char* out,
                              int64_t out_cap) {
  // Worst case per row: chrom + 6 separators + 5 numbers of <= 20 digits.
  if ((nm == nullptr) != (nu == nullptr)) return -1;  // both-or-neither
  const int64_t bound = chrom_len + 6 + 5 * 20;
  char* p = out;
  const char* lim = out + out_cap;
  for (int64_t i = 0; i < n; ++i) {
    if (lim - p < bound) return -1;
    std::memcpy(p, chrom, chrom_len);
    p += chrom_len;
    *p++ = '\t';
    p = itoa64(p, start[i]);
    *p++ = '\t';
    p = itoa64(p, end[i]);
    *p++ = '\t';
    p = itoa64(p, val[i]);
    if (nm) {
      *p++ = '\t';
      p = itoa64(p, nm[i]);
      *p++ = '\t';
      p = itoa64(p, nu[i]);
    }
    *p++ = '\n';
  }
  return p - out;
}

// Float-value rows "chrom\tstart\tend\t%f\n" (the --fraction / --logit
// layouts, extract.c:57-59 / 64-67; the value is precomputed by the
// caller, including logit's ±inf which %f renders as the C does).
// Returns bytes written or -1.
int64_t mdtpu_format_float_rows(const char* chrom, int64_t chrom_len,
                                const int64_t* start, const int64_t* end,
                                const double* val, int64_t n, char* out,
                                int64_t out_cap) {
  const int64_t bound = chrom_len + 4 + 2 * 20 + 348;  // %f worst case
  char* p = out;
  const char* lim = out + out_cap;
  for (int64_t i = 0; i < n; ++i) {
    if (lim - p < bound) return -1;
    std::memcpy(p, chrom, chrom_len);
    p += chrom_len;
    *p++ = '\t';
    p = itoa64(p, start[i]);
    *p++ = '\t';
    p = itoa64(p, end[i]);
    *p++ = '\t';
    p += std::snprintf(p, lim - p, "%f", val[i]);
    *p++ = '\n';
  }
  return p - out;
}

// methylKit rows "chrom.pos\tchrom\tpos\tF|R\tcov\t%6.2f\t%6.2f\n"
// (writeCall's methylKit branch, extract.c:68-92). strand_f nonzero → 'F'.
// Returns bytes written or -1.
int64_t mdtpu_format_methylkit(const char* chrom, int64_t chrom_len,
                               const int64_t* pos1, const uint8_t* strand_f,
                               const int64_t* nm, const int64_t* nu,
                               int64_t n, char* out, int64_t out_cap) {
  const int64_t bound = 2 * chrom_len + 8 + 3 * 20 + 2 * 32;
  char* p = out;
  const char* lim = out + out_cap;
  for (int64_t i = 0; i < n; ++i) {
    if (lim - p < bound) return -1;
    std::memcpy(p, chrom, chrom_len);
    p += chrom_len;
    *p++ = '.';
    p = itoa64(p, pos1[i]);
    *p++ = '\t';
    std::memcpy(p, chrom, chrom_len);
    p += chrom_len;
    *p++ = '\t';
    p = itoa64(p, pos1[i]);
    *p++ = '\t';
    *p++ = strand_f[i] ? 'F' : 'R';
    *p++ = '\t';
    const int64_t cov = nm[i] + nu[i];
    if (cov <= 0) return -1;  // zero-coverage row → caller's Python path
    p = itoa64(p, cov);
    *p++ = '\t';
    const double fc = 100.0 * static_cast<double>(nm[i]) / cov;
    const double ft = 100.0 * static_cast<double>(nu[i]) / cov;
    p += std::snprintf(p, lim - p, "%6.2f\t%6.2f", fc, ft);
    *p++ = '\n';
  }
  return p - out;
}

// Cytosine-report rows "chrom\tpos\t±\tnm\tnu\tC{G,HG,HH}\t<tri>\n"
// (writeCall's cytosine_report branch + the 25-entry trinucleotide table,
// extract.c:33-37,93-98). dir > 0 renders '+', else '-'; ctype indexes
// {CG, CHG, CHH}; tnc indexes the table. Returns bytes written or -1.
int64_t mdtpu_format_cytosine(const char* chrom, int64_t chrom_len,
                              const int64_t* pos, const int8_t* dir,
                              const int64_t* nm, const int64_t* nu,
                              const int8_t* ctype, const int8_t* tnc,
                              int64_t n, char* out, int64_t out_cap) {
  static const char* kCtx[3] = {"CG", "CHG", "CHH"};
  static const char kTri[25][4] = {
      "CAA", "CAC", "CAG", "CAT", "CAN", "CCA", "CCC", "CCG", "CCT", "CCN",
      "CGA", "CGC", "CGG", "CGT", "CGN", "CTA", "CTC", "CTG", "CTT", "CTN",
      "CNA", "CNC", "CNG", "CNT", "CNN"};
  const int64_t bound = chrom_len + 7 + 3 * 20 + 1 + 3 + 3;
  char* p = out;
  const char* lim = out + out_cap;
  for (int64_t i = 0; i < n; ++i) {
    if (lim - p < bound) return -1;
    const int t = ctype[i];
    const int x = tnc[i];
    if (t < 0 || t > 2 || x < 0 || x > 24) return -1;
    std::memcpy(p, chrom, chrom_len);
    p += chrom_len;
    *p++ = '\t';
    p = itoa64(p, pos[i]);
    *p++ = '\t';
    *p++ = dir[i] > 0 ? '+' : '-';
    *p++ = '\t';
    p = itoa64(p, nm[i]);
    *p++ = '\t';
    p = itoa64(p, nu[i]);
    *p++ = '\t';
    const char* c = kCtx[t];
    while (*c) *p++ = *c++;
    *p++ = '\t';
    std::memcpy(p, kTri[x], 3);
    p += 3;
    *p++ = '\n';
  }
  return p - out;
}

}  // extern "C"
