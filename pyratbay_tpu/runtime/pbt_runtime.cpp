// Native runtime: high-throughput line-list parsing and TLI scanning.
//
// The TPU compute path is JAX/XLA; this library covers the host-side
// IO hot paths (the analog of the reference's native layer, which is
// compute): multithreaded fixed-record HITRAN .par parsing and ranged
// binary extraction from TLI files.  Exposed through a C ABI consumed
// via ctypes (pyratbay_tpu/runtime/__init__.py).
//
// Build: make -C pyratbay_tpu/runtime  (or auto-built on first use).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

// Parse a fixed-width fortran-style float field (may contain leading
// blanks, embedded exponent, or be all blanks -> 0).
inline double parse_field(const char* p, int width) {
    char buf[32];
    int n = width < 31 ? width : 31;
    std::memcpy(buf, p, n);
    buf[n] = '\0';
    return std::strtod(buf, nullptr);
}

inline int iso_code(char c) {
    // HITRAN isotopologue column: 1-9, 0 -> 10th, A/B -> 11th/12th.
    if (c >= '1' && c <= '9') return c - '1';
    if (c == '0') return 9;
    if (c >= 'A' && c <= 'Z') return 10 + (c - 'A');
    return -1;
}

}  // namespace

extern "C" {

// Parse nrec HITRAN .par records of length recsize from `data`.
// Outputs: wn, a21 (Einstein A), g2 (upper-state weight), elow, iso.
// Column layout per HITRAN 2004+ 160-char format.
// Returns 0 on success.
int parse_hitran_par(
        const char* data, int64_t nrec, int32_t recsize,
        double* wn, double* a21, double* g2, double* elow, int32_t* iso,
        int32_t nthreads) {
    if (nthreads < 1) nthreads = 1;
    int64_t chunk = (nrec + nthreads - 1) / nthreads;
    std::vector<std::thread> workers;
    for (int t = 0; t < nthreads; t++) {
        int64_t lo = t * chunk;
        int64_t hi = std::min(nrec, lo + chunk);
        if (lo >= hi) break;
        workers.emplace_back([=]() {
            for (int64_t i = lo; i < hi; i++) {
                const char* rec = data + i * recsize;
                iso[i] = iso_code(rec[2]);
                wn[i] = parse_field(rec + 3, 12);
                a21[i] = parse_field(rec + 25, 10);
                elow[i] = parse_field(rec + 45, 10);
                g2[i] = parse_field(rec + 146, 7);
            }
        });
    }
    for (auto& w : workers) w.join();
    return 0;
}

// Binary search over a sorted double array: first index with
// values[i] >= target (lower bound).
int64_t lower_bound_f64(const double* values, int64_t n, double target) {
    return std::lower_bound(values, values + n, target) - values;
}

// Extract the [wn_low, wn_high] slice of a per-isotope-sorted TLI
// transition block.  For each isotope segment (sorted by wavenumber),
// binary-search the range and copy the surviving records.
// seg_counts: [nseg] per-isotope transition counts.
// Returns the number of transitions kept.
int64_t tli_extract_range(
        const double* wn, const int16_t* iso, const double* elow,
        const double* gf,
        const int32_t* seg_counts, int32_t nseg,
        double wn_low, double wn_high,
        double* out_wn, int16_t* out_iso, double* out_elow,
        double* out_gf) {
    int64_t start = 0;
    int64_t kept = 0;
    for (int32_t s = 0; s < nseg; s++) {
        int64_t count = seg_counts[s];
        const double* seg_wn = wn + start;
        int64_t lo = std::lower_bound(seg_wn, seg_wn + count, wn_low)
            - seg_wn;
        int64_t hi = std::upper_bound(seg_wn, seg_wn + count, wn_high)
            - seg_wn;
        int64_t n = hi - lo;
        if (n > 0) {
            std::memcpy(out_wn + kept, wn + start + lo,
                        n * sizeof(double));
            std::memcpy(out_iso + kept, iso + start + lo,
                        n * sizeof(int16_t));
            std::memcpy(out_elow + kept, elow + start + lo,
                        n * sizeof(double));
            std::memcpy(out_gf + kept, gf + start + lo,
                        n * sizeof(double));
            kept += n;
        }
        start += count;
    }
    return kept;
}

}  // extern "C"
