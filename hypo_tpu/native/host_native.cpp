// Native host runtime for hypo_tpu: the OpenMP-parallel per-alignment
// stages that the reference runs as C++ loops (reference
// src/Alignment.cpp:65-220 support updates, external/suk k-mer counting).
//
// All entry points use a flat C ABI for ctypes.  Semantics mirror the
// Python/NumPy implementations in hypo_tpu/segment/support.py and
// hypo_tpu/kmers/counting.py bit-for-bit (tested for parity); those stay
// as the executable oracle and fallback.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -fopenmp -march=native
#include <algorithm>
#include <array>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------
// Canonical k-mer counting (dense table).
//
// codes: concatenated read codes (0..3 = ACGT, >=4 resets the window,
// used as the read separator).  table: 4^k uint32 slots, incremented
// (saturating at 0xFFFFFFFF) for the canonical (min of fwd/rc packing)
// of every N-free k-mer window.
void hypo_count_kmers_dense(const uint8_t* codes, int64_t n, int k,
                            uint32_t* table, int nthreads) {
#ifdef _OPENMP
    if (nthreads > 0) omp_set_num_threads(nthreads);
#endif
    const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
    const int shift = 2 * (k - 1);
    // chunk with (k-1) overlap so each thread rebuilds its rolling state
#pragma omp parallel
    {
#ifdef _OPENMP
        const int tid = omp_get_thread_num();
        const int nth = omp_get_num_threads();
#else
        const int tid = 0, nth = 1;
#endif
        const int64_t chunk = (n + nth - 1) / nth;
        const int64_t beg = tid * chunk;
        const int64_t end = std::min(n, beg + chunk);
        if (beg >= end) goto done;
        {
            // start the scan k-1 bases early to warm the rolling window;
            // only record kmers whose START is in [beg, end)
            int64_t scan0 = std::max<int64_t>(0, beg - (k - 1));
            uint64_t fwd = 0, rc = 0;
            int valid = 0;
            for (int64_t i = scan0; i < std::min(n, end + k - 1); ++i) {
                uint8_t c = codes[i];
                if (c < 4) {
                    fwd = ((fwd << 2) | c) & mask;
                    rc = (rc >> 2) | ((uint64_t)(3 ^ c) << shift);
                    ++valid;
                    if (valid >= k) {
                        int64_t start = i - k + 1;
                        if (start >= beg && start < end) {
                            uint64_t canon = fwd < rc ? fwd : rc;
                            auto* slot = reinterpret_cast<
                                std::atomic<uint32_t>*>(&table[canon]);
                            uint32_t cur = slot->load(
                                std::memory_order_relaxed);
                            while (cur != 0xFFFFFFFFu &&
                                   !slot->compare_exchange_weak(
                                       cur, cur + 1,
                                       std::memory_order_relaxed)) {}
                        }
                    }
                } else {
                    valid = 0;
                }
            }
        }
    done:;
    }
}

// ---------------------------------------------------------------------
// Solid-kmer coverage/support update (reference
// Alignment::update_solidkmers_support, src/Alignment.cpp:65-132).
//
// positions/kids: per-contig solid k-mer start positions (sorted) and
// their packed values.  Alignments arrive as a concatenated code buffer
// plus offsets and rb/re arrays.  Outputs: cov_diff (length npos+1,
// caller integrates with cumsum) and support (length npos), both
// accumulated atomically.
void hypo_skmer_support(const int64_t* positions, const int64_t* kids,
                        int64_t npos, int k,
                        const uint8_t* codes, const int64_t* code_off,
                        const int64_t* rb, const int64_t* re,
                        int64_t n_aln,
                        int64_t* cov_diff, int64_t* support,
                        int nthreads) {
#ifdef _OPENMP
    if (nthreads > 0) omp_set_num_threads(nthreads);
#endif
    const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
#pragma omp parallel
    {
        std::vector<std::pair<uint64_t, int32_t>> rk;    // (kmer, read pos)
        std::vector<std::array<int64_t, 3>> trip;        // (j, c, sp)
#pragma omp for schedule(dynamic, 64)
        for (int64_t a = 0; a < n_aln; ++a) {
            const int64_t arb = rb[a], are = re[a];
            const int64_t first =
                std::lower_bound(positions, positions + npos, arb) -
                positions;
            const int64_t last0 =
                std::lower_bound(positions, positions + npos, are) -
                positions;
            const int64_t fit =
                std::upper_bound(positions, positions + npos, are - k) -
                positions;
            const int64_t last = fit > first ? fit : last0;
            if (last <= first) continue;
#pragma omp atomic
            cov_diff[first] += 1;
#pragma omp atomic
            cov_diff[last] -= 1;

            const uint8_t* q = codes + code_off[a];
            const int64_t qlen = code_off[a + 1] - code_off[a];
            if (qlen < k) continue;
            rk.clear();
            uint64_t fwd = 0;
            for (int64_t j = 0; j < qlen; ++j) {
                fwd = ((fwd << 2) | q[j]) & mask;
                if (j >= k - 1) rk.emplace_back(fwd, (int32_t)(j - k + 1));
            }
            std::sort(rk.begin(), rk.end());

            trip.clear();
            const int64_t num_cbases = are - arb;
            for (int64_t c = first; c < last; ++c) {
                const uint64_t kid = (uint64_t)kids[c];
                auto lo = std::lower_bound(
                    rk.begin(), rk.end(),
                    std::make_pair(kid, (int32_t)INT32_MIN));
                const int64_t c_dist = positions[c] - arb;
                const int64_t left = std::max<int64_t>(c_dist - k, 0);
                const int64_t right =
                    std::min<int64_t>(num_cbases, c_dist + k);
                for (; lo != rk.end() && lo->first == kid; ++lo) {
                    const int64_t j = lo->second;
                    if (j >= left && j <= right)
                        trip.push_back({j, c, positions[c]});
                }
            }
            if (trip.empty()) continue;
            std::sort(trip.begin(), trip.end());
            // sequential adjacent-kmer insertion heuristic
            // (reference Alignment.cpp:116-127)
            int64_t pvs_kpos = -1, pvs_rbind = 0;
            for (const auto& t : trip) {
                const int64_t j = t[0], c = t[1], sp = t[2];
                bool should = true;
                if (pvs_kpos > -1 && sp <= k + pvs_kpos)
                    if ((j - pvs_rbind) != (sp - pvs_kpos)) should = false;
                if (should) {
                    pvs_kpos = sp;
                    pvs_rbind = j;
#pragma omp atomic
                    support[c] += 1;
                }
            }
        }
    }
}

// ---------------------------------------------------------------------
// Minimizer coverage/support update (reference
// Alignment::update_minimisers_support, src/Alignment.cpp:134-220).
//
// starts: stage-1 region boundary positions (nstarts entries, last is
// the contig end dummy).  Per-MegaWindow minimizer tables are flattened:
// mw_off[n_mw+1] offsets into m_vals/m_abs (values and absolute
// positions); coverage/support (int32) flattened likewise and
// accumulated atomically.
void hypo_minimizer_support(const int64_t* starts, int64_t nstarts,
                            int is_win_even,
                            const int64_t* mw_off, int64_t n_mw,
                            const int64_t* m_vals, const int64_t* m_abs,
                            const uint8_t* codes, const int64_t* code_off,
                            const int64_t* rb, const int64_t* re,
                            int64_t n_aln, int mk, int mw_w,
                            int32_t* coverage, int32_t* support,
                            int nthreads) {
#ifdef _OPENMP
    if (nthreads > 0) omp_set_num_threads(nthreads);
#endif
    const int64_t nreg = nstarts - 1;
    const uint64_t mask = (1ULL << (2 * mk)) - 1;
#pragma omp parallel
    {
        std::vector<std::pair<uint64_t, int32_t>> rmin;  // (val, read pos)
        std::vector<std::pair<uint64_t, int64_t>> deque;
#pragma omp for schedule(dynamic, 64)
        for (int64_t a = 0; a < n_aln; ++a) {
            const int64_t arb = rb[a], are = re[a];
            int64_t first =
                (std::lower_bound(starts, starts + nstarts, arb + 1) -
                 starts) - 1;
            int64_t last =
                std::lower_bound(starts, starts + nstarts, are) - starts;
            int64_t first_w =
                ((first % 2 == 0) == (bool)is_win_even) ? first : first + 1;
            int64_t last_w =
                ((last % 2 == 0) == (bool)is_win_even) ? last : last - 1;
            if (last_w < first_w) continue;

            // forward-strand minimizer scan of the read (deque semantics
            // of reference src/Contig.cpp:474-502; reads are N-free)
            const uint8_t* q = codes + code_off[a];
            const int64_t qlen = code_off[a + 1] - code_off[a];
            rmin.clear();
            deque.clear();
            {
                uint64_t fwd = 0;
                int64_t processed = 0, last_pos = qlen + 1;
                size_t head = 0;
                for (int64_t i = 0; i < qlen; ++i) {
                    fwd = ((fwd << 2) | q[i]) & mask;
                    if (i >= mk - 1) {
                        while (deque.size() > head &&
                               deque.back().first > fwd)
                            deque.pop_back();
                        deque.emplace_back(fwd, i);
                        while (deque[head].second + mw_w <= i) ++head;
                        ++processed;
                        if (processed >= mw_w) {
                            int64_t pos = deque[head].second - mk + 1;
                            if (pos != last_pos)
                                rmin.emplace_back(deque[head].first, pos);
                            last_pos = pos;
                        }
                    }
                }
            }
            std::sort(rmin.begin(), rmin.end());

            const int64_t num_cbases = are - arb;
            for (int64_t i = first_w; i <= last_w; i += 2) {
                if (i >= nreg) break;
                const int64_t minfoidx =
                    is_win_even ? i / 2 : (i - 1) / 2;
                if (minfoidx >= n_mw) break;
                const int64_t o0 = mw_off[minfoidx];
                const int64_t o1 = mw_off[minfoidx + 1];
                for (int64_t t = o0; t < o1; ++t) {
                    const int64_t ap = m_abs[t];
                    if (ap < arb || ap >= are) continue;
                    auto* cslot = reinterpret_cast<std::atomic<int32_t>*>(
                        &coverage[t]);
                    cslot->fetch_add(1, std::memory_order_relaxed);
                    if (rmin.empty()) continue;
                    const uint64_t val = (uint64_t)m_vals[t];
                    auto lo = std::lower_bound(
                        rmin.begin(), rmin.end(),
                        std::make_pair(val, (int32_t)INT32_MIN));
                    if (lo == rmin.end() || lo->first != val) continue;
                    const int64_t c_dist = ap - arb;
                    const int64_t r_left =
                        std::max<int64_t>(c_dist - 2 * mk, 0);
                    const int64_t r_right =
                        std::min<int64_t>(num_cbases, c_dist + 3 * mk);
                    int32_t cnt = 0;
                    for (; lo != rmin.end() && lo->first == val; ++lo)
                        if (lo->second >= r_left && lo->second <= r_right)
                            ++cnt;
                    if (cnt) {
                        auto* sslot =
                            reinterpret_cast<std::atomic<int32_t>*>(
                                &support[t]);
                        sslot->fetch_add(cnt, std::memory_order_relaxed);
                    }
                }
            }
        }
    }
}

}  // extern "C"
