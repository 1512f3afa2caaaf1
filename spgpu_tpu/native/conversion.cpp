// Native conversion kernels — the sequential inner loops of the
// COO → WHELL / WHDIA layout builders (spgpu_tpu/convert/{whell,whdia}.py).
//
// The reference's conversions are single-threaded C/C++ element walks
// (/root/reference/src/core/hell.c:46-104, hdia.cpp:68-153); our
// conversions are vectorised NumPy except for the greedy tile-chunking
// scans, which are inherently sequential (each decision depends on the
// running tile state).  Those scans live here: a Python loop over a
// million slots costs seconds, this costs milliseconds.
//
// Build: g++ -O3 -shared -fPIC conversion.cpp -o libspgpu_native.so
// (driven by spgpu_tpu/native/__init__.py at first use).

#include <cstdint>

extern "C" {

// Greedy 8-slot tiling for WHELL (page-per-slot layout).
//
// Walk per-slot (page, hack) pairs in order; start a new tile when the
// current one is full (8 slots), the hack changes, or the incoming
// slot's page falls outside the tile's 8-page window.  Pages ascend
// within a hack, so the span check is p - base > 7.
//
// Outputs: new_slot[i] = naive slot i's position in tile units
// (tile*8 + fill); tile_base/tile_hack per created tile (caller sizes
// them to n, the worst case).  Returns the number of tiles created.
int64_t whell_chunk_tiles(
    const int64_t* sp,       // [n] per-naive-slot page (ascending per hack)
    const int64_t* sh,       // [n] per-naive-slot hack
    int64_t n,
    int64_t base_cap,        // max window base page (x2d bound)
    int64_t* new_slot,       // [n] out
    int64_t* tile_base,      // [>= n] out
    int64_t* tile_hack       // [>= n] out
) {
    int64_t ntiles = 0;
    int64_t fill = 8, cur_hack = -1, base = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t p = sp[i], h = sh[i];
        if (fill == 8 || h != cur_hack || p - base > 7) {
            base = p < base_cap ? p : base_cap;
            tile_base[ntiles] = base;
            tile_hack[ntiles] = h;
            ++ntiles;
            cur_hack = h;
            fill = 0;
        }
        new_slot[i] = (ntiles - 1) * 8 + fill;
        ++fill;
    }
    return ntiles;
}

// Greedy 8-slot tiling for WHDIA: one slot per occupied (hack,
// diagonal); a new tile starts when full, the hack changes, or the
// diagonal spread exceeds `spread` (so every valid cell's window index
// stays inside the tile's 8 x pages).
int64_t whdia_tile(
    const int64_t* slot_hack,  // [n] ascending
    const int64_t* slot_diag,  // [n] ascending within hack
    int64_t n,
    int64_t spread,
    int64_t* tile_of_slot,     // [n] out
    int64_t* pos_of_slot,      // [n] out
    int64_t* tile_hack,        // [>= n] out
    int64_t* tile_d0           // [>= n] out
) {
    int64_t ntiles = 0;
    int64_t fill = 8, cur_hack = -2, d0 = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t h = slot_hack[i], d = slot_diag[i];
        if (fill == 8 || h != cur_hack || d - d0 > spread) {
            tile_hack[ntiles] = h;
            tile_d0[ntiles] = d;
            ++ntiles;
            cur_hack = h;
            d0 = d;
            fill = 0;
        }
        tile_of_slot[i] = ntiles - 1;
        pos_of_slot[i] = fill;
        ++fill;
    }
    return ntiles;
}

// Greedy weighted binning of rows into 128-lane hacks (WHELL packed
// layout): walk rows in order, start a new hack when the row's lane
// demand no longer fits.  Rows stay consecutive within a hack so the
// row -> lane-space embedding is order-preserving (with gaps).
int64_t whell_hack_fill(
    const int64_t* d,        // [n] per-row lane demand, 1..cap
    int64_t n,
    int64_t cap,             // lanes per hack (128)
    int64_t* hack_of_row,    // [n] out
    int64_t* lane_start      // [n] out: first lane of the row in its hack
) {
    int64_t h = 0, acc = 0;
    for (int64_t r = 0; r < n; ++r) {
        if (acc + d[r] > cap) { ++h; acc = 0; }
        hack_of_row[r] = h;
        lane_start[r] = acc;
        acc += d[r];
    }
    return n ? h + 1 : 0;
}

}  // extern "C"

#include <vector>
#include <cstring>

extern "C" {

// Fused gather + capacity-aware first-fit for packed-lane WHELL.
//
// Replaces five m-sized NumPy gathers, the residue/delta/key
// arithmetic, the first-fit assignment, and the per-group width
// reduction with one cache-friendly pass over the sorted entry order
// (measured ~2.5x conversion speedup at 12M nnz).  Entries arrive via
// `order` (sorted by group, (row, col) within); outputs are in sorted
// order.
//
// Returns the number of groups.
int64_t whell_gather_assign(
    const int64_t* order,        // [m] sorted entry permutation
    const int64_t* rows,         // [n-indexed] entry rows (raw)
    const int32_t* cols_l,       // [m] lane-space columns (raw order)
    const int64_t* d,            // [n] per-row lane width
    const int64_t* lane_start,   // [n] per-row first lane
    const int64_t* hack_of_row,  // [n]
    int64_t m,
    int64_t nwin,
    int64_t w,                   // window pages (8/16/32)
    int64_t* slot_out,           // [m] slot within group (sorted order)
    int64_t* lane_out,           // [m] lane (sorted order)
    int8_t* res_out,             // [m] residue (sorted order)
    int8_t* del_out,             // [m] page delta (sorted order)
    int64_t* gid_out,            // [m] group index (sorted order)
    int64_t* gW,                 // [>=groups] per-group max slot count
    int64_t* gG                  // [>=groups] per-group key (hack*nwin+win)
) {
    std::vector<int8_t> ptab;
    std::vector<int16_t> fill;
    int64_t nslots = 0;
    int64_t cur_g = -1, cur_row = -1, row_hint = 0;
    int64_t ngroups = 0;

    auto grow = [&](int64_t s) {
        while ((int64_t)fill.size() <= s) {
            ptab.resize((nslots + 1) * 128, -1);
            fill.push_back(0);
            ++nslots;
        }
    };

    for (int64_t i = 0; i < m; ++i) {
        const int64_t j = order[i];
        const int64_t row = rows[j];
        const int32_t c = cols_l[j];
        const int64_t page = c >> 7;
        const int64_t res = c & 127;
        const int64_t del = page % w;
        const int64_t g = hack_of_row[row] * nwin + page / w;
        if (g != cur_g) {
            if (ngroups > 0) gW[ngroups - 1] = nslots;
            gG[ngroups] = g;
            ++ngroups;
            cur_g = g;
            ptab.clear();
            fill.clear();
            nslots = 0;
            cur_row = -1;
        }
        if (row != cur_row) {
            cur_row = row;
            std::fill(fill.begin(), fill.end(), 0);
            row_hint = 0;
        }
        const int64_t wcap = d[row];
        int64_t s = row_hint;
        for (;; ++s) {
            grow(s);
            if (fill[s] >= wcap) { if (s == row_hint) ++row_hint; continue; }
            int8_t& pr = ptab[s * 128 + res];
            if (pr == -1 || pr == (int8_t)del) {
                pr = (int8_t)del;
                slot_out[i] = s;
                lane_out[i] = lane_start[row] + fill[s];
                ++fill[s];
                break;
            }
        }
        res_out[i] = (int8_t)res;
        del_out[i] = (int8_t)del;
        gid_out[i] = ngroups - 1;
    }
    if (ngroups > 0) gW[ngroups - 1] = nslots;
    return ngroups;
}

// Scattered-window variant of whell_gather_assign: the per-entry group
// key and page delta are precomputed by the caller (the window is a SET
// of up to K independently-based superpages per group, so delta =
// table_rank*8 + page%8 can't be derived from the column alone).  Same
// capacity-aware first-fit walk otherwise.
int64_t whell_gather_assign2(
    const int64_t* order,        // [m] sorted entry permutation
    const int64_t* rows,         // [raw] entry rows
    const int32_t* cols_l,       // [m] lane-space columns (raw order)
    const int64_t* d,            // [n] per-row lane width
    const int64_t* lane_start,   // [n] per-row first lane
    const int64_t* G_in,         // [m] per-entry group key (raw order)
    const int8_t* dlt_in,        // [m] per-entry page delta (raw order)
    int64_t m,
    int64_t* slot_out,           // [m] slot within group (sorted order)
    int64_t* lane_out,           // [m] lane (sorted order)
    int8_t* res_out,             // [m] residue (sorted order)
    int8_t* del_out,             // [m] page delta (sorted order)
    int64_t* gid_out,            // [m] group index (sorted order)
    int64_t* gW,                 // [>=groups] per-group max slot count
    int64_t* gG                  // [>=groups] per-group key
) {
    std::vector<int8_t> ptab;
    std::vector<int16_t> fill;
    int64_t nslots = 0;
    int64_t cur_g = -1, cur_row = -1, row_hint = 0;
    int64_t ngroups = 0;

    auto grow = [&](int64_t s) {
        while ((int64_t)fill.size() <= s) {
            ptab.resize((nslots + 1) * 128, -1);
            fill.push_back(0);
            ++nslots;
        }
    };

    for (int64_t i = 0; i < m; ++i) {
        const int64_t j = order[i];
        const int64_t row = rows[j];
        const int64_t res = cols_l[j] & 127;
        const int8_t del = dlt_in[j];
        const int64_t g = G_in[j];
        if (g != cur_g) {
            if (ngroups > 0) gW[ngroups - 1] = nslots;
            gG[ngroups] = g;
            ++ngroups;
            cur_g = g;
            ptab.clear();
            fill.clear();
            nslots = 0;
            cur_row = -1;
        }
        if (row != cur_row) {
            cur_row = row;
            std::fill(fill.begin(), fill.end(), 0);
            row_hint = 0;
        }
        const int64_t wcap = d[row];
        int64_t s = row_hint;
        for (;; ++s) {
            grow(s);
            if (fill[s] >= wcap) { if (s == row_hint) ++row_hint; continue; }
            int8_t& pr = ptab[s * 128 + res];
            if (pr == -1 || pr == del) {
                pr = del;
                slot_out[i] = s;
                lane_out[i] = lane_start[row] + fill[s];
                ++fill[s];
                break;
            }
        }
        res_out[i] = (int8_t)res;
        del_out[i] = del;
        gid_out[i] = ngroups - 1;
    }
    if (ngroups > 0) gW[ngroups - 1] = nslots;
    return ngroups;
}

// Parallel (OpenMP) variant of whell_gather_assign2: groups are
// independent first-fit problems, so threads take contiguous group
// ranges (`starts[g]` = first sorted-entry index of group g; the caller
// precomputes boundaries from the sorted key array).  Group ids and
// widths are written by global group index — no cross-thread state.
int64_t whell_gather_assign_par(
    const int64_t* order,        // [m] sorted entry permutation
    const int64_t* rows,         // [raw] entry rows
    const int32_t* cols_l,       // [m] lane-space columns (raw order)
    const int64_t* d,            // [n] per-row lane width
    const int64_t* lane_start,   // [n] per-row first lane
    const int8_t* dlt_in,        // [m] per-entry page delta (raw order)
    const int64_t* starts,       // [ngroups+1] sorted-entry group bounds
    int64_t ngroups,
    int64_t* slot_out,           // [m] slot within group (sorted order)
    int64_t* lane_out,           // [m] lane (sorted order)
    int8_t* res_out,             // [m] residue (sorted order)
    int64_t* gid_out,            // [m] group index (sorted order)
    int64_t* gW                  // [ngroups] per-group max slot count
) {
#pragma omp parallel
    {
        std::vector<int8_t> ptab;
        std::vector<int16_t> fill;
#pragma omp for schedule(dynamic, 64)
        for (int64_t g = 0; g < ngroups; ++g) {
            int64_t nslots = 0;
            int64_t cur_row = -1, row_hint = 0;
            ptab.clear();
            fill.clear();
            for (int64_t i = starts[g]; i < starts[g + 1]; ++i) {
                const int64_t j = order[i];
                const int64_t row = rows[j];
                const int64_t res = cols_l[j] & 127;
                const int8_t del = dlt_in[j];
                if (row != cur_row) {
                    cur_row = row;
                    std::fill(fill.begin(), fill.end(), 0);
                    row_hint = 0;
                }
                const int64_t wcap = d[row];
                int64_t s = row_hint;
                for (;; ++s) {
                    while ((int64_t)fill.size() <= s) {
                        ptab.resize((nslots + 1) * 128, -1);
                        fill.push_back(0);
                        ++nslots;
                    }
                    if (fill[s] >= wcap) {
                        if (s == row_hint) ++row_hint;
                        continue;
                    }
                    int8_t& pr = ptab[s * 128 + res];
                    if (pr == -1 || pr == del) {
                        pr = del;
                        slot_out[i] = s;
                        lane_out[i] = lane_start[row] + fill[s];
                        ++fill[s];
                        break;
                    }
                }
                res_out[i] = (int8_t)res;
                gid_out[i] = g;
            }
            gW[g] = nslots;
        }
    }
    return ngroups;
}

// Parallel slab scatter: entries land at distinct (slot, lane) cells by
// construction, so the three scatters are race-free.  `vals` may be any
// element size (bytes memcpy'd) — fp32/fp64/bf16 slabs share the path.
// The global slot index is derived in-loop from the per-group tile base
// (slot = g_tile0[gid]*8 + k), saving three m-sized host temporaries.
void whell_scatter_slabs(
    const int64_t* order,       // [m] sorted entry permutation
    const char* vals_raw,       // [raw] entry values, elem_size bytes each
    const int64_t* g_tile0,     // [ngroups] first tile of each group
    const int64_t* gid,         // [m] group index (sorted order)
    const int64_t* k,           // [m] slot within group (sorted order)
    const int64_t* lane,        // [m] lane (sorted order)
    const int8_t* res,          // [m] residue (sorted order)
    const int8_t* dlt,          // [m] page delta (sorted order)
    int64_t m,
    int64_t elem_size,
    char* vals_slab,            // [total_slots*128*elem_size] zeroed
    int8_t* res_slab,           // [total_slots*128] zeroed
    int8_t* pt_slab,            // [total_slots*128] zeroed
    int64_t* slot_out           // [m] global slot (for pattern-reuse plans)
) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < m; ++i) {
        const int64_t slot = g_tile0[gid[i]] * 8 + k[i];
        const int64_t cell = slot * 128 + lane[i];
        const int64_t j = order[i];
        for (int64_t b = 0; b < elem_size; ++b)
            vals_slab[cell * elem_size + b] = vals_raw[j * elem_size + b];
        res_slab[cell] = res[i];
        pt_slab[slot * 128 + res[i]] = dlt[i];
        slot_out[i] = slot;
    }
}

// Capacity-aware first-fit for the packed-lane WHELL layout.
//
// Entries arrive sorted by (group, row, col).  Row r owns the lane
// segment [seg_start, seg_start + seg_width) of its hack; within a
// group, a slot can hold up to seg_width cells of the row (one per
// segment lane) and the slot's residue -> page map must stay a
// function.  Unlike the classic assigner the entry may take ANY free
// lane of its segment, so a residue conflict only bumps the slot when
// every alternative in the slot is exhausted — measured ~25% fewer
// slots than lane-pinned round-robin on power-law FEM profiles.
void whell_assign_seg(
    const int64_t* G,      // [m] group ids (non-decreasing)
    const int64_t* row,    // [m] row ids   (non-decreasing within group)
    const int64_t* seg0,   // [m] first lane of the row's segment
    const int64_t* segw,   // [m] segment width (1..128)
    const int64_t* res,    // [m] residue 0..127
    const int64_t* dlt,    // [m] page delta within the window (0..31)
    int64_t m,
    int64_t* slot_out,     // [m] out: slot within group
    int64_t* lane_out      // [m] out: lane 0..127
) {
    std::vector<int8_t> ptab;      // [nslots][128] page per residue, -1 unset
    std::vector<int16_t> fill;     // [nslots] cells of CURRENT row in slot
    int64_t nslots = 0;
    int64_t cur_g = -1, cur_row = -1;
    int64_t row_hint = 0;          // first slot with spare capacity

    auto grow = [&](int64_t s) {
        while ((int64_t)fill.size() <= s) {
            ptab.resize((nslots + 1) * 128, -1);
            fill.push_back(0);
            ++nslots;
        }
    };

    for (int64_t i = 0; i < m; ++i) {
        if (G[i] != cur_g) {
            cur_g = G[i];
            ptab.clear();
            fill.clear();
            nslots = 0;
            cur_row = -1;
        }
        if (row[i] != cur_row) {
            cur_row = row[i];
            std::fill(fill.begin(), fill.end(), 0);
            row_hint = 0;
        }
        const int64_t r = res[i], wcap = segw[i];
        const int8_t d = (int8_t)dlt[i];
        int64_t s = row_hint;
        for (;; ++s) {
            grow(s);
            if (fill[s] >= wcap) { if (s == row_hint) ++row_hint; continue; }
            int8_t& pr = ptab[s * 128 + r];
            if (pr == -1 || pr == d) {
                pr = d;
                slot_out[i] = s;
                lane_out[i] = seg0[i] + fill[s];
                ++fill[s];
                break;
            }
        }
    }
}

}  // extern "C"

extern "C" {

// First-fit slot assignment for WHELL mixed-page groups.
//
// Entries arrive sorted by (group, row, col).  Within a group, a slot
// may hold at most one entry per lane, and its residue -> page map must
// stay a function.  First-fit with per-lane scan hints replaces the
// NumPy eviction rounds (which re-collide and need many passes).
//
// Returns the total number of slots used across groups via slot_out
// (per-entry slot index WITHIN its group).
void whell_assign(
    const int64_t* G,     // [m] group ids (non-decreasing)
    const int64_t* lane,  // [m] 0..127
    const int64_t* res,   // [m] 0..127
    const int64_t* dlt,   // [m] 0..7
    int64_t m,
    int64_t* slot_out     // [m] out: slot within group
) {
    std::vector<int8_t> ptab;        // [nslots][128] page per residue, -1 unset
    std::vector<unsigned char> used; // [nslots][128] lane occupancy
    int64_t next_lane_slot[128];     // per-lane first candidate slot
    int64_t nslots = 0;
    int64_t cur_g = -1;

    auto grow = [&](int64_t s) {
        while (nslots <= s) {
            ptab.resize((nslots + 1) * 128, -1);
            used.resize((nslots + 1) * 128, 0);
            ++nslots;
        }
    };

    for (int64_t i = 0; i < m; ++i) {
        if (G[i] != cur_g) {
            cur_g = G[i];
            ptab.clear();
            used.clear();
            nslots = 0;
            for (int l = 0; l < 128; ++l) next_lane_slot[l] = 0;
        }
        const int64_t ln = lane[i], r = res[i];
        const int8_t d = (int8_t)dlt[i];
        int64_t s = next_lane_slot[ln];
        for (;; ++s) {
            grow(s);
            if (used[s * 128 + ln]) continue;
            int8_t& pr = ptab[s * 128 + r];
            if (pr == -1 || pr == d) {
                pr = d;
                used[s * 128 + ln] = 1;
                break;
            }
        }
        slot_out[i] = s;
        next_lane_slot[ln] = s + 1;
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Matrix Market coordinate-body tokenizer (r5).
//
// The reference reads MM files with a per-line fscanf loop
// (src/utils/mmread.cpp:63-, external/mmio.c) at ~1 MB/s-class rates; the
// r4 Python fast path (np.fromstring over the whole body) reached ~1.5M
// nnz/s single-threaded and silently tolerated misaligned bodies (ADVICE
// r4).  This pass splits the body into newline-aligned chunks, counts
// non-blank lines per chunk (prefix-sum -> output offsets), then parses
// each chunk in parallel with STRICT per-line validation: every non-blank
// line must hold exactly `ncols` tokens (2 pattern / 3 real-integer /
// 4 complex) with nothing but whitespace after them.  Any violation
// returns -1 and the caller falls back to np.loadtxt.
// ---------------------------------------------------------------------------
#include <cstdlib>
#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

static inline const char* mm_skip_ws(const char* p, const char* e) {
    while (p < e && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

static inline const char* mm_int(const char* p, const char* e,
                                 int64_t* out, bool* ok) {
    bool neg = false;
    if (p < e && (*p == '+' || *p == '-')) { neg = *p == '-'; ++p; }
    if (p >= e || *p < '0' || *p > '9') { *ok = false; return p; }
    int64_t v = 0;
    while (p < e && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
    *out = neg ? -v : v;
    return p;
}

// Fast decimal->double: the Clinger fast path extended through x86
// long double (64-bit mantissa).  Mantissas up to 19 digits are exact
// in long double and 10^|e| is exact for |e| <= 27, so one long-double
// multiply covers everything the repo's own %.17g writer emits; the
// residual double-rounding ambiguity is < 1 ulp (validated against
// strtod over 10M random %.17g round-trips at build time — see
// tests/test_io.py::test_fast_parse_matches_strtod).  Anything outside
// the window (20+ digits, big exponents, inf/nan, hex) falls back to
// strtod.
static const long double kPow10[] = {
    1e0L, 1e1L, 1e2L, 1e3L, 1e4L, 1e5L, 1e6L, 1e7L, 1e8L, 1e9L, 1e10L,
    1e11L, 1e12L, 1e13L, 1e14L, 1e15L, 1e16L, 1e17L, 1e18L, 1e19L,
    1e20L, 1e21L, 1e22L, 1e23L, 1e24L, 1e25L, 1e26L, 1e27L};

static inline const char* mm_double(const char* p, const char* e,
                                    double* out, bool* ok) {
    const char* p0 = p;
    bool neg = false;
    if (p < e && (*p == '+' || *p == '-')) { neg = *p == '-'; ++p; }
    uint64_t m = 0;
    int nd = 0, frac = 0;
    bool any = false, dot = false;
    while (p < e) {
        const char ch = *p;
        if (ch >= '0' && ch <= '9') {
            any = true;
            if (nd < 19) {
                m = m * 10 + (uint64_t)(ch - '0');
                if (m) ++nd;
                if (dot) ++frac;
            } else {
                goto slow;  // 20+ significant digits: strtod decides
            }
        } else if (ch == '.') {
            if (dot) goto slow;
            dot = true;
        } else {
            break;
        }
        ++p;
    }
    if (!any) goto slow;
    {
        int ex = -frac;
        if (p < e && (*p == 'e' || *p == 'E')) {
            ++p;
            bool eneg = false;
            if (p < e && (*p == '+' || *p == '-')) { eneg = *p == '-'; ++p; }
            if (p >= e || *p < '0' || *p > '9') goto slow;
            int ev = 0;
            while (p < e && *p >= '0' && *p <= '9') {
                ev = ev * 10 + (*p++ - '0');
                if (ev > 400) goto slow;
            }
            ex += eneg ? -ev : ev;
        }
        if (ex > 27 || ex < -27) goto slow;
        long double v = (long double)m;
        v = ex >= 0 ? v * kPow10[ex] : v / kPow10[-ex];
        *out = (double)(neg ? -v : v);
        return p;
    }
slow: {
        char* q;
        double d = strtod(p0, &q);
        if (q == p0) { *ok = false; return p0; }
        *out = d;
        return q;
    }
}

// parse one line starting at p (not at '\n'); returns pointer past the
// parsed line's '\n' (or e), writes fields, sets *ok=false on violation
static inline const char* mm_line(const char* p, const char* e, int nval,
                                  int64_t* r, int64_t* c, double* v,
                                  bool* ok) {
    p = mm_int(p, e, r, ok);
    if (!*ok) return e;
    p = mm_skip_ws(p, e);
    p = mm_int(p, e, c, ok);
    if (!*ok) return e;
    for (int k = 0; k < nval; ++k) {
        p = mm_skip_ws(p, e);
        p = mm_double(p, e, v + k, ok);
        if (!*ok) return e;
    }
    p = mm_skip_ws(p, e);
    if (p < e && *p != '\n') { *ok = false; return e; }
    return p < e ? p + 1 : e;
}

int64_t mm_parse(const char* buf, int64_t len, int64_t ntok,
                 int64_t max_entries, int64_t* rows, int64_t* cols,
                 double* vals) {
    const int nval = (int)(ntok - 2);
    int nt = 1;
#ifdef _OPENMP
    nt = omp_get_max_threads();
    if (nt > 16) nt = 16;
#endif
    if (nt < 1) nt = 1;
    // newline-aligned chunk starts
    std::vector<int64_t> start(nt + 1, 0);
    start[nt] = len;
    for (int t = 1; t < nt; ++t) {
        int64_t s = len * t / nt;
        // s can be 0 when len < nt: buf[s-1] would read one byte
        // BEFORE the buffer (review r5); chunk boundaries at 0 are
        // already newline-aligned by definition
        while (s > 0 && s < len && buf[s - 1] != '\n') ++s;
        start[t] = s;
    }
    for (int t = 1; t < nt; ++t)
        if (start[t] < start[t - 1]) start[t] = start[t - 1];
    // pass 1: count non-blank lines per chunk
    std::vector<int64_t> cnt(nt, 0);
#ifdef _OPENMP
#pragma omp parallel for num_threads(nt) schedule(static, 1)
#endif
    for (int t = 0; t < nt; ++t) {
        const char* p = buf + start[t];
        const char* e = buf + start[t + 1];
        int64_t n = 0;
        while (p < e) {
            const char* q = mm_skip_ws(p, e);
            if (q < e && *q != '\n') ++n;
            const char* nl = (const char*)memchr(q, '\n', e - q);
            p = nl ? nl + 1 : e;
        }
        cnt[t] = n;
    }
    std::vector<int64_t> off(nt + 1, 0);
    for (int t = 0; t < nt; ++t) off[t + 1] = off[t] + cnt[t];
    if (off[nt] > max_entries) return -1;
    // pass 2: strict parse into the prefix offsets
    bool all_ok = true;
#ifdef _OPENMP
#pragma omp parallel for num_threads(nt) schedule(static, 1)
#endif
    for (int t = 0; t < nt; ++t) {
        const char* p = buf + start[t];
        const char* e = buf + start[t + 1];
        int64_t i = off[t];
        bool ok = true;
        while (p < e && ok) {
            p = mm_skip_ws(p, e);
            if (p >= e) break;
            if (*p == '\n') { ++p; continue; }
            double v[2] = {0.0, 0.0};
            p = mm_line(p, e, nval, rows + i, cols + i, v, &ok);
            if (!ok) break;
            if (nval >= 1) vals[i * (nval > 1 ? 2 : 1)] = v[0];
            if (nval == 2) vals[i * 2 + 1] = v[1];
            ++i;
        }
        if (!ok)
#ifdef _OPENMP
#pragma omp atomic write
#endif
            all_ok = false;
    }
    if (!all_ok) return -1;
    return off[nt];
}

}  // extern "C"
