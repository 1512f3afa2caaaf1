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
