"""COO → PCELL-WHELL: the per-cell row-routing kernel family (round-3
experiment, VERDICT r2 item 1).

.. deprecated:: round 4
   Chip-REFUTED for performance (~3.6x slower than packed WHELL,
   doc/DESIGN.md §2h); kept as tested evidence of the lane-gather issue
   limit.  Use ``coo_to_whell(packed=True)`` for production.

The packed-lane layout (convert/whell.py) gives every row a FIXED lane
segment across all slots of its (hack, window) group; its measured
padding floor on power-law FEM profiles is 1.74x — partial slot fill is
0.60 of it, and the in-family frontier is closed by measurement
(doc/DESIGN.md §2e).  This layout removes the fixed-segment constraint:
cells of MANY rows pack densely into each slot (a row's cells form one
contiguous lane RUN per slot), so slots fill to capacity and padding
drops to the bin-packing bound (measured on the flagship 262k FEM
config: 1.18x raw, ~1.32x after tile/chunk rounding vs 1.74x packed).

The price is a per-tile flush the packed kernel pays once per GROUP:

* inclusive lane prefix-scan of the contrib tile (7 shift-adds);
* run extraction by differencing the scan at run END lanes, routed to
  each run's row via TWO int8 slabs ``run_hi``/``run_lo`` keyed by the
  row's OUTPUT LANE (+2 B/cell of traffic, 6 -> 8 B/cell);
* the routed (8, 128) tile accumulates into the output group scratch at
  the row's output lane, so the GROUP flush is a plain slot/parity sum
  — no segment scan, no compaction gathers, and NO LANE SPACE: output
  is in original row order (hack = row // 128, out lane = row % 128).

Chip outcome (doc/DESIGN.md §2h): **REFUTED for performance** — the
layout wins on padding exactly as modelled (1.331x measured), but the
routing needs two extra LANE GATHERS per tile and the chip issues lane
gathers at ~18-27 ns each beyond the first (against a 12 ns/tile total
budget), so the kernel lands ~3.6x slower than packed WHELL.  Kept as a
correct, tested layout because the experiment bought two reusable
facts: in-kernel prefix scans must be MXU matmuls against a constant
tril matrix (a `pltpu.roll` chain costs ~34 ns per roll), and per-tile
lane-gather count is the design budget for gather-class TPU kernels.
"""

from __future__ import annotations

import numpy as np

from spgpu_tpu.formats.coo import CooMatrix
from spgpu_tpu.formats.whell import PcellWhell

__all__ = ["coo_to_whell_percell"]

_HACK = 128


def _excl_cumsum(a):
    out = np.zeros_like(a)
    np.cumsum(a[:-1], out=out[1:])
    return out


def coo_to_whell_percell(
    coo: CooMatrix,
    group_hacks: int = 512,
    chunk_tiles: int = 128,
    supers_per_tile: int = 4,
    dtype=None,
) -> PcellWhell:
    """Build the per-cell-routing layout from a square/rect host COO.

    Experiment-grade conversion: the per-group packer is a Python
    greedy (defer-on-conflict) — ~15 s at 6.7M nnz.  Duplicates are
    kept as separate cells (both contribute), as ``cooToEll``
    (``ell.c:65-78``)."""
    import jax.numpy as jnp

    vals_in = coo.values if dtype is None else coo.values.astype(dtype)
    n, m = coo.n_rows, coo.nnz
    K = supers_per_tile
    gh, ct = group_hacks, chunk_tiles
    num_hacks = max(-(-n // _HACK), 1)
    while gh > 32 and gh > num_hacks:
        gh //= 2
    num_groups = -(-num_hacks // gh)
    num_pages = max(-(-coo.n_cols // 128), 1)
    x_pages = max(-(-num_pages // 8) * 8, 8)

    if m == 0:
        total = num_groups * ct * 8
        return PcellWhell(
            values=jnp.zeros((total, _HACK), vals_in.dtype),
            residue=jnp.zeros((total, _HACK), jnp.int8),
            page_tab=jnp.zeros((total, 128), jnp.int8),
            run_hi=jnp.full((total, _HACK), -1, jnp.int8),
            run_lo=jnp.full((total, _HACK), -1, jnp.int8),
            tile_base=jnp.zeros((num_groups * ct,), jnp.int32),
            chunk_group=jnp.asarray(
                np.r_[np.arange(num_groups, dtype=np.int32), -1]),
            group_bases=jnp.zeros((K,), jnp.int32),
            n_rows=n, n_cols=coo.n_cols, num_hacks=num_hacks,
            num_groups=num_groups, total_slots=total, nnz=0,
            x_pages=x_pages, window_pages=8 * K,
            group_hacks=gh, chunk_tiles=ct,
        )

    hack = (coo.rows // _HACK).astype(np.int64)
    page = (coo.cols >> 7).astype(np.int64)
    sup = page >> 3

    # scattered superpage bins per hack (same grouping as packed WHELL)
    keysp = num_pages // 8 + 2
    key = hack * keysp + sup
    uk, inv = np.unique(key, return_inverse=True)
    uh = uk // keysp
    first = np.r_[True, uh[1:] != uh[:-1]]
    starts = np.flatnonzero(first)
    rank = np.arange(uk.size) - np.repeat(starts,
                                          np.diff(np.r_[starts, uk.size]))
    maxbins = int(rank.max()) // K + 1
    Gu = uh * maxbins + rank // K
    tbl_u = rank % K
    sup_u = uk % keysp
    G = Gu[inv]
    delta = ((tbl_u[inv] << 3) | (page & 7)).astype(np.int8)
    res = (coo.cols & 127).astype(np.int64)

    order = np.lexsort((coo.cols, coo.rows, G))
    Gs = G[order]
    res_s = res[order]
    del_s = delta[order].astype(np.int64)
    rows_o = coo.rows[order]
    out_lane_s = (rows_o % _HACK).astype(np.int64)

    g_first = np.r_[True, Gs[1:] != Gs[:-1]]
    gstarts = np.flatnonzero(g_first)
    gsizes = np.diff(np.r_[gstarts, m])
    n_grp = gstarts.size
    g_G = Gs[gstarts]
    g_hack = g_G // maxbins

    # --- greedy defer-on-conflict packer, per group ----------------------
    # produces per-cell (slot_in_group, lane) and per-run boundaries
    slot_of = np.empty(m, np.int64)
    lane_of = np.empty(m, np.int64)
    slots_per_group = np.empty(n_grp, np.int64)
    for gi in range(n_grp):
        s0 = gstarts[gi]
        sz = gsizes[gi]
        cres = res_s[s0:s0 + sz]
        cdel = del_s[s0:s0 + sz]
        pending = list(range(sz))
        nslots = 0
        while pending:
            used = {}
            lane = 0
            nxt = []
            for i in pending:
                if lane >= 128:
                    nxt.append(i)
                    continue
                r_ = cres[i]
                u = used.get(r_)
                if u is not None and u != cdel[i]:
                    nxt.append(i)
                    continue
                used[r_] = cdel[i]
                slot_of[s0 + i] = nslots
                lane_of[s0 + i] = lane
                lane += 1
            pending = nxt
            nslots += 1
        slots_per_group[gi] = nslots

    # --- group -> global tiles (same output-group chunking as packed) ----
    raw_tiles_per_grp = -(-slots_per_group // 8)
    hack8 = g_hack // gh
    tiles_per_g8 = np.zeros(num_groups, np.int64)
    np.add.at(tiles_per_g8, hack8, raw_tiles_per_grp)
    pad_tiles_per_g8 = np.maximum(-(-tiles_per_g8 // ct) * ct, ct)
    g8_base = _excl_cumsum(pad_tiles_per_g8)
    num_tiles = int(pad_tiles_per_g8.sum())
    total_slots = num_tiles * 8
    within = (_excl_cumsum(raw_tiles_per_grp)
              - _excl_cumsum(tiles_per_g8)[hack8])
    g_tile0 = g8_base[hack8] + within

    gid_of = np.repeat(np.arange(n_grp), gsizes)
    gslot = g_tile0[gid_of] * 8 + slot_of  # global slot id

    vals = np.zeros((total_slots, _HACK), dtype=vals_in.dtype)
    res8 = np.zeros((total_slots, _HACK), np.int8)
    pt8 = np.zeros((total_slots, 128), np.int8)
    run_hi = np.full((total_slots, _HACK), -1, np.int8)
    run_lo = np.full((total_slots, _HACK), -1, np.int8)

    vals[gslot, lane_of] = vals_in[order]
    res8[gslot, lane_of] = res_s.astype(np.int8)
    pt8[gslot, res_s] = del_s.astype(np.int8)

    # runs: cells of one row within one slot are contiguous by
    # construction, but deferred cells reorder placement — find run
    # boundaries in PLACEMENT (slot, lane) order
    porder = np.lexsort((lane_of, gslot))
    gs_p = gslot[porder]
    row_p = rows_o[porder]
    lane_p = lane_of[porder]
    newrun = np.r_[True, (gs_p[1:] != gs_p[:-1]) | (row_p[1:] != row_p[:-1])]
    r_starts = np.flatnonzero(newrun)
    r_ends = np.r_[r_starts[1:], gs_p.size] - 1
    r_slot = gs_p[r_starts]
    r_out = (row_p[r_starts] % _HACK).astype(np.int64)
    run_hi[r_slot, r_out] = lane_p[r_ends].astype(np.int8)
    run_lo[r_slot, r_out] = (lane_p[r_starts] - 1).astype(np.int8)

    # --- per-tile scalars + per-layout-group superpage base tables -------
    tile_meta = np.zeros(num_tiles, np.int32)
    g_tiles_idx = np.repeat(g_tile0, raw_tiles_per_grp) + (
        np.arange(int(raw_tiles_per_grp.sum()))
        - np.repeat(_excl_cumsum(raw_tiles_per_grp), raw_tiles_per_grp))
    gidx_of_tile = np.repeat(np.arange(n_grp), raw_tiles_per_grp)
    tile_meta[g_tiles_idx] = (
        gidx_of_tile | ((g_hack[gidx_of_tile] % gh) << 20)).astype(np.int32)
    chunk_group = np.repeat(np.arange(num_groups, dtype=np.int32),
                            pad_tiles_per_g8 // ct)
    chunk_group = np.r_[chunk_group, np.int32(-1)]

    gI = np.searchsorted(g_G, Gu)
    bases = np.zeros((n_grp, K), np.int32)
    bases[gI, tbl_u] = (sup_u * 8).astype(np.int32)

    import jax.numpy as jnp

    return PcellWhell(
        values=jnp.asarray(vals),
        residue=jnp.asarray(res8),
        page_tab=jnp.asarray(pt8),
        run_hi=jnp.asarray(run_hi),
        run_lo=jnp.asarray(run_lo),
        tile_base=jnp.asarray(tile_meta),
        chunk_group=jnp.asarray(chunk_group),
        group_bases=jnp.asarray(bases.reshape(-1)),
        n_rows=n, n_cols=coo.n_cols, num_hacks=num_hacks,
        num_groups=num_groups, total_slots=total_slots, nnz=m,
        x_pages=x_pages, window_pages=8 * K,
        group_hacks=gh, chunk_tiles=ct,
    )
