"""COO → WHELL conversion (host-side, vectorised NumPy).

Builds the mixed-page windowed-HELL layout (see
:mod:`spgpu_tpu.formats.whell`).  Entries are grouped by (hack,
superpage); slots are assigned per-row ranks and the single layout
constraint — one page per (slot, residue) — is enforced by eviction
rounds that move conflicting entries to later slots.  Everything is
sort + run-length arithmetic over the whole entry set (the reference's
conversions are single-threaded element walks, ``hell.c:46-104``; ours
must convert multi-million-nnz matrices in seconds).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from spgpu_tpu.core import CHUNK_TILES as _CT
from spgpu_tpu.formats.coo import CooMatrix
from spgpu_tpu.formats.whell import WhellMatrix

__all__ = ["coo_to_whell", "degree_sort_perm", "local_degree_perm",
           "symmetric_relabel", "whell_update_values"]

_HACK = 128


def degree_sort_perm(coo: CooMatrix) -> np.ndarray:
    """Stored-row → original-row permutation sorting rows by descending
    nnz — the OELL ordering (``ell.c:85-157``)."""
    return np.argsort(-coo.row_lengths(), kind="stable").astype(np.int32)


def local_degree_perm(coo: CooMatrix, window: int = 1024) -> np.ndarray:
    """OELL's descending-degree ordering applied *within* ``window``-row
    blocks (new label → old label).

    Global degree sort (``ell.c:85-157``) homogenises hack widths but a
    symmetric relabel with it scrambles column locality — the thing the
    WHELL window layout feeds on.  Sorting only within 1024-row blocks
    moves every label by < ``window``, so bandwidth/span grow by at most
    2·``window`` while each 128-row hack still gets length-homogeneous
    rows: the heavy tail of a power-law degree distribution concentrates
    in one hack per window instead of widening every page group it
    touches.
    """
    lens = coo.row_lengths()
    n = coo.n_rows
    perm = np.empty(n, dtype=np.int32)
    for s in range(0, n, window):
        e = min(s + window, n)
        perm[s:e] = s + np.argsort(-lens[s:e], kind="stable")
    return perm


def symmetric_relabel(coo: CooMatrix, perm: np.ndarray) -> CooMatrix:
    """Relabel rows AND columns by the same permutation (``perm`` maps
    new label → old label): ``A' = P A Pᵀ``.

    The TPU-native alternative to OELL's per-product output scatter
    (``ell_spmv_base_template.cuh:274-282``): relabel the system once,
    solve in permuted space, un-permute the solution once — SPD and
    symmetry are preserved and the SpMV needs no permutation at all.
    """
    perm = np.asarray(perm, dtype=np.int64)
    inv = np.empty(coo.n_rows, dtype=np.int64)
    inv[perm[: coo.n_rows]] = np.arange(coo.n_rows)
    return CooMatrix(inv[coo.rows], inv[coo.cols], coo.values,
                     coo.n_rows, coo.n_cols)


def _excl_cumsum(a: np.ndarray) -> np.ndarray:
    out = np.zeros_like(a)
    np.cumsum(a[:-1], out=out[1:])
    return out


def coo_to_whell(
    coo: CooMatrix,
    row_perm: Optional[np.ndarray] = None,
    sort_rows: bool = False,
    dtype=None,
    return_plan: bool = False,
    ways: int = 1,
):
    """Build a :class:`WhellMatrix` from host COO triples.

    ``sort_rows=True`` applies the OELL descending-degree ordering before
    hacking (``row_perm`` wins if both are given); note the resulting
    per-product output scatter — prefer :func:`symmetric_relabel` (or
    :func:`local_degree_perm` + relabel) for solver use.  Duplicates are
    kept as separate cells (both contribute), matching ``cooToEll``
    (``ell.c:65-78``).

    ``return_plan=True`` additionally returns the per-entry cell map
    ``(slot, lane)`` so :func:`whell_update_values` can refresh values
    for a new matrix with the SAME sparsity pattern without re-running
    layout construction — the time-dependent-PDE analogue of the
    reference's ``spgpu?ellcsput`` update-in-place kernels
    (``ell_csput_base.cuh:44-73``).

    ``ways > 1`` splits every row into ``ways`` virtual rows (entries
    round-robined) before layout; the kernel output is reduced back by
    summing way groups.  Group widths are per-row MAXIMA, so spreading
    each row's entries over ``ways`` lanes smooths the max-vs-mean
    raggedness that drives padding on irregular matrices, at the cost of
    a ``ways``× larger output accumulator.
    """
    if ways > 1:
        if row_perm is not None or sort_rows or return_plan:
            raise ValueError("ways>1 is incompatible with row_perm/plan")
        order0 = np.lexsort((coo.cols, coo.rows))
        rows_o = coo.rows[order0]
        starts = np.flatnonzero(np.r_[True, rows_o[1:] != rows_o[:-1]])
        runs = np.diff(np.r_[starts, rows_o.size])
        k_in_row = np.arange(rows_o.size) - np.repeat(starts, runs)
        vrows = rows_o * ways + (k_in_row % ways)
        vcoo = CooMatrix(vrows, coo.cols[order0], coo.values[order0],
                         coo.n_rows * ways, coo.n_cols)
        out = coo_to_whell(vcoo, dtype=dtype)
        import dataclasses as _dc

        return _dc.replace(out, ways=ways)
    if row_perm is None and sort_rows:
        row_perm = degree_sort_perm(coo)
    if row_perm is not None:
        row_perm = np.asarray(row_perm, dtype=np.int32)
        inv = np.empty(coo.n_rows, dtype=np.int64)
        inv[row_perm[: coo.n_rows]] = np.arange(coo.n_rows)
        eff_rows = inv[coo.rows]
    else:
        eff_rows = coo.rows

    vals_in = coo.values if dtype is None else coo.values.astype(dtype)
    val_dtype = vals_in.dtype
    num_hacks = max(-(-coo.n_rows // _HACK), 1)
    num_pages = max(-(-coo.n_cols // 128), 1)
    nsp = -(-num_pages // 8)  # superpages (aligned 8-page windows)
    m = coo.nnz

    if m == 0:
        return _empty_whell(coo, num_hacks, nsp, val_dtype, row_perm)

    hack = (eff_rows // _HACK).astype(np.int64)
    lane = (eff_rows % _HACK).astype(np.int64)
    page = (coo.cols // 128).astype(np.int64)
    resid = (coo.cols % 128).astype(np.int64)
    spage = page // 8
    delta = (page % 8).astype(np.int8)

    # --- group per (hack, superpage); assign slots ----------------------
    G = hack * nsp + spage
    order = np.lexsort((coo.cols, eff_rows, G))  # by group, row, col
    Gs = G[order]
    res_s = resid[order]
    del_s = delta[order].astype(np.int64)

    # Slot assignment under the one layout constraint (one page per
    # (slot, residue)): native C++ first-fit when available; NumPy
    # eviction rounds otherwise (same constraint, more padding).
    from spgpu_tpu import native as _native

    k = _native.whell_assign(Gs, lane[order], res_s, del_s)
    if k is None:
        rows_s = eff_rows[order]
        rg_key_change = np.r_[True, (Gs[1:] != Gs[:-1])
                              | (rows_s[1:] != rows_s[:-1])]
        rg_starts = np.flatnonzero(rg_key_change)
        rg_of = np.cumsum(rg_key_change) - 1
        k = (np.arange(m) - rg_starts[rg_of]).astype(np.int64)
        rg_count = np.diff(np.r_[rg_starts, m])
        rg_top = rg_count.copy()
        for _round in range(64):
            key = (Gs * (k.max() + 1) + k) * 128 + res_s
            o = np.argsort(key, kind="stable")
            ks = key[o]
            grp = np.r_[True, ks[1:] != ks[:-1]]
            rep = np.repeat(del_s[o][grp],
                            np.diff(np.r_[np.flatnonzero(grp), ks.size]))
            conflict = np.zeros(m, dtype=bool)
            conflict[o] = del_s[o] != rep
            if not conflict.any():
                break
            ev = np.flatnonzero(conflict)
            ev = ev[np.argsort(rg_of[ev], kind="stable")]
            rg_ev = rg_of[ev]
            st = np.flatnonzero(np.r_[True, rg_ev[1:] != rg_ev[:-1]])
            within = np.arange(ev.size) - np.repeat(
                st, np.diff(np.r_[st, ev.size]))
            k[ev] = rg_top[rg_ev] + within
            np.maximum.at(rg_top, rg_ev, k[ev] + 1)
        else:  # terminal fallback: private slots for stragglers
            key = (Gs * (k.max() + 1) + k) * 128 + res_s
            o = np.argsort(key, kind="stable")
            ks = key[o]
            grp = np.r_[True, ks[1:] != ks[:-1]]
            rep = np.repeat(del_s[o][grp],
                            np.diff(np.r_[np.flatnonzero(grp), ks.size]))
            conflict = np.zeros(m, dtype=bool)
            conflict[o] = del_s[o] != rep
            ev = np.flatnonzero(conflict)
            k[ev] = k.max() + 1 + np.arange(ev.size)

    # --- group widths and slot layout -----------------------------------
    g_first = np.r_[True, Gs[1:] != Gs[:-1]]
    g_id = np.cumsum(g_first) - 1
    n_grp = g_id[-1] + 1
    W = np.zeros(n_grp, dtype=np.int64)
    np.maximum.at(W, g_id, k + 1)
    W8 = -(-W // 8) * 8  # groups pad to whole tiles (one window per tile)
    g_G = Gs[g_first]
    g_hack = g_G // nsp
    g_sp = g_G % nsp

    # hacks grouped by 8 for the output blocks; each 8-hack group's tile
    # count pads to whole grid chunks (per-hack padding would put a
    # CHUNK_TILES floor under every 128 rows).
    num_groups = -(-num_hacks // 8)
    raw_tiles_per_grp = W8 // 8
    hack8 = g_hack // 8
    tiles_per_g8 = np.zeros(num_groups, dtype=np.int64)
    np.add.at(tiles_per_g8, hack8, raw_tiles_per_grp)
    pad_tiles_per_g8 = np.maximum(-(-tiles_per_g8 // _CT) * _CT, _CT)
    g8_base = _excl_cumsum(pad_tiles_per_g8)
    num_tiles = int(pad_tiles_per_g8.sum())
    total_slots = num_tiles * 8
    within_t = (_excl_cumsum(raw_tiles_per_grp)
                - _excl_cumsum(tiles_per_g8)[hack8])
    g_tile0 = g8_base[hack8] + within_t

    # --- scatter entries -------------------------------------------------
    slot = g_tile0[g_id] * 8 + k
    vals = np.zeros((total_slots, _HACK), dtype=val_dtype)
    res8 = np.zeros((total_slots, _HACK), dtype=np.int8)
    pt8 = np.zeros((total_slots, 128), dtype=np.int8)
    lane_o = lane[order]
    vals[slot, lane_o] = vals_in[order]
    res8[slot, lane_o] = res_s.astype(np.int8)
    pt8[slot, res_s] = del_s.astype(np.int8)

    # --- per-tile scalars ------------------------------------------------
    tile_base = np.zeros(num_tiles, dtype=np.int32)
    tile_hh = np.zeros(num_tiles, dtype=np.int32)
    g_tiles_idx = np.repeat(g_tile0, raw_tiles_per_grp) + (
        np.arange(int(raw_tiles_per_grp.sum()))
        - np.repeat(_excl_cumsum(raw_tiles_per_grp), raw_tiles_per_grp))
    tile_base[g_tiles_idx] = np.repeat(
        (g_sp * 8).astype(np.int32), raw_tiles_per_grp)
    tile_hh[g_tiles_idx] = np.repeat(
        (g_hack % 8).astype(np.int32), raw_tiles_per_grp)
    chunk_group = np.repeat(np.arange(num_groups, dtype=np.int32),
                            pad_tiles_per_g8 // _CT)
    # pack hh (3 bits) above the base page (<= 15 bits): halves per-call
    # SMEM scalar staging AND the 1 MB SMEM budget (the size cap: two
    # int32-per-tile arrays overflow SMEM near 1M rows)
    tile_meta = (tile_base | (tile_hh << 16)).astype(np.int32)

    import jax.numpy as jnp

    perm_arr = None
    if row_perm is not None:
        perm_p = np.arange(num_groups * 8 * _HACK, dtype=np.int32)
        perm_p[: row_perm.size] = row_perm
        perm_arr = jnp.asarray(perm_p)

    out = WhellMatrix(
        values=jnp.asarray(vals),
        residue=jnp.asarray(res8),
        page_tab=jnp.asarray(pt8),
        tile_base=jnp.asarray(tile_meta),
        tile_hh=jnp.zeros((0,), jnp.int32),  # packed into tile_base
        chunk_group=jnp.asarray(chunk_group),
        row_perm=perm_arr,
        n_rows=coo.n_rows,
        n_cols=coo.n_cols,
        num_hacks=num_hacks,
        num_groups=num_groups,
        total_slots=total_slots,
        nnz=m,
        x_pages=nsp * 8,
    )
    if return_plan:
        # entry i of the ORIGINAL coo lives at cell (plan_slot[i], plan_lane[i])
        inv_order = np.empty(m, dtype=np.int64)
        inv_order[order] = np.arange(m)
        return out, (slot[inv_order], lane[np.arange(coo.nnz)])
    return out


def whell_update_values(a: WhellMatrix, plan, new_values) -> WhellMatrix:
    """Refresh the value slab for a matrix with the SAME pattern.

    ``plan`` is the ``(slot, lane)`` cell map from
    ``coo_to_whell(..., return_plan=True)``; ``new_values`` are in the
    original COO entry order.  Duplicate coordinates occupy distinct
    cells in WHELL (both contribute), so each entry updates its own
    cell.  The analogue of ``spgpu?ellcsput`` (which, note, ignores its
    ``alpha`` argument — ``ell_csput_base.cuh:44-73`` — a reference bug
    we don't replicate: this function plainly stores).
    """
    import jax.numpy as jnp

    slot, lane = plan
    vals = np.zeros((a.total_slots, _HACK), dtype=np.asarray(a.values).dtype)
    vals[slot, lane] = np.asarray(new_values, dtype=vals.dtype)
    return dataclasses_replace_values(a, jnp.asarray(vals))


def dataclasses_replace_values(a: WhellMatrix, values):
    import dataclasses

    return dataclasses.replace(a, values=values)


def _empty_whell(coo, num_hacks, nsp, val_dtype, row_perm):
    import jax.numpy as jnp

    num_groups = -(-num_hacks // 8)
    total = num_groups * _CT * 8
    perm_arr = None
    if row_perm is not None:
        perm_p = np.arange(num_groups * 8 * _HACK, dtype=np.int32)
        perm_p[: np.asarray(row_perm).size] = row_perm
        perm_arr = jnp.asarray(perm_p)
    return WhellMatrix(
        values=jnp.zeros((total, _HACK), val_dtype),
        residue=jnp.zeros((total, _HACK), jnp.int8),
        page_tab=jnp.zeros((total, 128), jnp.int8),
        tile_base=jnp.zeros((num_groups * _CT,), jnp.int32),
        tile_hh=jnp.zeros((num_groups * _CT,), jnp.int32),
        chunk_group=jnp.arange(num_groups, dtype=jnp.int32),
        row_perm=perm_arr,
        n_rows=coo.n_rows, n_cols=coo.n_cols, num_hacks=num_hacks,
        num_groups=num_groups, total_slots=total, nnz=0,
        x_pages=max(nsp * 8, 8),
    )
