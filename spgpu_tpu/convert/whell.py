"""COO → WHELL conversion (host-side, vectorised NumPy).

Builds the page-per-slot windowed-HELL layout (see
:mod:`spgpu_tpu.formats.whell`).  Entries are grouped by (hack, x-page);
the group for page ``p`` inside a hack spans ``max_row |{entries of that
row on page p}|`` slots, and each entry lands at (group base + its rank
within its row on that page, row % 128).  Everything is sort + run-length
arithmetic — no per-entry Python loop (the reference's conversions are
single-threaded element walks, ``hell.c:46-104``; ours must convert
multi-million-nnz matrices in seconds).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from spgpu_tpu.core import CHUNK_TILES as _CT
from spgpu_tpu.formats.coo import CooMatrix
from spgpu_tpu.formats.whell import WhellMatrix

__all__ = ["coo_to_whell", "degree_sort_perm", "local_degree_perm",
           "symmetric_relabel"]

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
) -> WhellMatrix:
    """Build a :class:`WhellMatrix` from host COO triples.

    ``sort_rows=True`` applies the OELL descending-degree ordering before
    hacking (``row_perm`` wins if both are given); note the resulting
    per-product output scatter — prefer :func:`symmetric_relabel` for
    solver use.  Duplicates are kept as separate cells (both contribute),
    matching ``cooToEll`` (``ell.c:65-78``).
    """
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
    m = coo.nnz

    if m == 0:
        return _empty_whell(coo, num_hacks, num_pages, val_dtype, row_perm)

    hack = (eff_rows // _HACK).astype(np.int64)
    lane = (eff_rows % _HACK).astype(np.int64)
    page = (coo.cols // 128).astype(np.int64)
    resid = (coo.cols % 128).astype(np.int64)

    # --- runs: one per (row, page) pair ---------------------------------
    order = np.lexsort((coo.cols, page, eff_rows))
    er_s, pg_s = eff_rows[order], page[order]
    new_run = np.r_[True, (er_s[1:] != er_s[:-1]) | (pg_s[1:] != pg_s[:-1])]
    run_of_entry = np.cumsum(new_run) - 1  # in sorted order
    run_starts = np.flatnonzero(new_run)
    k_sorted = np.arange(m) - run_starts[run_of_entry]  # rank within run
    run_count = np.diff(np.r_[run_starts, m])
    run_hack = hack[order][run_starts]
    run_page = pg_s[run_starts]

    # --- groups: one per (hack, page); width = max run count ------------
    rkey = run_hack * num_pages + run_page
    ro = np.argsort(rkey, kind="stable")
    rk_s = rkey[ro]
    new_grp = np.r_[True, rk_s[1:] != rk_s[:-1]]
    grp_sorted_id = np.cumsum(new_grp) - 1
    n_grp = grp_sorted_id[-1] + 1
    grp_of_run = np.empty(run_count.size, dtype=np.int64)
    grp_of_run[ro] = grp_sorted_id
    g_width = np.zeros(n_grp, dtype=np.int64)
    np.maximum.at(g_width, grp_of_run, run_count)
    g_key = rk_s[new_grp]
    g_hack = g_key // num_pages
    g_page = g_key % num_pages

    # --- naive slot layout: groups contiguous per hack -------------------
    hack_tot = np.zeros(num_hacks, dtype=np.int64)
    np.add.at(hack_tot, g_hack, g_width)
    # within-hack exclusive cumsum of group widths (groups sorted by hack)
    within = _excl_cumsum(g_width) - _excl_cumsum(hack_tot)[g_hack]
    g_base = _excl_cumsum(hack_tot)[g_hack] + within  # naive (unpadded) base
    n_naive = int(hack_tot.sum())

    # per-naive-slot page and hack
    sp = np.empty(n_naive, dtype=np.int64)
    sh = np.empty(n_naive, dtype=np.int64)
    gw_base = _excl_cumsum(g_width)
    flat = np.repeat(g_base, g_width) + (np.arange(int(g_width.sum()))
                                         - np.repeat(gw_base, g_width))
    sp[flat] = np.repeat(g_page, g_width)
    sh[flat] = np.repeat(g_hack, g_width)

    # --- chunk naive slots into 8-slot tiles with page span <= 8 ---------
    # pages ascend within each hack, so span check is p - tile_base <= 7.
    new_slot = np.empty(n_naive, dtype=np.int64)
    tile_base_l, tile_hack_l = [], []
    fill, cur_hack = 8, -1  # force a new tile at the first slot
    base = 0
    base_cap = max(num_pages - 8, 0)  # window must stay inside x2d
    for i in range(n_naive):
        p_i, h_i = sp[i], sh[i]
        if fill == 8 or h_i != cur_hack or p_i - base > 7:
            base = min(p_i, base_cap)
            tile_base_l.append(base)
            tile_hack_l.append(h_i)
            cur_hack, fill = h_i, 0
        new_slot[i] = (len(tile_base_l) - 1) * 8 + fill
        fill += 1
    tile_hack_a = np.asarray(tile_hack_l, dtype=np.int64)
    tile_base_a = np.asarray(tile_base_l, dtype=np.int64)
    t_order = np.argsort(tile_hack_a, kind="stable")

    # --- pad each hack to whole 8-tile chunks (the kernel's grid unit) --
    raw_tiles_per_hack = np.bincount(tile_hack_a, minlength=num_hacks)
    pad_tiles_per_hack = np.maximum(-(-raw_tiles_per_hack // _CT) * _CT, _CT)
    hack_tile_base = _excl_cumsum(pad_tiles_per_hack)
    num_tiles = int(pad_tiles_per_hack.sum())
    total_slots = num_tiles * 8
    # final tile index of each raw tile: hack base + rank within hack
    rank_in_hack = np.empty(t_order.size, dtype=np.int64)
    rank_in_hack[t_order] = (np.arange(t_order.size)
                             - _excl_cumsum(raw_tiles_per_hack)[tile_hack_a[t_order]])
    tile_final = hack_tile_base[tile_hack_a] + rank_in_hack

    # --- scatter entries -------------------------------------------------
    ns_sorted = new_slot[g_base[grp_of_run[run_of_entry]] + k_sorted]
    slot_final = tile_final[ns_sorted // 8] * 8 + ns_sorted % 8
    packed = ((page[order] - tile_base_a[ns_sorted // 8]) * 128
              + resid[order]).astype(np.int32)
    vals = np.zeros((total_slots, _HACK), dtype=val_dtype)
    # padding cells must still carry their slot's page (residue 0): the
    # sublane gather reads the page column at ARBITRARY lanes, so every
    # lane of a slot must agree on the page.
    slot_delta = np.zeros(total_slots, dtype=np.int32)
    naive_final = tile_final[new_slot // 8] * 8 + new_slot % 8
    slot_delta[naive_final] = (sp - tile_base_a[new_slot // 8]).astype(np.int32)
    res = np.broadcast_to(slot_delta[:, None] * 128, (total_slots, _HACK)).copy()
    lane_sorted = lane[order]
    vals[slot_final, lane_sorted] = vals_in[order]
    res[slot_final, lane_sorted] = packed

    # per-final-tile scalars (pad tiles: base 0, value 0 -> contribute 0)
    tile_base_f = np.zeros(num_tiles, dtype=np.int32)
    tile_base_f[tile_final] = tile_base_a.astype(np.int32)
    tile_hack_f = np.repeat(np.arange(num_hacks, dtype=np.int32),
                            pad_tiles_per_hack)
    chunk_hack = tile_hack_f[::_CT].copy()
    hack_tile_off = np.zeros(num_hacks + 1, dtype=np.int32)
    np.cumsum(pad_tiles_per_hack, out=hack_tile_off[1:])

    import jax.numpy as jnp

    perm_arr = None
    if row_perm is not None:
        perm_p = np.arange(num_hacks * _HACK, dtype=np.int32)
        perm_p[: row_perm.size] = row_perm
        perm_arr = jnp.asarray(perm_p)

    return WhellMatrix(
        values=jnp.asarray(vals),
        residue=jnp.asarray(res),
        tile_base=jnp.asarray(tile_base_f),
        tile_hack=jnp.asarray(tile_hack_f),
        chunk_hack=jnp.asarray(chunk_hack),
        hack_tile_off=jnp.asarray(hack_tile_off),
        row_perm=perm_arr,
        n_rows=coo.n_rows,
        n_cols=coo.n_cols,
        num_hacks=num_hacks,
        total_slots=total_slots,
        nnz=m,
        x_pages=max(num_pages, 8),
    )


def _empty_whell(coo, num_hacks, num_pages, val_dtype, row_perm):
    import jax.numpy as jnp

    total = num_hacks * _CT * 8
    perm_arr = None
    if row_perm is not None:
        perm_p = np.arange(num_hacks * _HACK, dtype=np.int32)
        perm_p[: np.asarray(row_perm).size] = row_perm
        perm_arr = jnp.asarray(perm_p)
    return WhellMatrix(
        values=jnp.zeros((num_hacks * _CT * 8, _HACK), val_dtype),
        residue=jnp.zeros((num_hacks * _CT * 8, _HACK), jnp.int32),
        tile_base=jnp.zeros((num_hacks * _CT,), jnp.int32),
        tile_hack=jnp.repeat(jnp.arange(num_hacks, dtype=jnp.int32), _CT),
        chunk_hack=jnp.arange(num_hacks, dtype=jnp.int32),
        hack_tile_off=jnp.asarray(
            np.arange(num_hacks + 1, dtype=np.int32) * _CT),
        row_perm=perm_arr,
        n_rows=coo.n_rows, n_cols=coo.n_cols, num_hacks=num_hacks,
        total_slots=total, nnz=0, x_pages=max(num_pages, 8),
    )
