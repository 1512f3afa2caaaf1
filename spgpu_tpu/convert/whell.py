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

#: x budget for the kernel's persistent VMEM scratch; larger lane-space
#: column counts split into window-aligned panels (PanelledWhell)
_PANEL_X_BYTES = 11 * 2 ** 20
#: SMEM budget (in int32 words) for the kernel's prefetched scalar
#: operands (tile_base + chunk_group + group_bases).  The chip has 1 MiB
#: of SMEM; 180k words = 720 KiB leaves headroom for Mosaic's own
#: scalars.  Beyond it the matrix is row-segmented (SegmentedWhell).
_SMEM_SCALAR_BUDGET_WORDS = 180_000

#: refuse to allocate a padded value/index slab beyond this (runaway
#: padding on structure-less matrices); env-overridable
_SLAB_GUARD_BYTES = int(__import__("os").environ.get(
    "SPGPU_TPU_SLAB_GUARD_BYTES", 16 * 2 ** 30))


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
    packed: bool = False,
    window_pages: Optional[int] = None,
    lane_capacity: Optional[float] = None,
    panel_x_bytes: Optional[int] = None,
    scattered: Optional[bool] = None,
    group_hacks: Optional[int] = None,
    chunk_tiles: Optional[int] = None,
    row_degrees: Optional[np.ndarray] = None,
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

    ``packed=True`` (square matrices) builds the packed-lane layout:
    each row gets a lane SEGMENT sized ``ceil(degree / lane_capacity)``
    — heavy rows span many lanes, light rows one — and consecutive rows
    are binned into 128-lane hacks by weight.  This removes the
    max-vs-mean raggedness that costs classic WHELL ~6x padding on
    power-law degree profiles (measured ~2.1-2.5x packed).  Rows AND
    columns are relabelled into "lane space" (order-preserving with
    per-hack gaps; phantom coordinates are zero): ``a.embed`` /
    ``a.extract`` map vectors in and out, and iterative solvers should
    run entirely in lane space.  ``window_pages`` (8/16/32) widens the
    per-tile x window via an in-kernel select tree: wider windows mean
    fewer (hack, window) groups and less padding for a few extra vector
    ops per tile.

    ``row_degrees`` (packed only) overrides the per-row degree vector
    that sizes lane segments — with an explicit ``lane_capacity`` this
    PINS the lane map, so two conversions of entry SUBSETS of one
    matrix (e.g. interior/exterior splits for halo-overlap scheduling,
    :mod:`spgpu_tpu.parallel.partition_packed`) produce slabs sharing
    one lane space whose products sum exactly.

    ``group_hacks`` / ``chunk_tiles`` override the measured-default
    packed-layout geometry (output group size in hacks; tiles per grid
    step).  The defaults are the honest chip-sweep optima and safe on
    VMEM; gh=1024 measured +1.7% on the 262k flagship but its 8.4 MB
    accumulator scratch leaves so little scoped-VMEM headroom that
    same-size matrices with slightly larger lane spaces fail to compile
    (measured) — hence opt-in only.
    """
    if packed:
        if row_perm is not None or sort_rows or ways != 1:
            raise ValueError("packed=True is incompatible with "
                             "row_perm/sort_rows/ways")
        vdt = np.dtype(coo.values.dtype if dtype is None else dtype)
        if return_plan and np.issubdtype(vdt, np.complexfloating):
            raise ValueError("return_plan is not supported for complex "
                             "packed matrices (convert anew)")
        if np.issubdtype(vdt, np.complexfloating):
            # C/Z: two real-plane conversions sharing the deterministic
            # layout (formats.whell.WhellComplex); Z planes are dd
            from spgpu_tpu.formats.whell import WhellComplex

            real_dt = np.float64 if vdt == np.complex128 else np.float32
            re = CooMatrix(coo.rows, coo.cols,
                           np.real(coo.values).astype(real_dt),
                           coo.n_rows, coo.n_cols)
            im = CooMatrix(coo.rows, coo.cols,
                           np.imag(coo.values).astype(real_dt),
                           coo.n_rows, coo.n_cols)
            ar = coo_to_whell(re, packed=True, window_pages=window_pages,
                              lane_capacity=lane_capacity,
                              panel_x_bytes=panel_x_bytes,
                              scattered=scattered, group_hacks=group_hacks,
                              chunk_tiles=chunk_tiles)
            ai = coo_to_whell(im, packed=True, window_pages=window_pages,
                              lane_capacity=lane_capacity,
                              panel_x_bytes=panel_x_bytes,
                              scattered=scattered, group_hacks=group_hacks,
                              chunk_tiles=chunk_tiles)
            return WhellComplex(ar=ar, ai=ai, n_rows=ar.n_rows,
                                n_cols=ar.n_cols, orig_rows=coo.n_rows,
                                nnz=coo.nnz)
        is_dd_vals = np.dtype(
            coo.values.dtype if dtype is None else dtype) == np.float64
        if scattered is None:
            scattered = not is_dd_vals  # dd kernels keep aligned windows
        est_tiles = max(1, coo.nnz // 1024)
        num_hacks = -(-coo.n_rows // 128)
        # measured geometry sweet spots on the 262k-row FEM profile
        # (honest chip sweeps, BASELINE.md / doc/DESIGN.md).  Scattered
        # (r2b): K=4 per-group superpage tables, 512-hack groups,
        # 128-tile chunks -> pad 1.74x, 93 GFLOPS.  Aligned windows:
        # gh=128/ct=256 -> pad 2.47x, 76.5.  Small matrices scale the
        # geometry down so the per-group chunk floor doesn't dominate;
        # dd kernels unroll ~4x more ops per tile so their chunks stay
        # small (<=32 tiles) to keep the Mosaic compile tractable.
        # dd sweep (1.3M-nnz Laplacian, honest chip timing): gh=32/ct=16
        # 12.3 GFLOPS pad 2.40; gh=128/ct=32 16.0 GFLOPS pad 2.00.
        if is_dd_vals:
            ct = 32 if est_tiles >= 128 else 16
        elif scattered:
            ct = 128 if est_tiles >= 512 else (64 if est_tiles >= 128 else 32)
        elif est_tiles >= 2048:
            ct = 256
        elif est_tiles >= 512:
            ct = 128
        elif est_tiles >= 128:
            ct = 64
        else:
            ct = 32
        if is_dd_vals:
            # r5 re-sweep AFTER the scan-free flush (DESIGN §2c-3): the
            # old gh=128 optimum was flush-bound; with the flush cheap,
            # bigger groups win — lap512 chip, interleaved: gh=128
            # 22.5 / gh=256 24.3 / gh=512 27.2 GFLOPS (ct=16: 18.8)
            gh = (512 if num_hacks >= 512
                  else (128 if num_hacks >= 128 else 32))
        elif scattered and num_hacks >= 512:
            gh = 512
        elif num_hacks >= 128:
            gh = 128
        else:
            gh = 32
        if group_hacks is not None:
            gh = group_hacks
        if chunk_tiles is not None:
            ct = chunk_tiles
        return _coo_to_whell_packed(coo, window_pages or 32, lane_capacity,
                                    dtype, group_hacks=gh,
                                    chunk_tiles=ct,
                                    panel_x_bytes=panel_x_bytes,
                                    return_plan=return_plan,
                                    scattered=scattered,
                                    row_degrees=row_degrees)
    if row_degrees is not None:
        raise ValueError("row_degrees requires packed=True")
    window_pages = window_pages or 8
    if window_pages != 8:
        raise ValueError("window_pages > 8 requires packed=True")
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


def _coo_to_whell_packed(
    coo: CooMatrix,
    window_pages: int,
    lane_capacity: Optional[float],
    dtype,
    group_hacks: int = 16,
    chunk_tiles: int = 32,
    panel_x_bytes: Optional[int] = None,
    return_plan: bool = False,
    scattered: bool = False,
    supers_per_tile: Optional[int] = None,
    row_degrees: Optional[np.ndarray] = None,
) -> WhellMatrix:
    """Packed-lane WHELL builder (see :func:`coo_to_whell` docstring).

    Layout summary: row ``r`` owns lanes ``[lane_start_r, lane_start_r +
    d_r)`` of its hack; entry ``t`` (col-sorted rank within (row,
    window)) lands at lane ``lane_start_r + t % d_r``, slot ``t // d_r``
    (first-fit bumped on residue/page conflicts).  The kernel reduces
    lane segments at group-flush time with a prefix scan + compaction
    gather driven by the ``seg_lo``/``seg_hi`` slabs.
    """
    if coo.n_rows != coo.n_cols:
        raise ValueError("packed WHELL requires a square matrix (rows and "
                         "columns share the lane-space labels)")
    if window_pages not in (8, 16, 32):
        raise ValueError("window_pages must be 8, 16 or 32")
    w = window_pages
    n, m = coo.n_rows, coo.nnz
    vals_in = coo.values if dtype is None else coo.values.astype(dtype)
    # fp64 values -> double-float slabs (hi/lo fp32 pairs, ops/dd.py);
    # the slab is built in float64 and split after the scatter
    is_dd = np.dtype(vals_in.dtype) == np.float64
    if scattered and is_dd:
        raise ValueError("scattered windows are not yet supported for dd "
                         "(float64) value slabs; pass scattered=False")
    val_dtype = np.dtype(np.float64) if is_dd else vals_in.dtype

    deg = (np.asarray(row_degrees, np.int64) if row_degrees is not None
           else coo.row_lengths().astype(np.int64))
    if row_degrees is not None and deg.shape != (n,):
        raise ValueError(f"row_degrees must have shape ({n},)")
    if lane_capacity is None:
        # measured sweet spot on power-law FEM profiles: ~1.25x the mean
        # degree balances segment padding against hack-count growth
        lane_capacity = max(8.0, 1.25 * m / max(n, 1))
    d = np.clip(np.ceil(deg / lane_capacity).astype(np.int64), 1, 128)

    from spgpu_tpu import native as _native

    nat = _native.whell_hack_fill(d) if n else None
    if nat is None:
        hack_of_row = np.zeros(max(n, 1), np.int64)
        lane_start = np.zeros(max(n, 1), np.int64)
        h = 0
        acc = 0
        for r in range(n):
            if acc + d[r] > 128:
                h += 1
                acc = 0
            hack_of_row[r] = h
            lane_start[r] = acc
            acc += d[r]
        num_hacks = h + 1 if n else 1
    else:
        num_hacks, hack_of_row, lane_start = nat
    num_hacks = max(num_hacks, 1)
    # hack_of_row is non-decreasing (greedy fill walks rows in order)
    hfirst = np.r_[True, hack_of_row[1:n] != hack_of_row[:n - 1]]
    first_idx = np.flatnonzero(hfirst)
    out_pos = (np.arange(n, dtype=np.int64)
               - np.repeat(first_idx, np.diff(np.r_[first_idx, n])))
    lane_of_row = (hack_of_row[:n] * _HACK + out_pos).astype(np.int32)

    gh, ct = group_hacks, chunk_tiles
    n_lane = num_hacks * _HACK
    if scattered:
        # scattered windows: x only needs superpage (8-page) alignment
        x_pages = max(-(-num_hacks // 8) * 8, 8)
    else:
        x_pages = max(-(-num_hacks // w) * w, w)
    # Scoped-VMEM guard: the kernel stages a (panel) x block of up to
    # the panel budget, the dual-plane accumulator scratch (gh * 8 KiB;
    # dd doubles it for the hi/lo planes), and double-buffered chunk
    # slabs inside the ~16 MiB scoped-VMEM limit.  gh=512 next to a
    # 10.3 MiB x panel measured 17.3M scoped (compile OOM, 4M-row FEM);
    # scratch + x must fit 11.5 MiB (the observed ~3 MiB of chunk/misc
    # sits on top).  The default resolves the conflict by SHRINKING THE
    # PANELS, not the group size: the 4M-class chip sweep measured 37.0
    # GFLOPS at gh=512 / 7.3 MiB panels vs 24.0 at the gh-clamped
    # 11 MiB panels (group-count chunk floors dominate the padding).
    # An explicit panel_x_bytes is respected and gh shrinks instead.
    _vmem_cap = int(11.5 * 2**20)
    _scratch_per_hack = 8192 * (2 if is_dd else 1)
    budget_eff = panel_x_bytes or _PANEL_X_BYTES
    if panel_x_bytes is None:
        budget_eff = min(budget_eff,
                         max(_vmem_cap - gh * _scratch_per_hack, 4 * 2**20))
    _x_eff = min(x_pages * 128 * (8 if is_dd else 4), budget_eff)
    while gh > 32 and gh * _scratch_per_hack + _x_eff > _vmem_cap:
        gh //= 2
    num_groups = -(-num_hacks // gh)

    import jax.numpy as jnp

    seg_lo = np.full((num_groups * gh, _HACK), -1, dtype=np.int8)
    seg_hi = np.full((num_groups * gh, _HACK), -1, dtype=np.int8)
    seg_lo[hack_of_row[:n], out_pos] = (lane_start[:n] - 1).astype(np.int8)
    seg_hi[hack_of_row[:n], out_pos] = (lane_start[:n] + d[:n] - 1).astype(np.int8)
    # width-1 segments everywhere (stencil/banded degree profiles):
    # the kernel flush can skip the lane prefix scan + one compaction
    # gather (r5, DESIGN §2c-3 — the dd flush's scan was 60% of the
    # whole dd kernel)
    unit_segs = bool(np.all(d[:n] == 1)) if n else True

    if m == 0:
        total = num_groups * ct * 8
        if return_plan:
            e = np.zeros(0, np.int64)
            return WhellMatrix(
                values=jnp.zeros((total, _HACK),
                                 jnp.float32 if is_dd else val_dtype),
                values_lo=(jnp.zeros((total, _HACK), jnp.float32)
                           if is_dd else None),
                residue=jnp.zeros((total, _HACK), jnp.int8),
                page_tab=jnp.zeros((total, 128), jnp.int8),
                tile_base=jnp.zeros((num_groups * ct,), jnp.int32),
                chunk_group=jnp.asarray(
                    np.r_[np.arange(num_groups, dtype=np.int32), -1]),
                row_perm=None, n_rows=n_lane, n_cols=n_lane,
                num_hacks=num_hacks, num_groups=num_groups,
                total_slots=total, nnz=0, x_pages=x_pages,
                seg_lo=jnp.asarray(seg_lo), seg_hi=jnp.asarray(seg_hi),
                lane_of_row=jnp.asarray(lane_of_row),
                window_pages=(8 * (supers_per_tile or max(w // 8, 1)) if scattered else w), orig_rows=n,
                group_hacks=gh, chunk_tiles=ct,
            ), (e, e, e)
        return WhellMatrix(
            values=jnp.zeros((total, _HACK), jnp.float32 if is_dd else val_dtype),
            values_lo=(jnp.zeros((total, _HACK), jnp.float32) if is_dd else None),
            residue=jnp.zeros((total, _HACK), jnp.int8),
            page_tab=jnp.zeros((total, 128), jnp.int8),
            tile_base=jnp.zeros((num_groups * ct,), jnp.int32),
            chunk_group=jnp.asarray(
                np.r_[np.arange(num_groups, dtype=np.int32), -1]),
            row_perm=None,
            n_rows=n_lane, n_cols=n_lane, num_hacks=num_hacks,
            num_groups=num_groups, total_slots=total, nnz=0,
            x_pages=x_pages,
            seg_lo=jnp.asarray(seg_lo), seg_hi=jnp.asarray(seg_hi),
            lane_of_row=jnp.asarray(lane_of_row),
            window_pages=(8 * (supers_per_tile or max(w // 8, 1)) if scattered else w), orig_rows=n,
            group_hacks=gh, chunk_tiles=ct,
        )

    cols_l32 = lane_of_row[coo.cols]  # int32, lane-space columns
    nwin = x_pages // w
    hack = hack_of_row[coo.rows]
    x_entry_bytes = 8 if is_dd else 4  # dd stages both planes
    budget = budget_eff  # panel budget resolved by the VMEM guard above
    if scattered:
        # --- scattered-window grouping -------------------------------
        # A group's x window is a SET of up to K independently-based
        # superpages (8 aligned pages each), not one contiguous aligned
        # window: rank each hack's touched superpages and bin ranks by
        # K.  A hack whose columns cluster locally AND hit a far hub
        # block then needs ONE group instead of one per aligned window
        # — the W->tile rounding waste collapses (doc/DESIGN.md §2d).
        # K tables per tile; default 4 (K=8 gave the same padding but
        # +4 gathers/selects per tile measured -14% — the kernel is
        # vector-op-bound, doc/DESIGN.md §2d)
        K = supers_per_tile or max(w // 8, 1)
        nsup_tot = x_pages // 8
        budget_pages = max((budget // (128 * x_entry_bytes)) // 8, 1) * 8
        sup_per_panel = budget_pages // 8
        n_panels = max(-(-nsup_tot // sup_per_panel), 1) \
            if x_pages > budget_pages else 1
        page_e = cols_l32.astype(np.int64) >> 7
        sup_e = page_e >> 3
        # key = (hack, superpage); the panel is DERIVED from the
        # superpage, so the key space is num_hacks * nsup_tot — small
        # enough for an occupancy-table uniquification (np.unique with
        # return_inverse sorts 2x m and cost ~15 s at 26.8M nnz)
        ukey = hack * nsup_tot + sup_e
        keyspace = int(num_hacks) * nsup_tot
        if keyspace <= 4 * m + (1 << 20):
            occ = np.zeros(keyspace, dtype=bool)
            occ[ukey] = True
            uk = np.flatnonzero(occ)
            del occ
            lookup = "lut"
        else:
            uk = np.unique(ukey)
            lookup = "searchsorted"
        sup_u = uk % nsup_tot
        u_hp = ((uk // nsup_tot) * n_panels
                + (sup_u // sup_per_panel if n_panels > 1 else 0))
        first = np.r_[True, u_hp[1:] != u_hp[:-1]]
        starts = np.flatnonzero(first)
        rank_u = (np.arange(uk.size)
                  - np.repeat(starts, np.diff(np.r_[starts, uk.size])))
        maxbins = int(rank_u.max()) // K + 1
        G_u = u_hp * maxbins + rank_u // K
        tbl_u = rank_u % K
        # per-entry (G, table) via a packed per-key code; 3-bit table
        # field so the unpack is shift/mask (np.int64 // and % are
        # scalar-loop slow — 10 s at 26.8M nnz, measured)
        code_u = (G_u << 3) | tbl_u
        if lookup == "lut":
            lut = np.zeros(keyspace, dtype=np.int64)
            lut[uk] = code_u
            code = lut[ukey]
            del lut
        else:
            code = code_u[np.searchsorted(uk, ukey)]
        G = code >> 3
        dlt8 = (((code & 7) << 3) | (page_e & 7)).astype(np.int8)
        panel_u = u_hp % n_panels
    else:
        G = hack * nwin + (cols_l32.astype(np.int64) >> 7) // w

    # entries must sort by (G, row, col).  A full 3-key lexsort costs 3
    # stable passes (~9 s at 12M nnz); instead canonicalise to (row,
    # col) order once (already true for sum_duplicates()/fixture COOs —
    # detected in O(m)) and do ONE stable sort by G, which preserves the
    # (row, col) suborder.
    rsorted = coo.rows[1:] >= coo.rows[:-1]
    if np.all(rsorted) and np.all(
            (coo.rows[1:] > coo.rows[:-1]) | (coo.cols[1:] >= coo.cols[:-1])):
        order = np.argsort(G, kind="stable")
    else:
        pre = np.argsort(coo.rows * np.int64(coo.n_cols) + coo.cols,
                         kind="stable")
        order = pre[np.argsort(G[pre], kind="stable")]

    nat = None
    if scattered:
        # group boundaries precomputed so the C++ first-fit can run
        # groups in parallel (they share no state)
        Gs_all = G[order]
        g_change = np.r_[True, Gs_all[1:] != Gs_all[:-1]]
        g_starts = np.flatnonzero(g_change)
        natp = _native.whell_gather_assign_par(
            order, coo.rows, cols_l32, d, lane_start, dlt8,
            np.r_[g_starts, m])
        if natp is not None:
            k, vlane, res_s, g_id, W = natp
            del_s = dlt8[order]
            g_G = Gs_all[g_starts]
            nat = True
    else:
        nat = _native.whell_gather_assign(
            order, coo.rows, cols_l32, d, lane_start, hack_of_row, nwin, w)
        if nat is not None:
            # fused gather + first-fit + group widths (one C++ pass)
            _ng, k, vlane, res_s, del_s, g_id, W, g_G = nat
    if nat is None:
        Gs = G[order]
        rows_s = coo.rows[order]
        cl_s = cols_l32[order].astype(np.int64)
        res_s = (cl_s & 127).astype(np.int8)
        del_s = (dlt8[order] if scattered
                 else ((cl_s >> 7) % w).astype(np.int8))
        dr = d[rows_s]
        # NumPy fallback: round-robin slots, bump whole-row conflicts to
        # fresh slots (lanes of different rows are disjoint so only
        # residue/page conflicts arise)
        rg_change = np.r_[True,
                          (Gs[1:] != Gs[:-1]) | (rows_s[1:] != rows_s[:-1])]
        rg_starts = np.flatnonzero(rg_change)
        t_rank = np.arange(m, dtype=np.int64) - np.repeat(
            rg_starts, np.diff(np.r_[rg_starts, m]))
        vlane = lane_start[rows_s] + t_rank % dr
        k = t_rank // dr
        rg_of = np.cumsum(rg_change) - 1
        rg_top = np.zeros(rg_of[-1] + 1, dtype=np.int64)
        np.maximum.at(rg_top, rg_of, k + 1)
        del_i = del_s.astype(np.int64)
        for _round in range(64):
            key = (Gs * (k.max() + 1) + k) * 128 + res_s
            o = np.argsort(key, kind="stable")
            ks = key[o]
            grp = np.r_[True, ks[1:] != ks[:-1]]
            rep = np.repeat(del_i[o][grp],
                            np.diff(np.r_[np.flatnonzero(grp), ks.size]))
            conflict = np.zeros(m, dtype=bool)
            conflict[o] = del_i[o] != rep
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
        else:
            key = (Gs * (k.max() + 1) + k) * 128 + res_s
            o = np.argsort(key, kind="stable")
            ks = key[o]
            grp = np.r_[True, ks[1:] != ks[:-1]]
            rep = np.repeat(del_i[o][grp],
                            np.diff(np.r_[np.flatnonzero(grp), ks.size]))
            conflict = np.zeros(m, dtype=bool)
            conflict[o] = del_i[o] != rep
            ev = np.flatnonzero(conflict)
            k[ev] = k.max() + 1 + np.arange(ev.size)
        g_first = np.r_[True, Gs[1:] != Gs[:-1]]
        g_id = np.cumsum(g_first) - 1
        W = np.maximum.reduceat(k + 1, np.flatnonzero(g_first))
        g_G = Gs[g_first]

    vals_nat = (vals_in if vals_in.dtype == val_dtype
                else vals_in.astype(val_dtype))
    seg_lo_j = jnp.asarray(seg_lo)
    seg_hi_j = jnp.asarray(seg_hi)
    lane_of_row_j = jnp.asarray(lane_of_row)

    bases_full = None
    if scattered:
        # per-layout-group superpage base table: group g's table j holds
        # the (panel-relative) first page of its j-th ranked superpage
        gI = np.searchsorted(g_G, G_u)
        bases_full = np.zeros((g_G.size, K), np.int32)
        bases_full[gI, tbl_u] = (
            sup_u * 8 - panel_u * sup_per_panel * 8).astype(np.int32)

    def build_panel(gsel, win_off, pages_p, cols_p):
        """Build one column panel's WhellMatrix from the group subset
        ``gsel`` (its windows shifted by ``win_off``).  Shares the lane
        space / seg slabs with every other panel; per-panel products sum
        (the segment flush is linear in the accumulated values)."""
        bases_p = None
        if gsel is None:  # single panel: no subset copies
            k_p, vlane_p, res_p, del_p, gid_p = k, vlane, res_s, del_s, g_id
            W_p, gG_p = W, g_G
            order_p = order
            bases_p = bases_full
        else:
            esel = gsel[g_id]
            k_p = k[esel]
            vlane_p = vlane[esel]
            res_p = res_s[esel]
            del_p = del_s[esel]
            gmap = np.cumsum(gsel) - 1
            gid_p = gmap[g_id[esel]]
            W_p = W[gsel]
            gG_p = g_G[gsel]
            order_p = order[esel]
            if bases_full is not None:
                bases_p = bases_full[gsel]
        if W_p.size == 0:
            W_p = np.zeros(1, np.int64)
            gG_p = np.zeros(1, np.int64)
            if scattered:
                bases_p = np.zeros((1, K), np.int32)
        W8 = -(-W_p // 8) * 8
        if scattered:
            g_hack = gG_p // maxbins // n_panels
            g_meta = np.arange(W_p.size, dtype=np.int64)  # local group idx
        else:
            g_hack = gG_p // nwin
            g_win = gG_p % nwin - win_off

        raw_tiles_per_grp = W8 // 8
        hack8 = g_hack // gh
        tiles_per_g8 = np.zeros(num_groups, dtype=np.int64)
        np.add.at(tiles_per_g8, hack8, raw_tiles_per_grp)
        pad_tiles_per_g8 = np.maximum(-(-tiles_per_g8 // ct) * ct, ct)
        g8_base = _excl_cumsum(pad_tiles_per_g8)
        num_tiles = int(pad_tiles_per_g8.sum())
        total_slots = num_tiles * 8
        # Guard: a matrix with no column locality defeats every windowed
        # layout (each entry lands in its own (hack, superpage) group —
        # measured pad ~32x on uniformly-random 250k/26.8-per-row COO).
        # Warn on bad padding; refuse to allocate a runaway slab.  The
        # portable paths (coo_to_hell + XLA spmv, or solvers.solve()'s
        # auto-selection) handle such matrices without the blowup.
        slab_bytes = total_slots * _HACK * (val_dtype.itemsize + 2)
        pad_now = total_slots * _HACK / max(k_p.size, 1)
        if slab_bytes > _SLAB_GUARD_BYTES:
            raise ValueError(
                f"packed WHELL slab would be {slab_bytes/2**30:.1f} GiB "
                f"(padding {pad_now:.0f}x nnz): this matrix has too "
                "little column locality for a windowed layout. Use "
                "symmetric_relabel/local_degree_perm first, a portable "
                "format (coo_to_hell), or solvers.solve() which "
                "auto-selects; raise SPGPU_TPU_SLAB_GUARD_BYTES to force."
            )
        if pad_now > 8.0 and k_p.size > 100_000:
            import warnings

            warnings.warn(
                f"packed WHELL padding is {pad_now:.1f}x nnz — the "
                "matrix's column structure suits the windowed layout "
                "poorly; consider a relabel or another format",
                stacklevel=3)
        within_t = (_excl_cumsum(raw_tiles_per_grp)
                    - _excl_cumsum(tiles_per_g8)[hack8])
        g_tile0 = g8_base[hack8] + within_t

        nat_sc = _native.whell_scatter_slabs(
            order_p, vals_nat, g_tile0, gid_p, k_p, vlane_p, res_p, del_p,
            total_slots)
        if nat_sc is not None:  # parallel C++ scatter (race-free cells)
            vals, res8, pt8, slot = nat_sc
        else:
            slot = g_tile0[gid_p] * 8 + k_p
            vals = np.zeros((total_slots, _HACK), dtype=val_dtype)
            res8 = np.zeros((total_slots, _HACK), dtype=np.int8)
            pt8 = np.zeros((total_slots, 128), dtype=np.int8)
            vals[slot, vlane_p] = vals_nat[order_p]
            res8[slot, vlane_p] = res_p.astype(np.int8)
            pt8[slot, res_p.astype(np.int64)] = del_p.astype(np.int8)
        vals_lo = None
        if is_dd:
            from spgpu_tpu.ops.dd import split as _dd_split

            pair = _dd_split(vals)
            vals, vals_lo = pair[0], pair[1]

        tile_base = np.zeros(num_tiles, dtype=np.int32)
        tile_hh = np.zeros(num_tiles, dtype=np.int32)
        g_tiles_idx = np.repeat(g_tile0, raw_tiles_per_grp) + (
            np.arange(int(raw_tiles_per_grp.sum()))
            - np.repeat(_excl_cumsum(raw_tiles_per_grp), raw_tiles_per_grp))
        tile_base[g_tiles_idx] = np.repeat(
            (g_meta if scattered else g_win * w).astype(np.int32),
            raw_tiles_per_grp)
        tile_hh[g_tiles_idx] = np.repeat(
            (g_hack % gh).astype(np.int32), raw_tiles_per_grp)
        # scattered meta: layout-group index (20 bits) | hack-in-group
        tile_meta = (tile_base
                     | (tile_hh << (20 if scattered else 16))).astype(np.int32)
        # trailing -1 sentinel: the kernel flushes a group when
        # chunk_group[c+1] differs (last chunk included via the sentinel)
        chunk_group = np.r_[
            np.repeat(np.arange(num_groups, dtype=np.int32),
                      pad_tiles_per_g8 // ct),
            np.int32(-1),
        ]

        # --- SMEM budget: row-segment when the prefetched scalars
        # (tile_base + chunk_group + group_bases) outgrow the 1 MiB SMEM
        # (measured compile OOM at the 4M-row class: "Used 1.17M of
        # 1.00M smem").  Segments cut at output-group boundaries; each
        # is a complete WhellMatrix over contiguous rows sharing this
        # panel's x, and the products concatenate.
        chunks_per_g = pad_tiles_per_g8 // ct
        n_lg = (np.bincount(hack8, minlength=num_groups)
                if scattered else np.zeros(num_groups, np.int64))
        words_g = (pad_tiles_per_g8 + chunks_per_g
                   + (n_lg * K if scattered else 0))
        if int(words_g.sum()) + 1 > _SMEM_SCALAR_BUDGET_WORDS:
            if return_plan:
                raise ValueError(
                    "return_plan is not supported for matrices large "
                    "enough to need row segmentation (SMEM budget)")
            from spgpu_tpu.formats.whell import SegmentedWhell

            # greedy contiguous packing of output groups into segments
            cuts = [0]
            acc = 0
            for og in range(num_groups):
                wgi = int(words_g[og])
                if acc and acc + wgi + 1 > _SMEM_SCALAR_BUDGET_WORDS:
                    cuts.append(og)
                    acc = 0
                acc += wgi
            cuts.append(num_groups)
            cchunk = _excl_cumsum(chunks_per_g)
            lg_cum = _excl_cumsum(n_lg) if scattered else None
            real = np.zeros(num_tiles, dtype=bool)
            real[g_tiles_idx] = True
            e_og = hack8[gid_p]
            nnz_cum = np.r_[0, np.cumsum(
                np.bincount(e_og, minlength=num_groups))]
            segs = []
            for og0, og1 in zip(cuts[:-1], cuts[1:]):
                T0, T1 = int(g8_base[og0]), int(
                    g8_base[og1 - 1] + pad_tiles_per_g8[og1 - 1])
                C0 = int(cchunk[og0])
                C1 = C0 + int(chunks_per_g[og0:og1].sum())
                meta_s = tile_meta[T0:T1].copy()
                bases_s = None
                if scattered:
                    lg0, lg1 = int(lg_cum[og0]), (
                        int(lg_cum[og1]) if og1 < num_groups
                        else int(n_lg.sum()))
                    # layout-group field is the low 20 bits and every
                    # real tile's value is >= lg0, so the packed word
                    # rebases by plain subtraction (no borrow)
                    meta_s[real[T0:T1]] -= lg0
                    bases_s = jnp.asarray(np.ascontiguousarray(
                        bases_p[lg0:lg1].reshape(-1)))
                hk1 = min(num_hacks, og1 * gh)
                segs.append(WhellMatrix(
                    values=jnp.asarray(vals[T0 * 8:T1 * 8]),
                    values_lo=(None if vals_lo is None
                               else jnp.asarray(vals_lo[T0 * 8:T1 * 8])),
                    residue=jnp.asarray(res8[T0 * 8:T1 * 8]),
                    page_tab=jnp.asarray(pt8[T0 * 8:T1 * 8]),
                    tile_base=jnp.asarray(meta_s),
                    chunk_group=jnp.asarray(np.r_[
                        chunk_group[C0:C1] - np.int32(og0), np.int32(-1)]),
                    row_perm=None,
                    n_rows=(hk1 - og0 * gh) * _HACK, n_cols=cols_p,
                    num_hacks=hk1 - og0 * gh, num_groups=og1 - og0,
                    total_slots=(T1 - T0) * 8,
                    nnz=int(nnz_cum[og1] - nnz_cum[og0]),
                    x_pages=pages_p,
                    seg_lo=jnp.asarray(seg_lo[og0 * gh:og1 * gh]),
                    seg_hi=jnp.asarray(seg_hi[og0 * gh:og1 * gh]),
                    lane_of_row=lane_of_row_j,
                    group_bases=bases_s,
                    window_pages=8 * K if scattered else w, orig_rows=n,
                    group_hacks=gh, chunk_tiles=ct,
                    unit_segments=unit_segs,
                ))
            mat = SegmentedWhell(
                segments=tuple(segs), n_rows=n_lane, n_cols=cols_p,
                orig_rows=n, nnz=int(k_p.size), x_pages=pages_p,
            )
            return mat, slot, vlane_p

        mat = WhellMatrix(
            values=jnp.asarray(vals),
            values_lo=None if vals_lo is None else jnp.asarray(vals_lo),
            residue=jnp.asarray(res8),
            page_tab=jnp.asarray(pt8),
            tile_base=jnp.asarray(tile_meta),
            chunk_group=jnp.asarray(chunk_group),
            row_perm=None,
            n_rows=n_lane, n_cols=cols_p, num_hacks=num_hacks,
            num_groups=num_groups, total_slots=total_slots,
            nnz=int(k_p.size),
            x_pages=pages_p,
            seg_lo=seg_lo_j, seg_hi=seg_hi_j,
            lane_of_row=lane_of_row_j,
            group_bases=(None if bases_p is None
                         else jnp.asarray(np.ascontiguousarray(
                             bases_p.reshape(-1)))),
            window_pages=8 * K if scattered else w, orig_rows=n,
            group_hacks=gh, chunk_tiles=ct,
            unit_segments=unit_segs,
        )
        return mat, slot, vlane_p

    # --- column panels: x must fit the persistent VMEM scratch ----------
    if not scattered:
        budget_pages = max((budget // (128 * x_entry_bytes)) // w, 1) * w
    if x_pages <= budget_pages:
        mat, slot, vlane_s = build_panel(None, 0, x_pages, n_lane)
        if not return_plan:
            return mat
        # plan in ORIGINAL entry order: entry i lives at cell
        # (panel=0, plan_slot[i], plan_lane[i])
        plan_panel = np.zeros(m, np.int64)
        plan_slot = np.empty(m, np.int64)
        plan_lane = np.empty(m, np.int64)
        plan_slot[order] = slot
        plan_lane[order] = vlane_s
        return mat, (plan_panel, plan_slot, plan_lane)

    panels = []
    plan_panel = np.empty(m, np.int64)
    plan_slot = np.empty(m, np.int64)
    plan_lane = np.empty(m, np.int64)
    if scattered:
        panel_of_group = (g_G // maxbins) % n_panels
        panel_iter = []
        for p in range(n_panels):
            pages_p = min(sup_per_panel * 8, x_pages - p * sup_per_panel * 8)
            cols_p = min(pages_p * 128, n_lane - p * sup_per_panel * 8 * 128)
            panel_iter.append((panel_of_group == p, 0, pages_p, cols_p))
    else:
        wins_per_panel = budget_pages // w
        g_win_all = g_G % nwin
        n_panels = -(-nwin // wins_per_panel)
        panel_iter = []
        for p in range(n_panels):
            w0 = p * wins_per_panel
            w1 = min((p + 1) * wins_per_panel, nwin)
            gsel = (g_win_all >= w0) & (g_win_all < w1)
            pages_p = (w1 - w0) * w
            cols_p = min(pages_p * 128, n_lane - w0 * w * 128)
            panel_iter.append((gsel, w0, pages_p, cols_p))
    for p, (gsel, w0, pages_p, cols_p) in enumerate(panel_iter):
        mat, slot, vlane_s = build_panel(gsel, w0, pages_p, cols_p)
        panels.append(mat)
        if return_plan:
            orig = order[gsel[g_id]]
            plan_panel[orig] = p
            plan_slot[orig] = slot
            plan_lane[orig] = vlane_s
    from spgpu_tpu.formats.whell import PanelledWhell

    out = PanelledWhell(panels=tuple(panels), panel_pages=budget_pages,
                        n_rows=n_lane, n_cols=n_lane, orig_rows=n, nnz=m)
    if return_plan:
        return out, (plan_panel, plan_slot, plan_lane)
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
    import dataclasses as _dc

    import jax.numpy as jnp

    if len(plan) == 3:  # packed plan: (panel, slot, lane)
        from spgpu_tpu.formats.whell import PanelledWhell

        pp, ps, pl_ = plan
        is_dd = getattr(a, "is_dd", False)
        newv = np.asarray(new_values,
                          np.float64 if is_dd else None)
        mats = a.panels if isinstance(a, PanelledWhell) else (a,)
        new_mats = []
        for i, mat in enumerate(mats):
            sel = pp == i
            vals = np.zeros((mat.total_slots, _HACK),
                            dtype=np.float64 if is_dd
                            else np.asarray(mat.values).dtype)
            vals[ps[sel], pl_[sel]] = newv[sel]
            if is_dd:
                from spgpu_tpu.ops.dd import split as _dd_split

                pair = _dd_split(vals)
                new_mats.append(_dc.replace(
                    mat, values=jnp.asarray(pair[0]),
                    values_lo=jnp.asarray(pair[1])))
            else:
                new_mats.append(_dc.replace(mat, values=jnp.asarray(vals)))
        if isinstance(a, PanelledWhell):
            return _dc.replace(a, panels=tuple(new_mats))
        return new_mats[0]

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
        chunk_group=jnp.arange(num_groups, dtype=jnp.int32),
        row_perm=perm_arr,
        n_rows=coo.n_rows, n_cols=coo.n_cols, num_hacks=num_hacks,
        num_groups=num_groups, total_slots=total, nnz=0,
        x_pages=max(nsp * 8, 8),
    )
