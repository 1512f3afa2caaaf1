"""COO → WHDIA conversion (host-side, vectorised NumPy).

Builds the windowed-HDIA compute layout (:mod:`spgpu_tpu.formats.whdia`).
Mirrors the reference's ``cooToHdia`` semantics
(``/root/reference/src/core/hdia.cpp:230-349``): entries are bucketed by
(hack, diagonal); duplicate coordinates plain-store so the last entry in
file order wins (like ``coo2dia``, ``dia.c:95-100``); out-of-range cells
(diagonal ends) stay zero.
"""

from __future__ import annotations

import numpy as np

from spgpu_tpu.core import WHDIA_CHUNK_TILES as _CT
from spgpu_tpu.formats.coo import CooMatrix
from spgpu_tpu.formats.whdia import WhdiaMatrix

__all__ = ["coo_to_whdia"]

_HACK = 128
_GROUP = 32  # hacks per output group


def _spread(w: int) -> int:
    """Max diagonal spread inside one tile for a ``w``-page window:
    every cell's r0 + lane must stay inside w*128 x entries (128-lane
    margin below the window top, 127 above r0_min = -127)."""
    return (w - 2) * 128


def _excl_cumsum(a: np.ndarray) -> np.ndarray:
    out = np.zeros_like(a)
    np.cumsum(a[:-1], out=out[1:])
    return out


#: per-block x budget (bytes): the kernel DMAs the whole x slice into a
#: persistent VMEM scratch, which must share the ~16 MiB scoped VMEM
#: with the accumulator and chunk buffers.
_ROWBLOCK_X_BUDGET = 10 * 2 ** 20
#: SMEM budget in int32 words for tile_base + chunk_group (same wall as
#: packed WHELL's row segmentation: 1 MiB of SMEM, measured overrun at
#: ~130k tiles on the 4M-row class).
_ROWBLOCK_SMEM_WORDS = 150_000


def coo_to_whdia(coo: CooMatrix, dtype=None, window_pages=None,
                 group_hacks=None, chunk_tiles=None) -> WhdiaMatrix:
    vals_in = coo.values if dtype is None else coo.values.astype(dtype)
    if np.issubdtype(vals_in.dtype, np.complexfloating):
        # C/Z: two real-plane conversions sharing the structure-derived
        # layout (formats/cplanes.py) — dia-class complex kernel parity
        # (hdia_cspmv.cu:28, hdia_zspmv.cu)
        from spgpu_tpu.formats.cplanes import ComplexPlanes

        real_dt = (np.float64 if vals_in.dtype == np.complex128
                   else np.float32)
        mk = lambda v: coo_to_whdia(
            CooMatrix(coo.rows, coo.cols, v.astype(real_dt),
                      coo.n_rows, coo.n_cols),
            window_pages=window_pages, group_hacks=group_hacks,
            chunk_tiles=chunk_tiles)
        return ComplexPlanes(ar=mk(np.real(vals_in)),
                             ai=mk(np.imag(vals_in)),
                             n_rows=coo.n_rows, n_cols=coo.n_cols,
                             nnz=coo.nnz)
    # fp64 -> double-float slabs, as in packed WHELL (hdia_dspmv parity)
    is_dd = np.dtype(vals_in.dtype) == np.float64
    val_dtype = np.dtype(np.float64) if is_dd else vals_in.dtype
    num_hacks = max(-(-coo.n_rows // _HACK), 1)
    # --- row blocks: x beyond the VMEM budget, or tile scalars beyond
    # SMEM, split the matrix into independent row blocks whose column
    # windows (the diagonals' reach — bounded for banded structure) fit
    # the budgets (formats/whdia.py BlockedWhdia).
    xeb = 8 if is_dd else 4
    est_tiles = max(1, coo.nnz // 1024) * 2  # x2: padding margin
    if coo.nnz and (coo.n_cols * xeb > _ROWBLOCK_X_BUDGET
                    or est_tiles > _ROWBLOCK_SMEM_WORDS):
        return _coo_to_whdia_blocked(
            coo, vals_in, is_dd, dtype, window_pages, group_hacks,
            chunk_tiles)
    # geometry defaults (chip sweep, BASELINE.md): 128-hack groups /
    # 128-tile chunks lift banded-31 70.7 -> 86.7 GFLOPS and the 1M
    # Laplacian 28.2 -> 33.5 (fewer z flushes, amortised grid steps).
    # r4 pattern-mode sweep (banded-11 524k, interleaved best-of-3):
    # ct=256 now WINS at gh=128/256 (142.0 -> 151.4 GFLOPS) — without
    # the r0 slab the kernel is op-bound and the bigger chunk amortises
    # grid steps; the old "ct=256 loses" verdict was a slab-mode
    # artifact.  Kept >=4096-tile gated so the chunk floor can't force
    # the window auto-pick down on small matrices.  dd kernels carry
    # ~4x the ops per tile — keep their tested 32/32 geometry so the
    # Mosaic compile stays tractable (DESIGN.md).
    if group_hacks is None:
        group_hacks = 32 if (is_dd or num_hacks < 128) else 128
    if chunk_tiles is None:
        est_tiles = max(1, coo.nnz // 1024)
        chunk_tiles = (32 if is_dd else
                       256 if est_tiles >= 4096 else
                       128 if est_tiles >= 1024 else
                       64 if est_tiles >= 256 else 32)
    _GROUPv = group_hacks
    _CTv = chunk_tiles
    num_groups = -(-num_hacks // _GROUPv)
    num_pages = max(-(-coo.n_cols // 128), 1)
    m = coo.nnz

    if m == 0:
        total = num_groups * _CTv * 8
        import jax.numpy as jnp

        w = window_pages or 8
        return WhdiaMatrix(
            values=jnp.zeros((total, _HACK),
                             jnp.float32 if is_dd else val_dtype),
            values_lo=(jnp.zeros((total, _HACK), jnp.float32)
                       if is_dd else None),
            slot_r0=jnp.zeros((total, _HACK), jnp.int16),
            tile_base=jnp.zeros((total // 8,), jnp.int32),
            chunk_group=jnp.arange(num_groups, dtype=jnp.int32),
            n_rows=coo.n_rows, n_cols=coo.n_cols, num_hacks=num_hacks,
            num_groups=num_groups, total_slots=total, nnz=0,
            x_pages=max(num_pages, w), window_pages=w,
            group_hacks=_GROUPv, chunk_tiles=_CTv,
        )

    hack = (coo.rows // _HACK).astype(np.int64)
    lane = (coo.rows % _HACK).astype(np.int64)
    diag = (coo.cols - coo.rows).astype(np.int64)

    # --- slots: one per occupied (hack, diagonal) -----------------------
    # order entries by (hack, diag, file order) so later duplicates win
    order = np.lexsort((np.arange(m), diag, hack))
    h_s, d_s = hack[order], diag[order]
    new_slot_flag = np.r_[True, (h_s[1:] != h_s[:-1]) | (d_s[1:] != d_s[:-1])]
    slot_of_entry = np.cumsum(new_slot_flag) - 1
    n_slots = int(slot_of_entry[-1]) + 1
    slot_hack = h_s[new_slot_flag]
    slot_diag = d_s[new_slot_flag]

    # --- greedy tiling: 8 slots/tile, same hack, spread <= _spread(w) ---
    # Sequential scan: native C++ when available, Python fallback.  With
    # window_pages unset, try each window size and keep the one with the
    # fewest group-padded tiles (the tiler is milliseconds; wide windows
    # admit spread-y diagonal sets at +2 vector ops per extra 8 pages).
    from spgpu_tpu import native as _native

    def tile_with(w):
        nat = _native.whdia_tile(slot_hack, slot_diag, _spread(w))
        if nat is not None:
            return nat
        tile_of_slot = np.empty(n_slots, dtype=np.int64)
        pos_of_slot = np.empty(n_slots, dtype=np.int64)
        tile_hack_l, tile_d0_l = [], []
        fill, cur_hack, d0 = 8, -2, 0
        for i in range(n_slots):
            h_i, d_i = slot_hack[i], slot_diag[i]
            if fill == 8 or h_i != cur_hack or d_i - d0 > _spread(w):
                tile_hack_l.append(h_i)
                tile_d0_l.append(d_i)
                cur_hack, d0, fill = h_i, d_i, 0
            tile_of_slot[i] = len(tile_hack_l) - 1
            pos_of_slot[i] = fill
            fill += 1
        return (tile_of_slot, pos_of_slot,
                np.asarray(tile_hack_l, dtype=np.int64),
                np.asarray(tile_d0_l, dtype=np.int64))

    def padded_tiles(tile_hack_a):
        tg = tile_hack_a // _GROUPv
        raw = np.bincount(tg, minlength=num_groups)
        return int(np.maximum(-(-raw // _CTv) * _CTv, _CTv).sum())

    if window_pages is None:
        best = None
        for w_try in (8, 16, 32):
            cand = tile_with(w_try)
            cost = padded_tiles(cand[2]) * (8 + (w_try // 8 - 1))
            # cost model: tiles x (per-tile op estimate; each extra
            # 8-page block costs ~1 extra op in 8-op units)
            if best is None or cost < best[0]:
                best = (cost, w_try, cand)
        _, window_pages, nat = best
    else:
        nat = tile_with(window_pages)
    w = window_pages
    x_pages = max(num_pages, w)
    tile_of_slot, pos_of_slot, tile_hack_a, tile_d0_a = nat
    n_raw_tiles = tile_hack_a.size

    # --- group hacks by 8; pad each group's tiles to whole chunks -------
    tile_group = tile_hack_a // _GROUPv
    raw_tiles_per_group = np.bincount(tile_group, minlength=num_groups)
    pad_tiles_per_group = np.maximum(-(-raw_tiles_per_group // _CTv) * _CTv, _CTv)
    group_tile_base = _excl_cumsum(pad_tiles_per_group)
    num_tiles = int(pad_tiles_per_group.sum())
    total_slots = num_tiles * 8
    # raw tiles are already group-contiguous (slots sorted by hack)
    rank_in_group = (np.arange(n_raw_tiles)
                     - _excl_cumsum(raw_tiles_per_group)[tile_group])
    tile_final = group_tile_base[tile_group] + rank_in_group

    # --- per-tile scalars ----------------------------------------------
    base_cap = max(x_pages - w, 0)
    start_min = tile_hack_a * _HACK + tile_d0_a
    tb_raw = np.clip(start_min >> 7, 0, base_cap)
    tile_base = np.zeros(num_tiles, dtype=np.int32)
    tile_base[tile_final] = tb_raw.astype(np.int32)
    tile_hh = np.zeros(num_tiles, dtype=np.int32)
    tile_hh[tile_final] = (tile_hack_a % _GROUPv).astype(np.int32)
    # pack hh above the base page: one SMEM word per tile (same budget
    # fix as WHELL; hh < 32 needs 5 bits, base page <= 15 bits)
    tile_meta = (tile_base | (tile_hh << 16)).astype(np.int32)
    chunk_group = np.repeat(np.arange(num_groups, dtype=np.int32),
                            pad_tiles_per_group // _CTv)

    # --- per-slot r0; scatter values ------------------------------------
    slot_final = tile_final[tile_of_slot] * 8 + pos_of_slot
    r0 = (slot_hack * _HACK + slot_diag - tb_raw[tile_of_slot] * 128)
    slot_r0 = np.zeros(total_slots, dtype=np.int16)
    slot_r0[slot_final] = r0.astype(np.int16)  # r0 ∈ [-127, 1151]
    vals = np.zeros((total_slots, _HACK), dtype=val_dtype)
    vals[slot_final[slot_of_entry], lane[order]] = vals_in[order]
    vals_lo = None
    if is_dd:
        from spgpu_tpu.ops.dd import split as _dd_split

        pair = _dd_split(vals)
        vals, vals_lo = pair[0], pair[1]

    import jax.numpy as jnp

    # --- pattern mode (r4): when every tile's FILLED slots (always a
    # position prefix by construction) form an arithmetic progression
    # r0[s] = r00 + step*s — true for contiguous-band matrices, which
    # are the HDIA bread-and-butter — r0 needs no slab at all: ONE
    # packed scalar per tile rebuilds it in-kernel (3 scalar splats +
    # min/mul/add), with dead slots repeating the last filled value
    # (their cells are zero, so their gathers are inert).  Kills the
    # 2 B/cell r0 stream — WHDIA becomes true values-only traffic (the
    # design ideal stated in formats/whdia.py; VERDICT r3 item 5).
    # Non-AP diagonal sets (e.g. a 2-D Laplacian's ±n offsets) and dd
    # slabs keep the lane-replicated slab.
    tile_r0 = None
    if not is_dd and num_tiles:
        r0g = np.zeros((num_tiles, 8), np.int64)
        nfill = np.zeros(num_tiles, np.int64)
        tf, pf = tile_final[tile_of_slot], pos_of_slot
        r0g[tf, pf] = r0
        np.maximum.at(nfill, tf, pf + 1)
        pos8 = np.arange(8)
        # per-tile AP check over the filled prefix
        d1 = r0g[:, 1:] - r0g[:, :-1]
        step = np.where(nfill > 1, d1[:, 0], 0)
        is_ap = np.ones(num_tiles, bool)
        for s in range(1, 7):
            chk = nfill > s + 1
            is_ap &= ~chk | (d1[:, s] == step)
        r00 = r0g[:, 0]
        f1 = np.maximum(nfill - 1, 0)
        if (is_ap.all() and r00.min() >= -1024 and r00.max() < 64512
                and step.min() >= -4096 and step.max() < 4096):
            packed = ((r00 + 1024).astype(np.uint32)
                      | (f1.astype(np.uint32) << np.uint32(16))
                      | ((step + 4096).astype(np.uint32) << np.uint32(19)))
            tile_r0 = packed.view(np.int32)

    if tile_r0 is not None:
        slot_r0_j = None
        tile_r0_j = jnp.asarray(tile_r0)
    else:
        # lane-replicated vector operand (formats/whdia.py slot_r0 doc)
        slot_r0_j = jnp.asarray(np.repeat(slot_r0[:, None], _HACK, axis=1))
        tile_r0_j = None
    return WhdiaMatrix(
        values=jnp.asarray(vals),
        values_lo=None if vals_lo is None else jnp.asarray(vals_lo),
        slot_r0=slot_r0_j,
        tile_base=jnp.asarray(tile_meta),
        chunk_group=jnp.asarray(chunk_group),
        n_rows=coo.n_rows, n_cols=coo.n_cols, num_hacks=num_hacks,
        num_groups=num_groups, total_slots=total_slots, nnz=m,
        x_pages=x_pages, window_pages=w,
        group_hacks=_GROUPv, chunk_tiles=_CTv,
        tile_r0=tile_r0_j,
    )


def _coo_to_whdia_blocked(coo, vals_in, is_dd, dtype, window_pages,
                          group_hacks, chunk_tiles):
    """Split rows into hack-aligned blocks whose column windows fit the
    per-block x budget and whose tile scalars fit SMEM, then convert
    each block independently (``A @ x = concat_b(A_b @ x[window_b])``)."""
    from spgpu_tpu.formats.whdia import BlockedWhdia

    xeb = 8 if is_dd else 4
    bud_cols = (_ROWBLOCK_X_BUDGET // (128 * xeb)) * 128
    n_hacks = -(-coo.n_rows // _HACK)
    hk = (coo.rows // _HACK).astype(np.int64)
    hmin = np.full(n_hacks, np.iinfo(np.int64).max, np.int64)
    hmax = np.full(n_hacks, -1, np.int64)
    np.minimum.at(hmin, hk, coo.cols.astype(np.int64))
    np.maximum.at(hmax, hk, coo.cols.astype(np.int64))
    hnnz = np.bincount(hk, minlength=n_hacks)
    empty = hmax < 0
    hmin[empty] = 0
    hmax[empty] = 0
    # greedy hack packing under both budgets
    cuts = [0]
    cmin, cmax, nn = hmin[0], hmax[0], hnnz[0]
    for h in range(1, n_hacks):
        nmin, nmax = min(cmin, hmin[h]), max(cmax, hmax[h])
        nnn = nn + hnnz[h]
        if (nmax - (nmin // 128) * 128 + 1 > bud_cols
                or (nnn // 1024) * 2 > _ROWBLOCK_SMEM_WORDS):
            cuts.append(h)
            cmin, cmax, nn = hmin[h], hmax[h], hnnz[h]
        else:
            cmin, cmax, nn = nmin, nmax, nnn
    cuts.append(n_hacks)
    if len(cuts) == 2:
        raise ValueError(
            "matrix exceeds the WHDIA x/SMEM budgets but cannot be "
            "row-blocked (a single 128-row hack spans too many "
            "columns); use the packed WHELL layout instead")
    blocks, col_offs = [], []
    order = np.argsort(hk, kind="stable")  # hack-sorted entry view
    hstart = np.searchsorted(hk[order], np.arange(n_hacks + 1))
    nnz_total = 0
    for h0, h1 in zip(cuts[:-1], cuts[1:]):
        sel = order[hstart[h0]:hstart[h1]]
        coff = int(hmin[h0:h1].min() // 128) * 128
        span = int(hmax[h0:h1].max()) - coff + 1
        sub = CooMatrix(
            coo.rows[sel] - h0 * _HACK, coo.cols[sel] - coff,
            vals_in[sel],
            min(coo.n_rows - h0 * _HACK, (h1 - h0) * _HACK), span)
        blk = coo_to_whdia(sub, dtype=None, window_pages=window_pages,
                           group_hacks=group_hacks,
                           chunk_tiles=chunk_tiles)
        if span * xeb > _ROWBLOCK_X_BUDGET:  # single-hack span overrun
            raise ValueError(
                "a row block's column span exceeds the WHDIA x budget; "
                "use the packed WHELL layout for this structure")
        blocks.append(blk)
        col_offs.append(coff)
        nnz_total += sub.nnz
    return BlockedWhdia(blocks=tuple(blocks), col_offs=tuple(col_offs),
                        n_rows=coo.n_rows, n_cols=coo.n_cols,
                        nnz=nnz_total)
