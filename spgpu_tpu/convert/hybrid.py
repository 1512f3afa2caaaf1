"""COO → hybrid banded+irregular split (HYB-class, round 5).

The TPU answer to the HYB format the reference benchmarked against
(``/root/reference/src/tests/cusparsePerf.cpp:668-680``,
``cusparseDcsr2hyb`` / ``CUSPARSE_HYB_PARTITION_AUTO``): entries on
densely-occupied (hack, diagonal) slots route to the values-only WHDIA
layout (the DIA-side kernel contract is
``/root/reference/src/core/kernels/dia_spmv_base_template.cuh:133-135``),
the scattered rest to packed WHELL, and one jitted SpMV sums the parts.

Split criterion: a diagonal is "band" within a 128-row hack when it
holds at least ``tau_lanes`` of the hack's 128 lanes — below that, a
WHDIA slot wastes more than the packed layout's ~1.7x raggedness pad.
``tau_lanes="auto"`` sweeps candidate thresholds on the occupancy
histogram and minimises a measured per-cell time model (chip rates:
WHDIA pattern ~8.6 ns/tile at 4 B/cell, packed WHELL ~12 ns/tile at
6 B/cell — BASELINE.md round 4).

.. deprecated:: round 5 (performance claim)
   Chip-REFUTED as a speed win (doc/DESIGN.md §2i, interleaved
   best-of-4): on mixed banded+irregular fixtures the hybrid moves
   ~0.7x the bytes of pure packed WHELL but runs 0.68-0.70x the speed
   (the rest part's raggedness inflates 2.4 -> 3.8 pad when the band
   is removed, the lane-space crossing costs ~0.11 ms/product, and two
   kernels pipeline worse than one op-bound kernel) — and the FEM
   flagship has NO dense diagonals to route (occupancy max 12/128
   lanes; 0.0% of entries at tau=16).  Kept as a correct, tested
   capability (API parity with the reference's HYB benchmark target);
   ``suggest_format`` never proposes it.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from spgpu_tpu.formats.coo import CooMatrix
from spgpu_tpu.formats.hybrid import HybridMatrix, lane_runs

__all__ = ["coo_to_hybrid", "hybrid_split_stats"]

# measured per-cell time model (ns per 1024-cell tile, BASELINE.md r4):
# WHDIA pattern mode ~8.6 ns/tile, packed WHELL ~12 ns/tile
_BAND_NS_PER_CELL = 8.6 / 1024.0
_REST_NS_PER_CELL = 12.0 / 1024.0


def _occupancy(coo: CooMatrix):
    """Per-entry (hack, diagonal) slot occupancy counts."""
    hack = (coo.rows // 128).astype(np.int64)
    diag = coo.cols.astype(np.int64) - coo.rows.astype(np.int64)
    span = coo.n_rows + coo.n_cols
    key = hack * span + (diag + coo.n_rows)
    _, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
    return cnt, inv


def hybrid_split_stats(coo: CooMatrix, taus=(8, 16, 32, 48, 64, 96, 128),
                       _occ=None):
    """Occupancy-histogram sweep: for each candidate threshold, the band
    fraction, the band part's WHDIA cell count, and the modeled SpMV
    time.  Cheap (one ``np.unique`` of nnz keys) — the decision surface
    behind ``tau_lanes="auto"`` and the refutation evidence when no
    threshold wins.  ``_occ``: precomputed ``(cnt, inv)`` histogram so
    :func:`coo_to_hybrid` doesn't sort the key set twice (review r5)."""
    cnt, inv = _occupancy(coo) if _occ is None else _occ
    occ = cnt[inv]
    rows = []
    for t in taus:
        sel = cnt >= t
        band_nnz = int(cnt[sel].sum())
        band_cells = int(sel.sum()) * 128
        rest_nnz = coo.nnz - band_nnz
        # rest pad unknown before conversion; use the measured flagship
        # packed pad (1.74) as the model constant
        model_ns = (_BAND_NS_PER_CELL * band_cells
                    + _REST_NS_PER_CELL * rest_nnz * 1.74)
        rows.append({
            "tau_lanes": int(t),
            "band_frac": band_nnz / max(coo.nnz, 1),
            "band_nnz": band_nnz,
            "band_cells": band_cells,
            "band_pad": band_cells / max(band_nnz, 1),
            "model_ns": model_ns,
        })
    return rows, occ


def coo_to_hybrid(
    coo: CooMatrix,
    tau_lanes: Union[int, str] = "auto",
    min_band_frac: float = 0.25,
    dtype=None,
    **whell_kw,
):
    """Build a :class:`HybridMatrix` from host COO triples.

    ``tau_lanes``: minimum lanes (of 128) a diagonal must fill within a
    hack to join the band part; ``"auto"`` picks the candidate with the
    lowest modeled SpMV time.  Raises ``ValueError`` with the occupancy
    stats when the band fraction lands below ``min_band_frac`` — a
    matrix without dense diagonals should stay on packed WHELL (the
    hybrid's crossing copies and second kernel only pay for themselves
    when a substantial band runs values-only).

    Duplicates are coalesced up front (the two parts plain-store like
    ``coo2dia``/``cooToEll`` respectively — summing first makes the
    split independent of duplicate placement)."""
    from spgpu_tpu.convert.whdia import coo_to_whdia
    from spgpu_tpu.convert.whell import coo_to_whell

    if coo.n_rows != coo.n_cols:
        raise ValueError("hybrid layout requires a square matrix")
    if np.issubdtype(coo.values.dtype, np.complexfloating):
        raise NotImplementedError(
            "hybrid layout covers real fp32/bf16/fp64(dd) matrices; "
            "complex matrices run the plane-pair WHDIA/WHELL paths")
    coo = coo.sum_duplicates()
    if dtype is not None:
        coo = CooMatrix(coo.rows, coo.cols, coo.values.astype(dtype),
                        coo.n_rows, coo.n_cols)

    cnt, inv = _occupancy(coo)
    if tau_lanes == "auto":
        rows, occ = hybrid_split_stats(coo, _occ=(cnt, inv))
        # only thresholds that clear min_band_frac are admissible
        ok = [r for r in rows if r["band_frac"] >= min_band_frac]
        if not ok:
            best = max(rows, key=lambda r: r["band_frac"])
            raise ValueError(
                "matrix is not part-banded: best band fraction "
                f"{best['band_frac']:.3f} at tau_lanes={best['tau_lanes']} "
                f"(< min_band_frac={min_band_frac}); occupancy max "
                f"{int(cnt.max())}/128 lanes — use packed WHELL "
                "(doc/DESIGN.md §2i)")
        tau = min(ok, key=lambda r: r["model_ns"])["tau_lanes"]
    else:
        tau = int(tau_lanes)
    sel = cnt[inv] >= tau
    band_nnz = int(sel.sum())
    if band_nnz / max(coo.nnz, 1) < min_band_frac:
        occ_max = int(cnt.max()) if cnt.size else 0
        raise ValueError(
            "matrix is not part-banded: band fraction "
            f"{band_nnz / max(coo.nnz, 1):.3f} at tau_lanes={tau} "
            f"(< min_band_frac={min_band_frac}); occupancy max "
            f"{occ_max}/128 lanes — use packed WHELL (doc/DESIGN.md §2i)")

    band_coo = CooMatrix(coo.rows[sel], coo.cols[sel], coo.values[sel],
                         coo.n_rows, coo.n_cols)
    band = coo_to_whdia(band_coo)
    rest_nnz = coo.nnz - band_nnz
    rest = None
    runs = ()
    if rest_nnz:
        rest_coo = CooMatrix(coo.rows[~sel], coo.cols[~sel],
                             coo.values[~sel], coo.n_rows, coo.n_cols)
        rest = coo_to_whell(rest_coo, packed=True, **whell_kw)
        if getattr(rest, "lane_of_row", None) is None:
            raise ValueError(
                "hybrid rest part did not produce a packed lane map "
                f"({type(rest).__name__})")
        runs = lane_runs(np.asarray(rest.lane_of_row), rest.n_rows)
    return HybridMatrix(
        band=band, rest=rest, n_rows=coo.n_rows, n_cols=coo.n_cols,
        nnz=coo.nnz, band_nnz=band_nnz, tau_lanes=tau, runs=runs)
