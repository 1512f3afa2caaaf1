"""Hybrid banded+irregular matrix (HYB-class decomposition).

The classic HYB split the reference benchmarked against
(``/root/reference/src/tests/cusparsePerf.cpp:668-680``,
``cusparseDcsr2hyb`` with ``CUSPARSE_HYB_PARTITION_AUTO``): entries on
densely-occupied diagonals go to a DIA-class part, the scattered rest
to an ELL-class part, and one SpMV sums the two products.  On TPU the
parts are this repo's two production layouts:

* **band** — :class:`~spgpu_tpu.formats.whdia.WhdiaMatrix` (pattern
  mode where the diagonal fill is an arithmetic progression): 4 B/cell
  values-only traffic at a measured 145-300 GFLOPS (BASELINE.md);
* **rest** — packed-lane :class:`~spgpu_tpu.formats.whell.WhellMatrix`
  (6 B/cell, ~99 GFLOPS on the FEM flagship).

The two parts live in different vector spaces: WHDIA consumes/produces
ORIGINAL row order, packed WHELL lives in its lane space (order-
preserving per-hack compaction).  Crossing costs two structured copies
per product — the lane map is exactly ``num_hacks`` contiguous runs,
each starting at a 128-aligned lane, so embed/extract compile to a
concat of STATIC slices (a fused memcpy-class kernel), not the ~47
ns/element XLA gather that doc/DESIGN.md §2g-2 refutes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np

__all__ = ["HybridMatrix", "lane_runs", "run_embed", "run_extract"]


def lane_runs(lane_of_row: np.ndarray, n_lane: int) -> Tuple[Tuple[int, int], ...]:
    """Decompose an order-preserving lane map into maximal runs.

    Returns ``((dst_lane0, length), ...)`` where source coordinates are
    implicit (consecutive from 0).  For the packed layout this yields
    one run per hack (verified: ``diff(lane_of_row)`` is 1 within hacks
    and jumps only at 128-aligned hack boundaries)."""
    lor = np.asarray(lane_of_row, dtype=np.int64)
    if lor.size == 0:
        return ()
    brk = np.flatnonzero(np.diff(lor) != 1)
    starts = np.r_[0, brk + 1]
    ends = np.r_[brk + 1, lor.size]
    return tuple((int(lor[s]), int(e - s)) for s, e in zip(starts, ends))


def run_embed(runs, n_lane: int, x):
    """Original-space vector → lane space via static-slice concat
    (phantom lanes zero).  Broadcasts over leading axes (dd stacks)."""
    import jax.numpy as jnp

    pieces = []
    src = 0
    cursor = 0
    zcache = {}
    for dst, ln in runs:
        gap = dst - cursor
        if gap:
            z = zcache.get(gap)
            if z is None:
                z = jnp.zeros(x.shape[:-1] + (gap,), x.dtype)
                zcache[gap] = z
            pieces.append(z)
        pieces.append(x[..., src:src + ln])
        src += ln
        cursor = dst + ln
    tail = n_lane - cursor
    if tail:
        pieces.append(jnp.zeros(x.shape[:-1] + (tail,), x.dtype))
    return jnp.concatenate(pieces, axis=-1)


def run_extract(runs, z):
    """Lane-space vector → original space (drop phantom lanes)."""
    import jax.numpy as jnp

    return jnp.concatenate([z[..., d:d + ln] for d, ln in runs], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HybridMatrix:
    """HYB-class split: ``A = band + rest`` with one summed SpMV.

    ``band`` is a WHDIA layout over the diagonal-resident entries (may
    be ``None`` when no diagonal clears the occupancy threshold);
    ``rest`` a packed WHELL over the scattered entries (``None`` when
    the matrix is purely banded).  Both consume the SAME original-space
    ``x``; the rest part's lane-space crossing is internal.
    """

    band: Optional[object]  # WhdiaMatrix | None
    rest: Optional[object]  # packed WhellMatrix | None
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    band_nnz: int = dataclasses.field(metadata=dict(static=True))
    #: occupancy threshold used for the split, in lanes (of 128)
    tau_lanes: int = dataclasses.field(metadata=dict(static=True))
    #: rest-part lane map as maximal (dst_lane, length) runs — static so
    #: embed/extract trace to static slices
    runs: Tuple[Tuple[int, int], ...] = dataclasses.field(
        default=(), metadata=dict(static=True))

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        part = self.band if self.band is not None else self.rest
        return part.dtype

    @property
    def is_dd(self) -> bool:
        part = self.band if self.band is not None else self.rest
        return bool(getattr(part, "is_dd", False))

    @property
    def rest_nnz(self) -> int:
        return self.nnz - self.band_nnz

    @property
    def storage_bytes(self) -> int:
        n = 0
        for part in (self.band, self.rest):
            if part is not None:
                n += int(part.storage_bytes)
        return n

    @property
    def pad_factor(self) -> float:
        cells = 0
        for part in (self.band, self.rest):
            if part is not None:
                cells += int(part.values.size)
        return cells / max(self.nnz, 1)

    def embed_rest(self, x):
        """Original-space vector → the rest part's lane space."""
        return run_embed(self.runs, self.rest.n_rows, x)

    def extract_rest(self, z):
        """Rest-part lane-space vector → original space."""
        return run_extract(self.runs, z)

    def to_dense(self) -> np.ndarray:
        d = None
        for part in (self.band, self.rest):
            if part is not None:
                pd = part.to_dense()
                if part is self.rest:
                    # rest to_dense is lane-space rows/cols: compact back
                    lor = np.asarray(part.lane_of_row)
                    pd = pd[np.ix_(lor, lor)]
                d = pd if d is None else d + pd
        return d
