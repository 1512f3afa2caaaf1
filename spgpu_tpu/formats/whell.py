"""WHELL ("windowed HELL") — the TPU-native compute layout for HELL.

This is this library's own format contribution, playing the role the
reference's HELL format played for GPUs
(``/root/reference/src/core/hell.h:26-59``): a layout shaped by what the
hardware's memory system can do fast.  The CUDA HELL kernel does one
arbitrary ``x[rP[i]]`` gather per nonzero and leans on the texture cache
(``hell_spmv_base.cuh:64-75``).  TPUs have no such cache — Mosaic's only
vectorised gather is ``take_along_axis`` along the 128-lane axis, which
shuffles arbitrarily *within* an aligned 128-element window.

WHELL restructures HELL around that primitive ("page-per-slot" layout):

* rows are hacked by 128 (one hack = one lane vector), as in HELL;
* ``x`` is viewed as pages of 128 (``x2d[p, l] = x[128p + l]``);
* within a hack, entries are grouped by the page their column falls in;
  the group for page ``p`` occupies ``max_r |{entries of row r on page
  p}|`` consecutive slots, every entry stored at
  ``(group_base + rank_within_row, row % 128)`` — so each slot touches
  exactly ONE page;
* slots are chunked into 8-slot tiles whose pages must span at most 8
  consecutive x pages (padding slots are inserted at span breaks); the
  tile's first page is the per-tile scalar ``tile_base`` and each cell
  stores ``(page - tile_base) * 128 + (col % 128)`` — a 10-bit packed
  index.

The SpMV kernel computes, per (8-slot × 128-row) tile::

    win8       = x2d[tile_base[t] : tile_base[t]+8]    # ONE dynamic slice
    h1[s, j]   = win8[packed[s, j] >> 7, j]            # sublane gather
    x_at[s, j] = h1[s, packed[s, j] & 127]             # lane gather
    z[hack]   += sum_s values[s, j] * x_at[s, j]

(The sublane-gather index is constant along each slot row — page is
per-slot — which is exactly the condition making the two-gather chain
exact.)

Per-cell storage: value (4 B) + packed index (int32 now, logically 10
bits).
Padding cells carry value 0 so they contribute nothing.  Hack slot
counts are padded to 8 (the tile height).  Slot counts grow with the
number of *distinct pages* a hack's rows touch — small for matrices with
column locality (stencil / banded / FEM, the library's domain), large
for uniformly-random columns (documented; every blocked sparse format on
every architecture degrades there).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WhellMatrix:
    # slab data, slot-major: shape (total_slots, 128); total_slots % 8 == 0
    values: jax.Array  # float
    residue: jax.Array  # int32: (page - tile_base) * 128 + col % 128
    # per-tile scalars (SMEM-prefetched; one entry per 8-slot tile)
    tile_base: jax.Array  # (num_tiles,) int32: first x page of tile
    tile_hack: jax.Array  # (num_tiles,) int32: output hack of tile
    chunk_hack: jax.Array  # (num_tiles // 8,) int32: hack of each 8-tile
    #   grid chunk (chunks never straddle hacks)
    hack_tile_off: jax.Array  # (num_hacks + 1,) int32: tiles of hack h are
    #   [hack_tile_off[h], hack_tile_off[h+1]) — the HELL hackOffsets
    #   analogue (hell.h:37-43), in tile units
    # row permutation (stored-row -> original-row) or None
    row_perm: Optional[jax.Array]
    # static metadata
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    num_hacks: int = dataclasses.field(metadata=dict(static=True))
    total_slots: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    #: rows of the kernel's x2d operand; static so jit never reads data.
    x_pages: int = dataclasses.field(default=8, metadata=dict(static=True))

    hack_size = 128  # lane width; fixed by the layout

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def num_tiles(self) -> int:
        return self.total_slots // 8

    @property
    def rows_padded(self) -> int:
        return self.num_hacks * 128

    @property
    def storage_bytes(self) -> int:
        n = self.values.size * self.values.dtype.itemsize
        n += self.residue.size * 4
        n += (self.tile_base.size + self.tile_hack.size
              + self.chunk_hack.size + self.hack_tile_off.size) * 4
        if self.row_perm is not None:
            n += self.row_perm.size * 4
        return int(n)

    def to_dense(self) -> np.ndarray:
        """Host densification (testing helper; duplicates add)."""
        vals = np.asarray(self.values)
        res = np.asarray(self.residue)
        tb = np.asarray(self.tile_base)
        th = np.asarray(self.tile_hack)
        out = np.zeros((self.n_rows, self.n_cols), dtype=vals.dtype)
        lane = np.arange(128)
        for s in range(self.total_slots):
            v = vals[s]
            nzm = v != 0
            if not nzm.any():
                continue
            col = (tb[s // 8] + (res[s] >> 7)) * 128 + (res[s] & 127)
            row = th[s // 8] * 128 + lane
            ok = nzm & (row < self.rows_padded) & (col < self.n_cols)
            np.add.at(out, (self._orig_row(row[ok]), col[ok]), v[ok])
        return out

    def _orig_row(self, stored_rows: np.ndarray) -> np.ndarray:
        if self.row_perm is None:
            return stored_rows
        return np.asarray(self.row_perm)[stored_rows]
