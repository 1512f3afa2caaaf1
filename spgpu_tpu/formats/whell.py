"""WHELL ("windowed HELL") — the TPU-native compute layout for HELL.

This is this library's own format contribution, playing the role the
reference's HELL format played for GPUs
(``/root/reference/src/core/hell.h:26-59``): a layout shaped by what the
hardware's memory system can do fast.  The CUDA HELL kernel does one
arbitrary ``x[rP[i]]`` gather per nonzero and leans on the texture cache
(``hell_spmv_base.cuh:64-75``).  TPUs have no such cache — Mosaic's
vectorised gathers are ``take_along_axis`` along sublanes (8-tall
tables) and along lanes (within 128-element windows).

WHELL restructures HELL around that primitive pair:

* rows are hacked by 128 (one hack = one lane vector), as in HELL;
* ``x`` is viewed as pages of 128 (``x2d[p, l] = x[128p + l]``) and
  windows of 8 aligned pages ("superpages", 1024 elements — exactly one
  sublane-gather table);
* within a hack, entries are grouped by superpage; inside a group each
  entry occupies a (slot, lane=row%128) cell, slots assigned greedily
  under ONE constraint: a slot may not hold two entries with the same
  column residue (``col % 128``) but different pages — because the
  kernel resolves pages through a per-slot *residue-indexed* page table:

      win8       = x2d[tile_base : tile_base+8]       # one dynamic slice
      h1[s, l]   = win8[page_tab[s, l], l]            # sublane gather
      x_at[s, j] = h1[s, residue[s, j]]               # lane gather

  ``page_tab[s, l]`` is "the page of the cell in slot s whose residue is
  l" — well-defined exactly when the constraint holds (conflicting
  entries are evicted to later slots at conversion time; structured
  matrices rarely conflict, random ones settle at ~60-70 %% slot
  occupancy);
* slots are chunked into 8-slot tiles (tile_base = the group's
  superpage) and hacks padded to whole grid chunks.

Per-cell storage: value (4 B) + residue (int8) + page-table entry
(int8) = 6 B for fp32.  Padding cells carry value 0 so they contribute
nothing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WhellMatrix:
    # slab data, slot-major: shape (total_slots, 128)
    values: jax.Array  # float
    residue: jax.Array  # int8 in [0, 128): col %% 128 of each cell
    page_tab: jax.Array  # int8 in [0, 8): page delta, indexed by RESIDUE
    # per-tile scalars (SMEM-prefetched; one entry per 8-slot tile)
    tile_base: jax.Array  # (num_tiles,) int32: first x page of the tile
    #   window (low 16 bits) | hack index within the 8-hack output group
    #   (high bits) — one SMEM word per tile (two int32 arrays overflow
    #   the 1 MB SMEM budget near 1M rows).  The HELL hackOffsets role
    #   (hell.h:37-43) is played by tile ordering: a group's tiles are
    #   contiguous.
    tile_hh: jax.Array  # retired (packed into tile_base); kept empty for
    #   pytree-shape compatibility
    chunk_group: jax.Array  # (num_chunks,) int32: 8-hack group of chunk
    # row permutation (stored-row -> original-row) or None
    row_perm: Optional[jax.Array]
    # static metadata
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    num_hacks: int = dataclasses.field(metadata=dict(static=True))
    num_groups: int = dataclasses.field(metadata=dict(static=True))
    total_slots: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    #: rows of the kernel's x2d operand; static so jit never reads data.
    x_pages: int = dataclasses.field(default=8, metadata=dict(static=True))
    #: way-split factor: n_rows counts VIRTUAL rows (true rows × ways);
    #: the SpMV epilogue sums each way group back to one true row.
    ways: int = dataclasses.field(default=1, metadata=dict(static=True))

    hack_size = 128  # lane width; fixed by the layout
    group_hacks = 8  # hacks per output z block

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
        return self.num_groups * self.group_hacks * 128

    @property
    def storage_bytes(self) -> int:
        n = self.values.size * self.values.dtype.itemsize
        n += self.residue.size + self.page_tab.size  # int8 each
        n += (self.tile_base.size + self.tile_hh.size
              + self.chunk_group.size) * 4
        if self.row_perm is not None:
            n += self.row_perm.size * 4
        return int(n)

    def to_dense(self) -> np.ndarray:
        """Host densification (testing helper; duplicates add)."""
        vals = np.asarray(self.values)
        res = np.asarray(self.residue).astype(np.int64)
        pt = np.asarray(self.page_tab).astype(np.int64)
        meta = np.asarray(self.tile_base).astype(np.int64)
        tb = meta & 0xFFFF
        hh = meta >> 16
        cg = np.asarray(self.chunk_group)
        from spgpu_tpu.core import CHUNK_TILES as _CT

        out = np.zeros((self.n_rows, self.n_cols), dtype=vals.dtype)
        lane = np.arange(128)
        for s in range(self.total_slots):
            v = vals[s]
            nzm = v != 0
            if not nzm.any():
                continue
            t = s // 8
            r = res[s]
            col = (tb[t] + pt[s, r]) * 128 + r
            hack = cg[t // _CT] * self.group_hacks + hh[t]
            row = hack * 128 + lane
            ok = nzm & (row < self.rows_padded) & (col < self.n_cols)
            np.add.at(out, (self._orig_row(row[ok]), col[ok]), v[ok])
        return out

    def _orig_row(self, stored_rows: np.ndarray) -> np.ndarray:
        if self.row_perm is None:
            return stored_rows
        return np.asarray(self.row_perm)[stored_rows]
