"""WHDIA ("windowed Hacked DIA") — the TPU compute layout for HDIA.

TPU-native re-design of the reference's HDIA format
(``/root/reference/src/core/hdia.h:21-49``, layout built in
``hdia.cpp:68-153``): rows hacked by 128 (one lane vector), each hack
storing only its own occupied diagonals.

The CUDA kernel walks each hack's diagonal list with a per-warp shared
staging of offsets (``hdia_spmv_base_template.cuh:92-100``).  On TPU the
structural win is much bigger: the x operand of slot ``s`` (hack ``h``,
diagonal ``d``) is the *contiguous rotation* ``x[h·128 + d + lane]``,
so no index arrays need to be stored at all — one scalar per slot
(``slot_r0 = h·128 + d − 128·tile_base``) lets the kernel reconstruct
both gather index sets arithmetically:

* residue:   ``idx[s, j]  = (r0_s + j) & 127``
* page table: ``pt[s, l]  = (r0_s >> 7) + (l < (r0_s & 127))``
  (the rotation is a bijection on lanes, so residue → page is always a
  function — the condition WHELL has to engineer by construction holds
  here for free)

and the usual sublane-gather + lane-gather chain resolves the window.
HBM traffic is therefore values-only: 4 B/cell for fp32, the same as
dense DIA but without DIA's empty-diagonal padding.

Layout rules (mirroring WHELL's chunking):

* a tile = 8 slots of one hack; diagonal spread within a tile ≤ 768 so
  every valid cell's ``r0 + j`` stays inside the 8-page window;
* hacks are grouped 32 at a time; each group's tiles are padded to
  whole grid chunks, so the z block written per chunk covers 32 hacks —
  thin banded hacks (≈ 2 tiles each) would otherwise pay per-hack
  write-backs and chunk padding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np



@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WhdiaMatrix:
    values: jax.Array  # (total_slots, 128) slot-major cells
    slot_r0: Optional[jax.Array]  # (total_slots, 128) int16,
    #   lane-replicated: r0 = h*128 + d - 128*tile_base per slot.
    #   Streamed as a vector operand (2 B/cell) rather than SMEM
    #   scalars: the scalar unpack (8 loads + vector inserts per tile)
    #   was the latency chain that held WHDIA at ~29 cycles/tile, and
    #   per-slot SMEM words capped the matrix size at the 1 MB SMEM
    #   budget.  None in PATTERN mode (r4): when every tile's FILLED
    #   slots form an arithmetic progression ``r0[s] = r00 + step*s``
    #   (contiguous-band matrices — the HDIA bread-and-butter), ONE
    #   packed int32 per tile (``tile_r0``: ``(step+4096)<<19 |
    #   (nfill-1)<<16 | (r00+1024)``) rebuilds the (8, 128) r0 block
    #   in-kernel as 3 scalar splats + min/mul/add; dead slots repeat
    #   the last filled value (their cells are zero, so their gathers
    #   are inert).  The 2 B/cell slab disappears and traffic drops to
    #   values-only, the format's design ideal (doc/DESIGN.md §3d).
    tile_base: jax.Array  # (num_tiles,) int32: first x page of the tile
    #   (low 16 bits) | hack index within the 32-hack group (high bits)
    chunk_group: jax.Array  # (num_tiles // 8,) int32: 8-hack group of chunk
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    num_hacks: int = dataclasses.field(metadata=dict(static=True))
    num_groups: int = dataclasses.field(metadata=dict(static=True))
    total_slots: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    x_pages: int = dataclasses.field(default=8, metadata=dict(static=True))
    #: pages per tile window (8/16/32).  Wider windows admit a larger
    #: diagonal spread per tile — a 2-D Laplacian's ±n offsets split
    #: every hack into 3 tiles at w=8 (measured pad 4.8x) but fit one
    #: tile at w=32 — for a few extra select ops per tile (the same
    #: select-tree trick as packed WHELL).
    window_pages: int = dataclasses.field(default=8, metadata=dict(static=True))
    #: low fp32 words of a double-float (fp64) value slab — D-precision
    #: parity with the reference's hdia_dspmv (TPU has no fp64 ALU)
    values_lo: Optional[jax.Array] = None
    #: hacks per output z block / tiles per grid chunk (geometry knobs,
    #: as in packed WHELL)
    group_hacks: int = dataclasses.field(default=32, metadata=dict(static=True))
    chunk_tiles: int = dataclasses.field(default=32, metadata=dict(static=True))
    #: pattern mode (r4): per-tile packed word ``(step+4096) << 19 |
    #: (nfill-1) << 16 | (r0_0+1024)`` (scalar prefetch operand) —
    #: the filled slots' r0 form an arithmetic progression, rebuilt
    #: in-kernel; see ``slot_r0``
    tile_r0: Optional[jax.Array] = None  # (num_tiles,) int32

    hack_size = 128

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def is_dd(self) -> bool:
        return self.values_lo is not None

    @property
    def num_tiles(self) -> int:
        return self.total_slots // 8

    @property
    def rows_padded(self) -> int:
        return self.num_groups * self.group_hacks * 128

    @property
    def storage_bytes(self) -> int:
        n = int(
            self.values.size * self.values.dtype.itemsize
            + self.tile_base.size * 4
            + self.chunk_group.size * 4
        )
        if self.slot_r0 is not None:
            n += int(self.slot_r0.size) * 2
        if self.tile_r0 is not None:
            n += int(self.tile_r0.size) * 4
        if self.values_lo is not None:
            n += int(self.values_lo.size * self.values_lo.dtype.itemsize)
        return n

    def slot_r0_host(self) -> np.ndarray:
        """Per-slot r0 scalars (total_slots,) — from the slab or
        reconstructed from pattern mode."""
        if self.slot_r0 is not None:
            return np.asarray(self.slot_r0)[:, 0].astype(np.int64)
        w = np.asarray(self.tile_r0).view(np.uint32).astype(np.int64)
        r00 = (w & 0xFFFF) - 1024
        f1 = (w >> 16) & 0x7
        step = ((w >> 19) & 0x1FFF) - 4096
        s = np.arange(8)[None, :]
        return (r00[:, None]
                + step[:, None] * np.minimum(s, f1[:, None])).reshape(-1)

    def to_dense(self) -> np.ndarray:
        vals = np.asarray(self.values)
        if self.values_lo is not None:
            vals = vals.astype(np.float64) + np.asarray(self.values_lo)
        r0 = self.slot_r0_host()
        meta = np.asarray(self.tile_base).astype(np.int64)
        tb = meta & 0xFFFF
        hh = meta >> 16
        cg = np.asarray(self.chunk_group)
        out = np.zeros((self.n_rows, self.n_cols), dtype=vals.dtype)
        lane = np.arange(128)
        for s in range(self.total_slots):
            v = vals[s]
            if not (v != 0).any():
                continue
            t = s // 8
            hack = cg[t // self.chunk_tiles] * self.group_hacks + hh[t]
            row = hack * 128 + lane
            col = tb[t] * 128 + r0[s] + lane
            ok = (v != 0) & (row < self.n_rows) & (col >= 0) & (col < self.n_cols)
            # plain store: duplicates follow last-write-wins like coo2dia
            out[row[ok], col[ok]] = v[ok]
        return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BlockedWhdia:
    """Row-blocked WHDIA for matrices whose x exceeds the kernel's
    VMEM-resident budget (~3M fp32 columns) or whose tile scalars
    exceed the 1 MiB SMEM prefetch budget.

    Banded structure makes row blocks natural: the rows of block ``b``
    only touch the column window ``[col_off_b, col_off_b + span_b)``
    (the diagonals' reach), so each block is a self-contained
    :class:`WhdiaMatrix` over its own x slice, and ``A @ x =
    concat_b(A_b @ x[window_b])``.  The reference's analogue is again
    the ELL grid chunk loop (``ell_spmv_base.cuh:118-136``) plus
    diaPerf's memory-fit fallback (``diaPerf.cpp:174-183``): no hard
    size cliff.  Built automatically by ``coo_to_whdia`` when needed.
    """

    blocks: tuple  # of WhdiaMatrix, consecutive row ranges
    #: per-block first column (page-aligned); static so x slicing stays
    #: compile-time under jit
    col_offs: tuple = dataclasses.field(metadata=dict(static=True))
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.blocks[0].dtype

    @property
    def is_dd(self) -> bool:
        return self.blocks[0].is_dd

    @property
    def window_pages(self) -> int:
        return self.blocks[0].window_pages

    @property
    def values(self):  # aggregate view for pad/bench accounting
        import types

        return types.SimpleNamespace(
            size=sum(int(b.values.size) for b in self.blocks))

    @property
    def storage_bytes(self) -> int:
        return sum(b.storage_bytes for b in self.blocks)

    def to_dense(self) -> np.ndarray:
        out = np.zeros((self.n_rows, self.n_cols), dtype=self.dtype)
        r0 = 0
        for b, off in zip(self.blocks, self.col_offs):
            out[r0:r0 + b.n_rows, off:off + b.n_cols] = b.to_dense()
            r0 += b.n_rows
        return out
