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
    chunk_group: jax.Array  # (num_chunks,) int32: 8-hack group of chunk
    #   (packed layout: length num_chunks+1 with a trailing -1 sentinel so
    #   the kernel can detect the last chunk of a group)
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

    # --- packed-lane layout (the r2 anti-raggedness design) --------------
    # Rows get lane SEGMENTS proportional to their degree (heavy rows span
    # many lanes, light rows one); the kernel reduces segments with an
    # in-flush prefix scan + compaction gather.  Output lives in "lane
    # space": each hack's rows compacted to its first lanes, phantom
    # coordinates zero.  ``seg_lo is None`` for the classic layout.
    seg_lo: Optional[jax.Array] = None  # (num_groups*8, 128) int8: seg start-1
    seg_hi: Optional[jax.Array] = None  # (num_groups*8, 128) int8: seg end-1;
    #   -1 marks an unused output lane (phantom row)
    lane_of_row: Optional[jax.Array] = None  # (orig_rows,) int32: lane-space
    #   coordinate of each original row (order-preserving, with gaps)
    #: low fp32 words of a double-float (fp64-on-TPU) value slab; the
    #: dd kernel path (ops/dd.py transforms) is active when set.  The
    #: reference ships D-precision natively (hell_dspmv.cu:28-33); TPU
    #: v5e has no fp64 ALU so D is two fp32 slabs.
    values_lo: Optional[jax.Array] = None
    #: scattered-window mode (packed only): flattened (layout_groups, K)
    #: int32 table of per-group superpage base pages, K = window_pages/8.
    #: Each layout group's x window is a SET of K independently-based
    #: aligned 8-page superpages (instead of one contiguous aligned
    #: window), so a hack's local cluster AND its far/hub columns share
    #: one group — the grouping that cuts the padding (doc/DESIGN.md).
    #: ``tile_base`` then packs ``layout_group | hack_in_group << 20``.
    group_bases: Optional[jax.Array] = None
    #: pages per tile window (8 classic; 16/32 via in-kernel window select)
    window_pages: int = dataclasses.field(default=8, metadata=dict(static=True))
    #: original square dimension before lane-space embedding (packed only)
    orig_rows: int = dataclasses.field(default=0, metadata=dict(static=True))
    #: hacks per output z block (classic 8; packed uses larger groups so
    #: per-group chunk rounding wastes fewer tiles)
    group_hacks: int = dataclasses.field(default=8, metadata=dict(static=True))
    #: grid-chunk size in tiles (kernel unroll factor; per-group tile
    #: counts round up to this)
    chunk_tiles: int = dataclasses.field(default=64, metadata=dict(static=True))
    #: every row owns exactly ONE lane (true for stencil/banded degree
    #: profiles under the 1.25x-avg lane capacity) — the group flush
    #: then skips the lane prefix scan + one compaction gather: output
    #: lane o is just the slot-sum at its row's contribution lane
    #: (r5; the dd flush's scan was 60% of the dd kernel, DESIGN §2c-3)
    unit_segments: bool = dataclasses.field(default=False,
                                            metadata=dict(static=True))

    hack_size = 128  # lane width; fixed by the layout

    @property
    def packed(self) -> bool:
        return self.seg_lo is not None

    @property
    def is_dd(self) -> bool:
        """True when values are double-float pairs (fp64 emulation)."""
        return self.values_lo is not None

    def embed(self, x):
        """Original-space vector → lane-space (phantom coords zero)."""
        import jax.numpy as jnp

        out = jnp.zeros(x.shape[:-1] + (self.n_rows,), x.dtype)
        return out.at[..., self.lane_of_row].set(x)

    def extract(self, z):
        """Lane-space vector → original-space."""
        return z[..., self.lane_of_row]

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
        n += (self.tile_base.size + self.chunk_group.size) * 4
        if self.row_perm is not None:
            n += self.row_perm.size * 4
        if self.seg_lo is not None:
            n += self.seg_lo.size + self.seg_hi.size  # int8 each
            n += self.lane_of_row.size * 4
        if self.values_lo is not None:
            n += self.values_lo.size * self.values_lo.dtype.itemsize
        if self.group_bases is not None:
            n += self.group_bases.size * 4
        return int(n)

    def to_dense(self) -> np.ndarray:
        """Host densification (testing helper; duplicates add).

        Packed layouts densify in LANE SPACE (``n_rows == n_cols`` the
        padded lane dimension); compare against
        ``dense[embed_rows][:, embed_cols]`` of the original."""
        vals = np.asarray(self.values)
        if self.values_lo is not None:
            vals = vals.astype(np.float64) + np.asarray(self.values_lo)
        res = np.asarray(self.residue).astype(np.int64)
        pt = np.asarray(self.page_tab).astype(np.int64)
        meta = np.asarray(self.tile_base).astype(np.int64)
        if self.group_bases is not None:
            gi = meta & 0xFFFFF
            hh = meta >> 20
            gbase = np.asarray(self.group_bases).astype(np.int64)
            K = self.window_pages // 8
        else:
            tb = meta & 0xFFFF
            hh = meta >> 16
        cg = np.asarray(self.chunk_group)
        _CT = self.chunk_tiles

        row_of_lane = None
        if self.packed:
            # lane -> output row (lane-space coordinate) from the segments
            lo = np.asarray(self.seg_lo).astype(np.int64)
            hi = np.asarray(self.seg_hi).astype(np.int64)
            row_of_lane = np.full((lo.shape[0], 128), -1, dtype=np.int64)
            for hk in range(lo.shape[0]):
                for j in range(128):
                    if hi[hk, j] >= 0:
                        row_of_lane[hk, lo[hk, j] + 1: hi[hk, j] + 1] = (
                            hk * 128 + j)

        out = np.zeros((self.n_rows, self.n_cols), dtype=vals.dtype)
        lane = np.arange(128)
        for s in range(self.total_slots):
            v = vals[s]
            nzm = v != 0
            if not nzm.any():
                continue
            t = s // 8
            r = res[s]
            if self.group_bases is not None:
                dlt = pt[s, r]
                col = (gbase[gi[t] * K + (dlt >> 3)] + (dlt & 7)) * 128 + r
            else:
                col = (tb[t] + pt[s, r]) * 128 + r
            hack = cg[t // _CT] * self.group_hacks + hh[t]
            if row_of_lane is not None:
                row = row_of_lane[hack]
                ok = nzm & (row >= 0) & (row < self.n_rows) & (col < self.n_cols)
                np.add.at(out, (row[ok], col[ok]), v[ok])
                continue
            row = hack * 128 + lane
            ok = nzm & (row < self.rows_padded) & (col < self.n_cols)
            np.add.at(out, (self._orig_row(row[ok]), col[ok]), v[ok])
        return out

    def _orig_row(self, stored_rows: np.ndarray) -> np.ndarray:
        if self.row_perm is None:
            return stored_rows
        return np.asarray(self.row_perm)[stored_rows]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PcellWhell:
    """Per-cell row-routing WHELL (round-3 kernel-family experiment;
    see :mod:`spgpu_tpu.convert.pcell`).  Cells of many rows pack
    densely per slot (one contiguous lane RUN per (row, slot)); the
    kernel scans each contrib tile along lanes and differences the scan
    at run ends, routing partials to output lanes via ``run_hi`` /
    ``run_lo``.  Output is in ORIGINAL row order — no lane space.

    .. deprecated:: round 4
       Measured ~3.6x SLOWER than the packed layout on this hardware
       (the per-tile lane-gather issue limit, doc/DESIGN.md §2h) despite
       its padding win.  Kept as tested evidence; do NOT pick it
       expecting a speedup — use ``coo_to_whell(packed=True)``."""

    values: jax.Array  # (total_slots, 128)
    residue: jax.Array  # (total_slots, 128) int8: col % 128
    page_tab: jax.Array  # (total_slots, 128) int8: delta keyed by residue
    run_hi: jax.Array  # (total_slots, 128) int8: run end lane, keyed by
    #   the run's row OUTPUT LANE (row % 128); -1 = row absent from slot
    run_lo: jax.Array  # (total_slots, 128) int8: lane before run start
    tile_base: jax.Array  # (num_tiles,) int32: layout group | hh << 20
    chunk_group: jax.Array  # (num_chunks+1,) int32, trailing -1 sentinel
    group_bases: jax.Array  # (layout_groups * K,) int32 superpage bases
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    num_hacks: int = dataclasses.field(metadata=dict(static=True))
    num_groups: int = dataclasses.field(metadata=dict(static=True))
    total_slots: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    x_pages: int = dataclasses.field(default=8, metadata=dict(static=True))
    window_pages: int = dataclasses.field(default=32,
                                          metadata=dict(static=True))
    group_hacks: int = dataclasses.field(default=512,
                                         metadata=dict(static=True))
    chunk_tiles: int = dataclasses.field(default=128,
                                         metadata=dict(static=True))

    hack_size = 128

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def is_dd(self) -> bool:
        return False

    @property
    def num_tiles(self) -> int:
        return self.total_slots // 8

    @property
    def storage_bytes(self) -> int:
        n = self.values.size * self.values.dtype.itemsize
        n += self.residue.size + self.page_tab.size
        n += self.run_hi.size + self.run_lo.size
        n += (self.tile_base.size + self.chunk_group.size
              + self.group_bases.size) * 4
        return int(n)

    def to_dense(self) -> np.ndarray:
        """Host densification (testing helper; duplicates add)."""
        vals = np.asarray(self.values)
        res = np.asarray(self.residue).astype(np.int64)
        pt = np.asarray(self.page_tab).astype(np.int64)
        meta = np.asarray(self.tile_base).astype(np.int64)
        gi = meta & 0xFFFFF
        hh = meta >> 20
        gbase = np.asarray(self.group_bases).astype(np.int64)
        K = self.window_pages // 8
        hi = np.asarray(self.run_hi).astype(np.int64)
        lo = np.asarray(self.run_lo).astype(np.int64)
        cg = np.asarray(self.chunk_group)
        out = np.zeros((self.n_rows, self.n_cols), vals.dtype)
        for s in range(self.total_slots):
            t = s // 8
            hack = cg[t // self.chunk_tiles] * self.group_hacks + hh[t]
            # row of each lane from the runs
            row_of_lane = np.full(128, -1, np.int64)
            for j in range(128):
                if hi[s, j] >= 0:
                    row_of_lane[lo[s, j] + 1: hi[s, j] + 1] = hack * 128 + j
            v = vals[s]
            ok = (v != 0) & (row_of_lane >= 0) & (row_of_lane < self.n_rows)
            if not ok.any():
                continue
            r = res[s]
            dlt = pt[s, r]
            col = (gbase[gi[t] * K + (dlt >> 3)] + (dlt & 7)) * 128 + r
            okc = ok & (col < self.n_cols)
            np.add.at(out, (row_of_lane[okc], col[okc]), v[okc])
        return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PanelledWhell:
    """Column-panelled packed WHELL for matrices whose x exceeds the
    kernel's VMEM-resident budget (the reference's analogue is the ELL
    chunk loop, ``ell_spmv_base.cuh:118-136`` — no size cliff).

    Window-aligned column panels share one lane space and one set of
    segment slabs; ``A @ x = Σ_p A_p @ x[panel_p]`` (the segment-scan
    flush is linear, so per-panel flushed outputs add exactly).  Built
    automatically by ``coo_to_whell(packed=True)`` when needed.
    """

    panels: tuple  # of WhellMatrix, consecutive column slices
    panel_pages: int = dataclasses.field(metadata=dict(static=True))
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    orig_rows: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.panels[0].dtype

    @property
    def is_dd(self) -> bool:
        return self.panels[0].is_dd

    @property
    def packed(self) -> bool:
        return True

    @property
    def lane_of_row(self):
        return self.panels[0].lane_of_row

    @property
    def values(self):  # aggregate view for pad/bench accounting
        import types

        return types.SimpleNamespace(
            size=sum(int(p.values.size) for p in self.panels))

    @property
    def storage_bytes(self) -> int:
        return sum(p.storage_bytes for p in self.panels)

    def embed(self, x):
        return self.panels[0].embed(x)

    def extract(self, z):
        return self.panels[0].extract(z)

    def to_dense(self) -> np.ndarray:
        return np.concatenate([p.to_dense() for p in self.panels], axis=1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SegmentedWhell:
    """Row-segmented packed WHELL for matrices whose per-tile/per-group
    scalar operands exceed the 1 MiB SMEM prefetch budget (~130k tiles;
    hit at the 4M-row / 45M-nnz class, measured compile OOM "Used 1.17M
    of 1.00M smem").  The reference's analogue is again the ELL grid
    chunk loop (``ell_spmv_base.cuh:118-136``): rows are processed in
    independent launches, so metadata never outgrows the device limits.

    Segments split at output-group boundaries; each is a self-contained
    :class:`WhellMatrix` over a contiguous row range sharing the full
    (panel) x, and ``A @ x = concat_s(A_s @ x)``.  Built automatically
    by ``coo_to_whell(packed=True)`` when needed; may appear as a panel
    of a :class:`PanelledWhell` (columns split first, rows second).
    """

    segments: tuple  # of WhellMatrix, consecutive row ranges
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    orig_rows: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    x_pages: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.segments[0].dtype

    @property
    def is_dd(self) -> bool:
        return self.segments[0].is_dd

    @property
    def packed(self) -> bool:
        return True

    @property
    def window_pages(self) -> int:
        return self.segments[0].window_pages

    @property
    def lane_of_row(self):
        return self.segments[0].lane_of_row

    @property
    def values(self):  # aggregate view for pad/bench accounting
        import types

        return types.SimpleNamespace(
            size=sum(int(s.values.size) for s in self.segments))

    @property
    def storage_bytes(self) -> int:
        # lane_of_row is one shared buffer carried by every segment —
        # count it once
        n = sum(s.storage_bytes for s in self.segments)
        return int(n - (len(self.segments) - 1)
                   * self.segments[0].lane_of_row.size * 4)

    def embed(self, x):
        import jax.numpy as jnp

        out = jnp.zeros(x.shape[:-1] + (self.n_rows,), x.dtype)
        return out.at[..., self.lane_of_row].set(x)

    def extract(self, z):
        return z[..., self.lane_of_row]

    def to_dense(self) -> np.ndarray:
        return np.concatenate([s.to_dense() for s in self.segments],
                              axis=0)[: self.n_rows]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WhellComplex:
    """Complex packed WHELL as two real-plane matrices (C/Z coverage of
    the fast path; the reference instantiates C/Z kernel variants,
    ``hell_cspmv.cu``/``zdot.cu:47-97``).

    ``A = Ar + i·Ai``; SpMV runs 4 real plane products sharing the
    layout machinery: ``Re(Ax) = Ar xr − Ai xi``, ``Im(Ax) = Ar xi +
    Ai xr``.  complex64 planes are fp32; complex128 planes are
    double-float pairs (Z == dd × complex).
    """

    ar: object  # WhellMatrix | PanelledWhell — real parts
    ai: object  # imaginary parts (same layout by construction)
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    orig_rows: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def is_dd(self) -> bool:
        return self.ar.is_dd

    @property
    def packed(self) -> bool:
        return True

    @property
    def lane_of_row(self):
        return self.ar.lane_of_row

    @property
    def dtype(self):
        return np.dtype(np.complex128 if self.is_dd else np.complex64)

    @property
    def storage_bytes(self) -> int:
        return self.ar.storage_bytes + self.ai.storage_bytes

    @property
    def values(self):
        """Real-plane value slab (both planes share one layout, so this
        is the per-plane padding/occupancy view used by perf tooling)."""
        return self.ar.values

    def embed_complex(self, x: np.ndarray):
        """Original complex vector -> lane-space plane stack:
        ``(2, n_lane)`` complex planes as fp32 for C, or ``(2, 2,
        n_lane)`` (re/im × hi/lo) fp32 for Z."""
        lor = np.asarray(self.lane_of_row)
        if self.is_dd:
            from spgpu_tpu.ops.dd import split as _split

            out = np.zeros((2, 2, self.n_rows), np.float32)
            out[0, :, lor.astype(np.int64)] = _split(np.real(x)).T
            out[1, :, lor.astype(np.int64)] = _split(np.imag(x)).T
            return out
        out = np.zeros((2, self.n_rows), np.float32)
        out[0, lor] = np.real(x).astype(np.float32)
        out[1, lor] = np.imag(x).astype(np.float32)
        return out

    def extract_complex(self, z) -> np.ndarray:
        lor = np.asarray(self.lane_of_row)
        z = np.asarray(z)
        if self.is_dd:
            from spgpu_tpu.ops.dd import join as _join

            return (_join(z[0])[lor] + 1j * _join(z[1])[lor])
        return (z[0][lor] + 1j * z[1][lor]).astype(np.complex64)

    def to_dense(self) -> np.ndarray:
        return self.ar.to_dense() + 1j * self.ai.to_dense()
